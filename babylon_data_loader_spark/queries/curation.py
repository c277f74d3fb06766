"""Training-corpus curation operators, wave 2: the preparation steps
between a deduped corpus and a training run.

- sequence PACKING (concat-and-chunk): assign documents to fixed
  token-budget training sequences — window cumsum, no shuffle beyond
  the global ordering the semantics require.
- PII scrubbing: regex redaction (emails, US-style phone numbers)
  expressed with engine-portable patterns (no lookarounds), counted
  so the redaction rate is auditable.
- stratified sampling: per-stratum quota by deterministic md5 order —
  reproducible across runs and engines, one window per stratum.
- contamination check: n-gram overlap between the training split and
  a held-out eval split (the "did the benchmark leak into training"
  audit) — 5-gram hash semi-join, counts per source.

All four are exact-oracle-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.text import shingles, tokens
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

_TOKENS_SQL = r"regexp_split_to_array(trim(text), '\s+')"

_PACK_BUDGET = 512

# Engine-portable PII patterns (Java regex + RE2-compatible: no
# lookarounds, no backrefs).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


@query(
    "q_pack_sequences",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             len({_TOKENS_SQL}) AS n_tok
      FROM documents
    ), packed AS (
      SELECT doc_id, n_tok,
             CAST((SUM(n_tok) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tok) // {_PACK_BUDGET} AS BIGINT) AS pack_id
      FROM tok
    )
    SELECT pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM packed GROUP BY pack_id
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    doc_id order and each is assigned to the {budget}-token pack where
    its first token lands (pack_id = tokens-before div budget — the
    deterministic form of greedy packing). Runs as the SHARDED
    two-pass prefix sum (operators/packing.py): per-shard windows plus
    an O(shards) broadcast offset table — no Exchange SinglePartition
    anywhere, while the oracle remains DuckDB's single global ordered
    window (results are bit-identical by associativity)."""
    from babylon_data_loader_spark.operators.packing import packed_ids

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    packed = packed_ids(
        tok, "doc_id", "n_tok", _PACK_BUDGET, shards=32
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "q_pii_scrub",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             concat(text, ' contact user', doc_id,
                    '@example.com or 555-', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
                    '-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')) AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
             '{_PHONE_RE}', '[PHONE]', 'g') AS scrubbed,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}'))
                AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}'))
                AS BIGINT) AS n_phones
    FROM seeded
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with an auditable rate: deterministic synthetic
    PII (email + phone derived from doc_id) is planted, then scrubbed
    with engine-portable regexes. Scan-local — no shuffle; the
    redaction counts let a curation run assert its scrub coverage.
    """
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return seeded.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), 0))
        .cast("bigint")
        .alias("n_phones"),
    )


@query(
    "q_stratified_sample",
    oracle="""
    SELECT lang, doc_id
    FROM documents
    QUALIFY row_number() OVER (
      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ) <= 40
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: up to 40 docs per language,
    chosen by md5(doc_id) order — reproducible across engines and
    runs (no RNG state), one shuffle on the stratum key. The md5
    ordering is a uniform pseudo-random permutation, so each stratum's
    sample is unbiased."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 40)
        .drop("_rn")
    )


_EVAL_MOD = 97

_GRAMS5_SQL = """
  CASE WHEN len(toks) >= 5
       THEN list_transform(generate_series(1, len(toks) - 4),
              j -> md5(concat_ws(' ', toks[j], toks[j+1], toks[j+2],
                                 toks[j+3], toks[j+4])))
       ELSE [md5(array_to_string(toks, ' '))] END
"""


@query(
    "q_contamination",
    oracle=f"""
    WITH tokd AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id, source, unnest({_GRAMS5_SQL}) AS gram
      FROM tokd
    ), eval_grams AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    ), contaminated AS (
      SELECT DISTINCT g.source, g.doc_id
      FROM grams g JOIN eval_grams e ON g.gram = e.gram
      WHERE g.doc_id % {_EVAL_MOD} <> 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated
    FROM contaminated GROUP BY source
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: training docs sharing any
    5-gram with the held-out eval split (doc_id % {mod} == 0), counted
    per source. Gram hashes (md5 — 16-byte join keys instead of raw
    text) semi-join the eval set, which is small ⇒ broadcast; the
    training side never self-joins. The same leakage check a real
    pretraining pipeline runs against its eval suites."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(
        "doc_id",
        "source",
        tokens(F.lower(F.col("text"))).alias("toks"),
    )
    grams = tokd.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(shingles(F.col("toks"), 5), F.md5)
        ).alias("gram"),
    )
    eval_grams = (
        grams.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("gram")
        .distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(eval_grams), on="gram", how="left_semi")
        .select("source", "doc_id")
        .distinct()
    )
    return contaminated.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated")
    )
