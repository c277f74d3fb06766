"""Text-analysis declared queries over `documents` — the
training-data-pipeline operators (BASELINE north star): token
statistics, language ID, quality scoring, fingerprinting, exact dedup,
deterministic MinHash + LSH candidate pairs, SimHash.

All expressible with built-in functions (no UDFs) and — because the
hash family is md5 — checkable against a DuckDB oracle, including the
MinHash signatures themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.text import (
    STOPWORDS_EN,
    fingerprint,
    hex_char_parity,
    n_tokens,
    stopword_hits,
    tokens,
)
from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
# DuckDB twins of functions/text.py expressions.
_TOKENS_SQL = r"regexp_split_to_array(trim(text), '\s+')"
_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_FP_SQL = f"md5({_NORM_SQL})"
_TOKENS_LOWER_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"
_SHINGLES_SQL = f"""
  CASE WHEN len({_TOKENS_LOWER_SQL}) >= 3
       THEN list_transform(generate_series(1, len({_TOKENS_LOWER_SQL}) - 2),
              j -> concat_ws(' ', {_TOKENS_LOWER_SQL}[j], {_TOKENS_LOWER_SQL}[j+1],
                             {_TOKENS_LOWER_SQL}[j+2]))
       ELSE [array_to_string({_TOKENS_LOWER_SQL}, ' ')] END
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# Token counting / document statistics ----------------------------------------


@query(
    "q_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok,
           CAST(length(text) AS BIGINT) AS len_chars,
           n_chars
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char counts (row-level, scan-only — no
    shuffle)."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        n_tokens(F.col("text")).cast("bigint").alias("n_tok"),
        F.length("text").cast("bigint").alias("len_chars"),
        "n_chars",
    )


@query(
    "q_token_count",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_TOKENS_SQL})) AS BIGINT) AS total_tokens,
           CAST(SUM(len({_TOKENS_SQL})) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per language."""
    docs = _docs(spark, sf_dir)
    nt = n_tokens(F.col("text")).cast("bigint")
    return (
        docs.select("lang", nt.alias("nt"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            (
                F.sum("nt").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_tokens"),
        )
    )


@query(
    "q_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                AS BIGINT) AS n_pieces,
           CAST(len(list_filter(
                regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'),
                p -> length(p) > 4)) AS BIGINT) AS n_long_pieces
    FROM documents
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish sub-word tokenization via regex classes (letter runs,
    digit runs, single punctuation) — the pre-tokenizer pass of a BPE
    pipeline, counted per document."""
    docs = _docs(spark, sf_dir)
    pieces = F.regexp_extract_all(
        F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    return docs.select(
        "doc_id",
        F.size(pieces).cast("bigint").alias("n_pieces"),
        F.size(F.filter(pieces, lambda p: F.length(p) > 4))
        .cast("bigint")
        .alias("n_long_pieces"),
    )


# Language ID (n-gram/stopword heuristic) --------------------------------------


@query(
    "q_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter({_TOKENS_SQL},
                  t -> t IN ({_STOP_SQL}))) AS BIGINT) AS stop_hits,
             CAST(len({_TOKENS_SQL}) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT doc_id, stop_hits,
           CASE WHEN CAST(stop_hits AS DOUBLE) / CAST(n_tok AS DOUBLE) >= 0.05
                THEN 'en' ELSE 'other' END AS pred_lang
    FROM t
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language-ID heuristic: docs whose English
    stopword ratio ≥ 5% are tagged 'en'."""
    docs = _docs(spark, sf_dir)
    tok = tokens(F.col("text"))
    hits = stopword_hits(tok).cast("bigint")
    nt = F.size(tok).cast("bigint")
    return docs.select(
        "doc_id",
        hits.alias("stop_hits"),
        F.when(
            hits.cast("double") / nt.cast("double") >= 0.05, "en"
        ).otherwise("other").alias("pred_lang"),
    )


@query(
    "q_lang_confusion",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             CASE WHEN CAST(len(list_filter({_TOKENS_SQL},
                       t -> t IN ({_STOP_SQL}))) AS DOUBLE)
                       / CAST(len({_TOKENS_SQL}) AS DOUBLE) >= 0.05
                  THEN 'en' ELSE 'other' END AS pred_lang
      FROM documents
    )
    SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM t GROUP BY lang, pred_lang
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang-ID heuristic against the labeled
    lang column — the evaluation loop a corpus pipeline runs after any
    classifier pass."""
    docs = _docs(spark, sf_dir)
    tok = tokens(F.col("text"))
    hits = stopword_hits(tok).cast("double")
    nt = F.size(tok).cast("double")
    pred = F.when(hits / nt >= 0.05, "en").otherwise("other")
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Quality scoring ---------------------------------------------------------------


@query(
    "q_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOKENS_SQL}) AS DOUBLE) AS n_tok,
             CAST(len(list_filter({_TOKENS_SQL},
                  t -> t IN ({_STOP_SQL}))) AS DOUBLE) AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           0.5 * least(n_tok / 100.0, 1.0)
           + 0.5 * (stop_hits / n_tok) AS quality_score
    FROM t
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score: length saturation + stopword
    density (both engines evaluate the identical float expression
    tree, so the doubles match bit-for-bit)."""
    docs = _docs(spark, sf_dir)
    tok = tokens(F.col("text"))
    nt = F.size(tok).cast("double")
    hits = stopword_hits(tok).cast("double")
    score = 0.5 * F.least(nt / 100.0, F.lit(1.0)) + 0.5 * (hits / nt)
    return docs.select("doc_id", score.alias("quality_score"))


# Exact dedup + fingerprints ------------------------------------------------------


@query(
    "q_dedup_exact_text",
    oracle=f"""
    SELECT {_FP_SQL} AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY fp
    """,
)
def q_dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (normalized) text dedup: hash-groupBy on the md5
    fingerprint, deterministic keeper = min doc_id. At 100 TB this is
    one shuffle on a 16-byte key — the canonical first dedup pass."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select(fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "q_doc_fingerprint",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT {_FP_SQL}) AS BIGINT) AS n_distinct
    FROM documents GROUP BY source
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-fingerprint accounting per source (dup-rate monitor)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.select("source", fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_distinct"),
        )
    )


# MinHash signatures + LSH candidate pairs ----------------------------------------

_N_BANDS = 4


def _band_sql(seed: int) -> str:
    return (
        f"list_aggregate(list_transform({_SHINGLES_SQL}, "
        f"s -> md5('{seed}:' || s)), 'min')"
    )


@query(
    "q_minhash_bands",
    oracle="""
    SELECT doc_id, """
    + ", ".join(f"{_band_sql(i)} AS b{i}" for i in range(_N_BANDS))
    + """
    FROM documents
    """,
)
def q_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MinHash signature (word-3-gram shingles, md5 hash
    family, 4 bands). Fully oracle-checkable because md5 is identical
    across engines — signatures, not just row counts. Served from the
    at-rest signature store (operators/index_store.py): the shingle
    pipeline runs once per dataset version, shared with every other
    signature consumer."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_minhash_signatures,
    )

    return stored_minhash_signatures(_docs(spark, sf_dir), n_bands=_N_BANDS)


@query(
    "q_near_dup_pairs",
    oracle="""
    WITH sig AS (
      SELECT doc_id, """
    + ", ".join(f"{_band_sql(i)} AS b{i}" for i in range(_N_BANDS))
    + """
      FROM documents
    ), bands AS (
    """
    + "\nUNION ALL\n".join(
        f"SELECT doc_id, {i} AS band_idx, b{i} AS band_val FROM sig"
        for i in range(_N_BANDS)
    )
    + """
    ), sized AS (
      -- quadratic-blowup guard, mirrored from the Spark operator
      SELECT doc_id, band_idx, band_val FROM bands
      QUALIFY COUNT(*) OVER (PARTITION BY band_idx, band_val) <= 1000
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sized a JOIN sized b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    """,
)
def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing ANY band value become candidate
    near-duplicate pairs. The join key is (band_idx, band_val) — at
    100 TB the shuffle is per-bucket, never all-pairs; skewed buckets
    (boilerplate docs) are capped by the operator's max_bucket_size
    guard (mirrored in the oracle's QUALIFY) and AQE skew-join splits
    what remains."""
    from babylon_data_loader_spark.operators.dedup import (
        lsh_candidate_pairs,
        stored_minhash_signatures,
    )

    # The signature table comes from the at-rest store (computed once
    # per dataset version); persist the read so the band self-join
    # scans the parquet once, not per side.
    sig = persist_tracked(
        stored_minhash_signatures(_docs(spark, sf_dir), n_bands=_N_BANDS)
    )
    return lsh_candidate_pairs(sig, n_bands=_N_BANDS, max_bucket_size=1000)


# SimHash --------------------------------------------------------------------------


def _simhash_oracle() -> str:
    # Per-token md5; bit j = parity of hex char j; simhash bit j set
    # when Σ(±1) > 0 over tokens.
    bit_terms = []
    for j in range(1, 17):
        bit_terms.append(
            f"CASE WHEN SUM(CASE WHEN (strpos('0123456789abcdef', "
            f"substr(h, {j}, 1)) - 1) % 2 = 1 THEN 1 ELSE -1 END) > 0 "
            f"THEN {1 << (j - 1)} ELSE 0 END"
        )
    bits = " + ".join(bit_terms)
    return f"""
    WITH tok AS (
      SELECT doc_id, md5(t.token) AS h
      FROM documents, unnest({_TOKENS_SQL}) AS t(token)
    )
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
    FROM tok GROUP BY doc_id
    """


@query("q_simhash", oracle=_simhash_oracle())
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: per-token md5, hex-char-parity bit
    sampling, majority vote per bit. Explode + conditional aggregation
    — one shuffle keyed by doc_id."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    ).withColumn("h", F.md5("token"))
    bit_sum = None
    for j in range(1, 17):
        vote = F.sum(
            F.when(hex_char_parity("h", j) == 1, 1).otherwise(-1)
        )
        term = F.when(vote > 0, F.lit(1 << (j - 1))).otherwise(F.lit(0))
        bit_sum = term if bit_sum is None else (bit_sum + term)
    return tok.groupBy("doc_id").agg(bit_sum.cast("bigint").alias("simhash"))


# TF-IDF ----------------------------------------------------------------------------


@query(
    "q_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, term
    ), df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY term
    ), n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
    SELECT doc_id, term, tf, df,
           round(tf * ln(n.n / df), 9) AS tfidf
    FROM tf JOIN df USING (term), n
    QUALIFY row_number() OVER (
      PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Ranking uses the INTEGER
    surrogate order (tf desc, df asc, term) — fully deterministic
    across engines — while the tfidf double (rounded to 9) rides along
    as a value column; ordering by the float itself would gamble the
    top-k boundary on libm ln() ulp agreement. Corpus size reaches the
    plan as a scalar subquery; df is vocabulary-sized and shuffles on
    term with map-side combine. Terms come from the shared at-rest
    normalized-token store (r13): the scan replaces the per-run
    corpus tokenization."""
    from babylon_data_loader_spark.operators.index_store import (
        stored_norm_tokens,
    )

    docs = _docs(spark, sf_dir)
    tok = stored_norm_tokens(docs).select(
        "doc_id", F.explode("tok").alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n = docs.count()  # O(1) scalar; the count is scan-metadata cheap
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(df_, on="term")
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.lit(float(n)) / F.col("df")), 9
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


# n-gram frequency ------------------------------------------------------------------


@query(
    "q_bigram_freq",
    oracle=f"""
    WITH t AS (SELECT {_TOKENS_LOWER_SQL} AS tok FROM documents)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(list_transform(
               generate_series(1, len(tok) - 1),
               j -> tok[j] || ' ' || tok[j+1])) AS bigram
      FROM t WHERE len(tok) >= 2
    )
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
)
def q_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams (deterministic tiebreak on the
    bigram). Bigram construction is an array transform over the token
    column — narrow, codegen'd — and the count is one shuffle with
    map-side combine; top-k is TakeOrdered, not a global sort."""
    docs = _docs(spark, sf_dir)
    tok = tokens(F.lower(F.col("text")))
    return (
        docs.select(tok.alias("_tok"))
        .filter(F.size("_tok") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tok") - 1),
                    lambda j: F.concat_ws(
                        " ",
                        F.element_at(F.col("_tok"), j),
                        F.element_at(F.col("_tok"), j + 1),
                    ),
                )
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


# ML-prep: label encoding + feature hashing -----------------------------------------


@query(
    "q_label_encode",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source
    )
    SELECT source, n,
           CAST(row_number() OVER (ORDER BY n DESC, source ASC) - 1
                AS BIGINT) AS label_id
    FROM counts
    """,
)
def q_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic label encoding (StringIndexer semantics): ordinal
    ids by descending frequency, ties broken lexicographically — so
    the same vocabulary always gets the same ids, a requirement for
    reusing a trained model across re-runs. The ordinal assignment is
    the distributed two-pass row number (operators/rank.py) over the
    label frame — a label vocabulary can reach token-vocabulary scale,
    so it gets the same treatment as rows."""
    from babylon_data_loader_spark.operators.rank import (
        with_global_row_number,
    )

    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    return with_global_row_number(
        counts, [F.col("n").desc(), F.col("source").asc()], "rn"
    ).select(
        "source", "n", (F.col("rn") - 1).cast("bigint").alias("label_id")
    )


@query(
    "q_feature_hash",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term FROM documents
    )
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(term), 1, 4)) AS INTEGER) % 64
                AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS weight
    FROM tok GROUP BY doc_id, bucket
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: tokens mapped to a fixed 64-bucket feature
    space via md5 (the one hash family identical across engines —
    murmur/xxhash are not), weights = term counts. Output is the
    sparse feature representation a downstream trainer consumes; no
    vocabulary state, no OOV problem, shuffle keyed by (doc, bucket)
    with map-side combine."""
    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 4), 16, 10)
        .cast("int")
        % 64
    ).cast("int")
    return (
        docs.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col("text")))).alias("term"),
        )
        .groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("weight"))
    )


@query(
    "q_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOKENS_LOWER_SQL}) AS token FROM documents
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_n FROM tok)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM tok, tot
    GROUP BY token, total_n
    HAVING COUNT(*) > CAST(FLOOR(0.005 * total_n) AS BIGINT)
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens in > 0.5% of all token occurrences, computed EXACTLY but
    without a full-vocabulary shuffle: per-partition Misra–Gries
    summaries prune to O(partitions/φ) candidates, then one broadcast
    semi-join recounts exactly (operators/heavy_hitters.py). The
    oracle is the plain HAVING aggregate — the sketch only prunes,
    the boundary is exact. Tokens come from the shared at-rest
    normalized-token store (r13)."""
    from babylon_data_loader_spark.operators.heavy_hitters import (
        heavy_hitters,
    )
    from babylon_data_loader_spark.operators.index_store import (
        stored_norm_tokens,
    )

    docs = _docs(spark, sf_dir)
    tok = stored_norm_tokens(docs).select(
        F.explode("tok").alias("token")
    )
    return heavy_hitters(tok, "token", phi=0.005)


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL} AS ts FROM documents
    ), idx AS (
      SELECT doc_id, ts,
             unnest(generate_series(
               0, CAST(GREATEST(len(ts) - 17, 0) // 48 AS BIGINT)
             )) AS chunk_idx
      FROM tok
    ), chunks AS (
      SELECT doc_id,
             CAST(chunk_idx AS BIGINT) AS chunk_idx,
             list_slice(ts, chunk_idx * 48 + 1,
                        LEAST(chunk_idx * 48 + 64, len(ts))) AS chunk
      FROM idx
      WHERE chunk_idx * 48 < len(ts)
    )
    SELECT doc_id, chunk_idx,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           chunk[1] AS first_token,
           md5(list_aggregate(chunk, 'string_agg', ' ')) AS chunk_md5
    FROM chunks
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the standard LLM prep step
    of splitting long documents into 64-token windows with stride 48
    (16-token overlap). Pure JVM array ops: slice windows out of the
    tokenized array via a posexploded index range; no shuffle beyond
    the final exchange-free projection. The md5 of each chunk's
    re-joined text pins content equality (not just lengths) across
    engines."""
    docs = _docs(spark, sf_dir)
    ts = tokens(F.col("text"))
    n = F.size(ts)
    # number of windows: ceil(max(len - overlap, 1) / stride), via the
    # same floor arithmetic as the oracle (windows start at i*48 while
    # i*48 < len)
    n_windows = (F.greatest(n - 17, F.lit(0)) / 48).cast("bigint") + 1
    tok = docs.select("doc_id", ts.alias("ts"), n_windows.alias("nw"))
    idx = tok.select(
        "doc_id",
        "ts",
        F.posexplode(F.expr("array_repeat(1, CAST(nw AS INT))")).alias(
            "chunk_idx", "_one"
        ),
    ).filter(F.col("chunk_idx") * 48 < F.size("ts"))
    chunk = F.slice(
        F.col("ts"),
        F.col("chunk_idx") * 48 + 1,
        F.least(
            F.lit(64),
            F.size("ts") - F.col("chunk_idx") * 48,
        ),
    )
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.element_at(chunk, 1).alias("first_token"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_md5"),
    )


@query(
    "q_unigram_nll",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term FROM documents
    ), vocab AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term
    ), consts AS (
      SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM tok) AS n,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM vocab) AS v
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(CAST(SUM(CAST(round(
                   -ln((CAST(vo.cnt AS DOUBLE) + 1.0) / (c.n + c.v)), 9)
                 AS DECIMAL(28,9))) * 1000000000 AS HUGEINT) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1000000000.0) AS avg_nll
    FROM tok t JOIN vocab vo USING (term), consts c
    GROUP BY t.doc_id
    """,
)
def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-document mean unigram
    negative log-likelihood under the corpus's own add-one-smoothed
    unigram model — the cheap statistical filter LLM pipelines run
    before anything model-based (low-NLL ⇒ repetitive boilerplate,
    high-NLL ⇒ noise/rare-token soup). Two aggregations (vocab counts,
    per-doc mean) + one join on term; per-token log terms are rounded
    then summed as DECIMAL so the cross-partition addition order
    cannot perturb the hash-checked result."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    n_total = float(tok.count())
    v_total = float(vocab.count())
    term_nll = F.round(
        -F.log(
            (F.col("cnt").cast("double") + F.lit(1.0))
            / F.lit(n_total + v_total)
        ),
        9,
    ).cast("decimal(28,9)")
    return (
        tok.join(vocab, on="term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            # grid-9 decimal sum / integer count: scale the sum to
            # an exact integer and divide once (round(x, 6) of the
            # rational was the half-way build hazard)
            (
                (F.sum(term_nll) * 1000000000)
                .cast("decimal(38,0)")
                .cast("double")
                / (
                    F.count(F.lit(1)).cast("double")
                    * F.lit(1000000000.0)
                )
            ).alias("avg_nll"),
        )
    )
