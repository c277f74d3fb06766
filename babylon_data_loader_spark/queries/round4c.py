"""Round-4 wave 3: collocation mining (PMI) and cross-source
distribution drift — corpus-analysis ops a training-data pipeline
runs to understand what it's about to train on.

Float discipline notes specific to this module:
- PMI is ln of a RATIO OF INTEGERS (corpus counts) — one transcendental
  per output row on identical integer inputs in both engines, no
  cross-row float accumulation, so round-to-6 is stable.
- The chi-square statistic DOES sum per-cell floats across rows; each
  cell contribution is rounded then summed as DECIMAL (the
  q_unigram_nll pattern) so partition order cannot move the total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.numerics import grid_sum
from babylon_data_loader_spark.functions.text import tokens
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

_TOKENS_LOWER_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"


# PMI collocations -------------------------------------------------------------


@query(
    "q_pmi_collocations",
    oracle=f"""
    WITH t AS (SELECT {_TOKENS_LOWER_SQL} AS tok FROM documents),
    uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(tok) AS term FROM t) GROUP BY term
    ), bi AS (
      SELECT term_a, term_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM (
        SELECT unnest(list_transform(generate_series(1, len(tok) - 1),
                 j -> tok[j])) AS term_a,
               unnest(list_transform(generate_series(1, len(tok) - 1),
                 j -> tok[j+1])) AS term_b
        FROM t WHERE len(tok) >= 2
      )
      GROUP BY term_a, term_b
    ), n_tot AS (SELECT CAST(SUM(c_ab) AS DOUBLE) AS n FROM bi)
    SELECT b.term_a, b.term_b, b.c_ab,
           round(ln(ANY_VALUE(n_tot.n) * b.c_ab
                    / (CAST(ua.c AS DOUBLE) * ub.c)), 6) AS pmi
    FROM bi b
    JOIN uni ua ON ua.term = b.term_a
    JOIN uni ub ON ub.term = b.term_b, n_tot
    WHERE b.c_ab >= 3
    GROUP BY b.term_a, b.term_b, b.c_ab, ua.c, ub.c
    HAVING round(ln(ANY_VALUE(n_tot.n) * b.c_ab
                    / (CAST(ua.c AS DOUBLE) * ub.c)), 6) >= 0.3
    ORDER BY term_a, term_b
    """,
)
def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-word collocations with pointwise mutual information
    PMI = ln(N·c(a,b) / (c(a)·c(b))) ≥ 0.3, support ≥ 3 — the classic
    phrase-mining signal ("new york" scores high, "of the" does not).
    Two count aggregations + two broadcast-eligible joins on term; a
    threshold (not top-k) output dodges float rank-boundary
    instability entirely — every survivor is decided by its own
    rounded value, never by comparison against another float."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(tokens(F.lower(F.col("text"))).alias("_tok"))
    uni = (
        tok.select(F.explode("_tok").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        tok.filter(F.size("_tok") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tok") - 1),
                    lambda j: F.struct(
                        F.element_at(F.col("_tok"), j).alias("term_a"),
                        F.element_at(F.col("_tok"), j + 1).alias(
                            "term_b"
                        ),
                    ),
                )
            ).alias("p")
        )
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    # N = total bigram tokens = Σ (len(tok) − 1): integer aggregate,
    # collected as one scalar (index metadata, not data-plane).
    n_tot = float(
        tok.filter(F.size("_tok") >= 2)
        .select((F.size("_tok") - 1).alias("nb"))
        .agg(F.sum("nb").alias("n"))
        .first()["n"]
    )
    ua = uni.select(
        F.col("term").alias("term_a"), F.col("c").alias("ca")
    )
    ub = uni.select(
        F.col("term").alias("term_b"), F.col("c").alias("cb")
    )
    pmi = F.round(
        F.log(
            F.lit(n_tot)
            * F.col("c_ab")
            / (F.col("ca").cast("double") * F.col("cb"))
        ),
        6,
    )
    return (
        bi.join(ua, on="term_a")
        .join(ub, on="term_b")
        .withColumn("pmi", pmi)
        .filter(F.col("pmi") >= 0.3)
        .select("term_a", "term_b", "c_ab", "pmi")
        .orderBy("term_a", "term_b")
    )


# Cross-source distribution drift ---------------------------------------------


@query(
    "q_source_drift",
    oracle="""
    WITH cell AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY source, lang
    ), row_tot AS (
      SELECT source, CAST(SUM(o) AS BIGINT) AS rt FROM cell GROUP BY source
    ), col_tot AS (
      SELECT lang, CAST(SUM(o) AS BIGINT) AS ct FROM cell GROUP BY lang
    ), n_tot AS (SELECT CAST(SUM(o) AS DOUBLE) AS n FROM cell)
    SELECT c.source,
           CAST(SUM(c.o) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(CAST(round(
                   pow(c.o - (r.rt * t.ct / (SELECT n FROM n_tot)), 2)
                     / (r.rt * t.ct / (SELECT n FROM n_tot)), 9)
                 AS DECIMAL(28,9))) * 1000000000 AS HUGEINT)
                AS DOUBLE) / 1000000000.0 AS chi2
    FROM cell c
    JOIN row_tot r USING (source)
    JOIN col_tot t USING (lang)
    GROUP BY c.source
    ORDER BY c.source
    """,
)
def q_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source chi-square of the language distribution against the
    corpus-wide expectation — the drift screen run when a new crawl
    source lands: a high chi2 source is distributionally unlike the
    rest of the corpus. Contingency cells are one tiny aggregate
    (|sources|×|langs| rows); each cell's (o−e)²/e is rounded then
    DECIMAL-summed per source so the cross-cell addition is
    order-proof. Everything after the first groupBy is
    driver-negligible metadata arithmetic at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    cell = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("o")
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    cell = persist_tracked(cell)
    row_tot = cell.groupBy("source").agg(F.sum("o").alias("rt"))
    col_tot = cell.groupBy("lang").agg(F.sum("o").alias("ct"))
    n_tot = float(cell.agg(F.sum("o")).first()[0])
    e = F.col("rt") * F.col("ct") / F.lit(n_tot)
    contrib = F.round(
        F.pow(F.col("o") - e, F.lit(2)) / e, 9
    ).cast("decimal(28,9)")
    return (
        cell.join(row_tot, on="source")
        .join(col_tot, on="lang")
        .groupBy("source")
        .agg(
            F.sum("o").cast("bigint").alias("n_docs"),
            # the DECIMAL(28,9) sum sits on the 1e-9 grid, so
            # round(x, 6) of it is a structural half-way build hazard
            # (digits 7-9 == 500) — emit via the exact grid helper
            grid_sum(contrib, 9).alias("chi2"),
        )
        .orderBy("source")
    )


# Sharded corpus export --------------------------------------------------------


@query(
    "q_export_shards",
    oracle="""
    SELECT CAST(8 AS BIGINT) AS n_shards,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    """,
)
def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's last mile (operators/export.py): documents leave
    as 8 deterministic hash shards (xxhash64(doc_id) buckets — the
    same row lands in the same shard every run, which is what lets a
    training job checkpoint by shard), then the written shards are read BACK
    and the invariants recomputed from the written files: no row lost,
    none duplicated, content sums intact. The manifest row count must
    agree with the direct read."""
    import os
    import shutil
    import uuid

    from babylon_data_loader_spark.operators.export import (
        export_corpus,
        export_manifest,
    )

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_export_{uuid.uuid4().hex[:12]}")
    docs = load_table(spark, sf_dir, "documents")
    export_corpus(
        docs, work, fmt="parquet", shard_by="doc_id", n_shards=8
    )
    try:
        back = spark.read.parquet(work)
        manifest_rows = (
            export_manifest(spark, work, fmt="parquet")
            .agg(F.sum("n_rows"))
            .first()[0]
        )
        # n_shards counts the LOGICAL buckets (the deterministic
        # row→shard mapping re-derived on read-back), not physical
        # files — two bucket values may share a task partition.
        final = back.withColumn(
            "_shard", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8))
        ).agg(
            F.count_distinct("_shard").alias("n_shards"),
            F.count(F.lit(1)).alias("total_rows"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
        rows = final.collect()  # 1-row invariant summary
        if rows[0]["total_rows"] != manifest_rows:
            raise AssertionError(
                f"manifest rows {manifest_rows} != data rows "
                f"{rows[0]['total_rows']}"
            )
        out_schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)


# Bigram language-model scoring ------------------------------------------------


@query(
    "q_bigram_nll",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKENS_LOWER_SQL} AS tok FROM documents),
    big AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(tok) - 1),
               j -> tok[j])) AS term_a,
             unnest(list_transform(generate_series(1, len(tok) - 1),
               j -> tok[j+1])) AS term_b
      FROM t WHERE len(tok) >= 2
    ), uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(tok) AS term FROM t) GROUP BY term
    ), bic AS (
      SELECT term_a, term_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM big GROUP BY term_a, term_b
    ), v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM uni)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(CAST(round(
                   -ln((bc.c_ab + 1.0)
                       / (CAST(ua.c AS DOUBLE) + (SELECT v FROM v))), 9)
                 AS DECIMAL(28,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_nll
    FROM big g
    JOIN bic bc ON bc.term_a = g.term_a AND bc.term_b = g.term_b
    JOIN uni ua ON ua.term = g.term_a
    GROUP BY g.doc_id
    """,
)
def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram NLL under the corpus's own add-one
    model, P(b|a) = (c(ab)+1)/(c(a)+V) — the second-order companion to
    q_unigram_nll: repeated boilerplate scores low, shuffled-word
    salad scores HIGH here even when its unigram NLL looks normal.
    Same exactness recipe: per-bigram log terms rounded to 9 then
    DECIMAL-summed per doc. Shuffles: bigram counts, unigram counts,
    then one join keyed by the bigram pair."""
    from babylon_data_loader_spark.functions.cache import persist_tracked

    docs = load_table(spark, sf_dir, "documents")
    tok = persist_tracked(
        docs.select(
            "doc_id", tokens(F.lower(F.col("text"))).alias("_tok")
        )
    )
    big = persist_tracked(
        tok.filter(F.size("_tok") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_tok") - 1),
                    lambda j: F.struct(
                        F.element_at(F.col("_tok"), j).alias("term_a"),
                        F.element_at(F.col("_tok"), j + 1).alias(
                            "term_b"
                        ),
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", "p.term_a", "p.term_b")
    )
    uni = persist_tracked(
        tok.select(F.explode("_tok").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bic = big.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    v_total = float(uni.count())
    term_nll = F.round(
        -F.log(
            (F.col("c_ab").cast("double") + F.lit(1.0))
            / (F.col("c").cast("double") + F.lit(v_total))
        ),
        9,
    ).cast("decimal(28,9)")
    return (
        big.join(bic, on=["term_a", "term_b"])
        .join(
            uni.select(F.col("term").alias("term_a"), "c"), on="term_a"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(term_nll).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_nll"),
        )
    )
