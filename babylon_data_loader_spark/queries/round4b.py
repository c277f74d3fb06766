"""Round-4 wave 2: dataset profiling, information-theoretic quality
signals, radius (range) similarity search, containment dedup, and a
skew-resistant salted aggregation.

These extend the LLM-pipeline family (SURVEY.md §2 goes beyond the
reference surface by design): a corpus curation run profiles columns
before ingest, filters by length band and word-entropy, dedups by
shingle containment (asymmetric — catches quote-inclusion the
symmetric Jaccard misses), and every wide aggregation must survive a
hot key. Exact-match discipline as in queries/__init__.py: identical
aliases, per-term rounding before DECIMAL sums, deterministic
tiebreaks.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.text import tokens
from babylon_data_loader_spark.functions.vectors import cosine
from babylon_data_loader_spark.functions.numerics import grid_sum
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

_TOKENS_LOWER_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"


# Column profiling -------------------------------------------------------------
# Reference analogue: the loader's batch sanity checks counted rows and
# nulls before sync (/root/reference/datalake/stats.go) — this is the
# table-wide version a 100 TB ingest runs first. One pass, one
# single-group aggregate: partial aggregation on every executor, a
# single-row exchange, no per-column jobs.


@query(
    "q_column_profile",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(text) AS BIGINT) AS null_text,
           CAST(COUNT(*) - COUNT(lang) AS BIGINT) AS null_lang,
           CAST(COUNT(*) - COUNT(source) AS BIGINT) AS null_source,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS distinct_lang,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS distinct_source,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (row count, per-column null counts,
    distinct counts, numeric min/max/sum). All integer-exact. The two
    COUNT(DISTINCT) columns expand to one partial-dedup pass each
    under Spark's expand-operator rewrite — still one job, no UDFs."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("text")).alias("null_text"),
        (F.count(F.lit(1)) - F.count("lang")).alias("null_lang"),
        (F.count(F.lit(1)) - F.count("source")).alias("null_source"),
        F.count_distinct(F.col("lang")).alias("distinct_lang"),
        F.count_distinct(F.col("source")).alias("distinct_source"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# Word-distribution entropy ----------------------------------------------------
# A repetition/diversity quality signal: low entropy ⇒ the document
# reuses few words (boilerplate, keyword stuffing); used alongside the
# Gopher-style repetition gate in queries/curation2.py.


@query(
    "q_word_entropy",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_LOWER_SQL}) AS term FROM documents
    ), cnt AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY doc_id, term
    ), tot AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY doc_id
    )
    SELECT c.doc_id, ANY_VALUE(t.n) AS n_tokens,
           CAST(CAST(SUM(CAST(round(
                   -(CAST(c.c AS DOUBLE) / t.n)
                     * ln(CAST(c.c AS DOUBLE) / t.n), 9)
                 AS DECIMAL(28,9))) * 1000000000 AS HUGEINT)
                AS DOUBLE) / 1000000000.0 AS entropy
    FROM cnt c JOIN tot t USING (doc_id)
    GROUP BY c.doc_id
    """,
)
def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution,
    H = -Σ p·ln p over the doc's own term frequencies. Two shuffles:
    (doc_id, term) for the counts, then doc_id for the window + rollup
    (hash(doc_id, term) does not co-locate a doc's terms, so the
    second exchange is real — PLANS.md shows exactly 2). Per-term
    contributions are rounded to 9 decimals then summed as DECIMAL so
    partition order cannot perturb the result."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )
    cnt = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("c")
    )
    p = F.col("c").cast("double") / F.col("n")
    term_h = F.round(-p * F.log(p), 9).cast("decimal(28,9)")
    # Window over doc_id instead of a join: one doc_id exchange serves
    # both the per-doc total and the final rollup (a join against a
    # separately-aggregated totals frame would add a third).
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id")
    return (
        cnt.withColumn("n", F.sum("c").over(w))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_tokens"),
            grid_sum(term_h, 9).alias("entropy"),
        )
    )


# Radius (range) similarity search --------------------------------------------
# The range-query twin of q_knn_cosine: "everything within distance r"
# rather than "the k nearest". At 100 TB the same shape as the
# brute-force kNN: broadcast the 1-row query vector, scan-side filter,
# no shuffle at all (the final sort is on the handful of survivors).


@query(
    "q_radius_search",
    oracle="""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT a.vec_id, a.label,
             round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE)
                          * CAST(q.embedding[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(a.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(q.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 9)
               AS sim
      FROM embeddings a, q
      WHERE a.vec_id <> 0
    )
    SELECT vec_id, label, sim FROM sims
    WHERE sim >= 0.25
    ORDER BY sim DESC, vec_id ASC
    """,
)
def q_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All vectors with cosine similarity ≥ 0.25 to the query vector.
    Broadcast 1-row query side, similarity computed scan-side and
    filtered before anything moves; rounded to 9 decimals in both
    engines so the threshold comparison is bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    sim = F.round(cosine(F.col("embedding"), F.col("q_embedding")), 9)
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .withColumn("sim", sim)
        .filter(F.col("sim") >= 0.25)
        .select("vec_id", "label", "sim")
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
    )


# Benford leading-digit audit --------------------------------------------------
# A data-quality screen for numeric columns: natural multi-scale
# amounts follow Benford's law; a synthetic or truncated column does
# not. Counts are exact; the frequency and expectation are single
# divisions on the final 9-row result.


@query(
    "q_benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM d)
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) / ANY_VALUE(t.n) AS freq,
           round(log10(1.0 + 1.0 / digit), 6) AS benford
    FROM d, tot t
    GROUP BY digit
    ORDER BY digit
    """,
)
def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of order totals vs the Benford
    expectation log10(1+1/d). One shuffle on a 9-value key; the total
    count rides along as a broadcast scalar subquery, not a second
    scan of the aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("int")
        .alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = d.count()
    return (
        # n/total is a structural integer ratio: single unrounded
        # IEEE division (round(x, 6) is the half-way build hazard)
        counts.withColumn(
            "freq", F.col("n") / F.lit(float(total))
        )
        .withColumn(
            "benford",
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6),
        )
        .orderBy("digit")
    )


# Containment near-dup pairs ---------------------------------------------------
# Asymmetric containment |A∩B| / min(|A|,|B|): catches a short document
# quoted inside a long one, which symmetric Jaccard dilutes below
# threshold. Same bucketed candidate generation as q_jaccard_pairs —
# shared 3-shingles, hot-bucket cap — with the containment metric in
# the verify stage.


_SHINGLES_SQL = f"""
  CASE WHEN len({_TOKENS_LOWER_SQL}) >= 3
       THEN list_transform(generate_series(1, len({_TOKENS_LOWER_SQL}) - 2),
              j -> concat_ws(' ', {_TOKENS_LOWER_SQL}[j],
                             {_TOKENS_LOWER_SQL}[j+1],
                             {_TOKENS_LOWER_SQL}[j+2]))
       ELSE [array_to_string({_TOKENS_LOWER_SQL}, ' ')] END
"""


@query(
    "q_containment_pairs",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SHINGLES_SQL})) AS s
      FROM documents
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id
    ), common AS (
      -- document-frequency cap mirrored from the Spark operator: a
      -- shingle shared by > 100 documents generates no candidates
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 100
    ), inter AS (
      SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS i
      FROM sh sa
      JOIN common c ON c.s = sa.s
      JOIN sh sb ON sb.s = sa.s AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           CAST(i.i AS DOUBLE) / least(za.sz, zb.sz) AS containment
    FROM inter i
    JOIN sizes za ON za.doc_id = i.doc_a
    JOIN sizes zb ON zb.doc_id = i.doc_b
    WHERE 5 * i.i >= 4 * least(za.sz, zb.sz)
    ORDER BY doc_a, doc_b
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs where the smaller document's shingle set is ≥80%
    contained in the other's. The document-frequency cap (a shingle in
    >100 docs generates no candidates — at 100 TB those are
    boilerplate n-grams that would produce quadratic candidates and
    near-zero containment evidence anyway) is a scan-time filter on
    the shingle store's ``_df`` derivation column (r15 — computed
    once at store build; the former per-run count-aggregate +
    anti-join guard paid a full extra shuffle of the shingle frame
    every execution). The ≤100-df "common" set a join against
    under-cap shingles would need grows with the vocabulary and
    would stop broadcasting; a stored per-shingle count does not.
    Pair generation then happens inside each shingle bucket:
    groupBy(shingle) + collect_list (arrays capped at ≤100 ids by the
    guard, so aggregation buffers are bounded by construction) and an
    in-row double explode — no self-join of the exploded frame, and
    the intersection count shuffles only (doc_a, doc_b) pairs, never
    text. Measured at sf0.1: 2.8 s → 2.0 s warm vs the former
    common-join + self-join shape, identical output."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_doc_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    # The exploded DISTINCT (doc_id, shingle) frame comes from the
    # AT-REST shingle store (operators/index_store.py — tokenize +
    # shingle runs once per dataset version; every dedup-family query
    # shares the parquet). Two consumers (sizes, rare) each re-scan
    # the pruned parquet — cheaper than a persist round-trip.
    # r15: the document-frequency cap reads the store's ``_df``
    # derivation column (computed once at store build) instead of
    # running drop_oversized_buckets per run — the former count
    # aggregation + anti-join was one extra full shuffle of the
    # shingle frame on every execution (guide §2.4). Identical
    # semantics: _df IS rows-per-shingle in this distinct table.
    stored = stored_doc_shingles(docs)
    sh = stored.select(
        F.col("_id").alias("doc_id"), F.col("_sh").alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    rare = stored.where(F.col("_df") <= 100).select(
        F.col("_id").alias("doc_id"), F.col("_sh").alias("s")
    )
    buckets = rare.groupBy("s").agg(
        F.collect_list("doc_id").alias("ids")
    )
    pairs = (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("i")
    )
    return (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")
            ),
            on="doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")
            ),
            on="doc_b",
        )
        # the >= 0.8 cut is pure-INTEGER cross-multiplication
        # (5*i >= 4*min_size) and the emitted ratio is a single
        # unrounded IEEE division — a rounded-double threshold is the
        # half-way build hazard (r6 token-budget class)
        .filter(
            F.lit(5) * F.col("i")
            >= F.lit(4) * F.least("sza", "szb")
        )
        .withColumn(
            "containment",
            F.col("i").cast("double")
            / F.least("sza", "szb").cast("double"),
        )
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    )


# Length-band filter via exact rank percentiles --------------------------------
# Curation step: drop documents outside the [p05, p95] length band.
# Percentiles are rank-based (percentile_disc semantics) so the cut
# points are actual data values — integer-exact across engines, no
# interpolation-float hazard.


@query(
    "q_length_band",
    oracle="""
    WITH ranked AS (
      SELECT n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
             COUNT(*) OVER () AS n
      FROM documents
    ), band AS (
      SELECT
        MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.05 * n) AS BIGINT))
                 THEN n_chars END) AS p05,
        MAX(CASE WHEN rn = greatest(1, CAST(ceil(0.95 * n) AS BIGINT))
                 THEN n_chars END) AS p95
      FROM ranked
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(d.n_chars) AS BIGINT) AS max_chars,
           ANY_VALUE(b.p05) AS p05, ANY_VALUE(b.p95) AS p95
    FROM documents d, band b
    WHERE d.n_chars BETWEEN b.p05 AND b.p95
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def q_length_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents inside the exact [p05, p95] length band, count
    survivors per language. The band bounds are two scalar values
    (rank-percentile over a BIGINT column — deterministic, no float
    interpolation) broadcast into the filter. The rank pass is the
    distributed two-pass row number (operators/rank.py) over one
    narrow column; the two target ranks are O(1) driver metadata —
    no single-partition sort, no global-count window."""
    import math

    from babylon_data_loader_spark.operators.rank import (
        global_row_number_with_total,
    )

    docs = load_table(spark, sf_dir, "documents")
    ranked, n = global_row_number_with_total(
        docs.select("n_chars", "doc_id"),
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        "rn",
    )
    t05 = max(1, math.ceil(0.05 * n))
    t95 = max(1, math.ceil(0.95 * n))
    band = ranked.filter(F.col("rn").isin(t05, t95)).agg(
        F.max(
            F.when(F.col("rn") == t05, F.col("n_chars"))
        ).alias("p05"),
        F.max(
            F.when(F.col("rn") == t95, F.col("n_chars"))
        ).alias("p95"),
    )
    return (
        docs.crossJoin(F.broadcast(band))
        .filter(F.col("n_chars").between(F.col("p05"), F.col("p95")))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.max("p05").alias("p05"),
            F.max("p95").alias("p95"),
        )
        .orderBy("lang")
    )


# Skew-resistant salted aggregation -------------------------------------------
# The 100 TB survival pattern for a hot grouping key: pre-aggregate on
# (key, salt) so no single reducer receives the hot key's full volume,
# then merge the ≤N_SALT partials per key. DECIMAL partials make the
# two-stage sum exactly equal to the single-stage oracle.


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(event_type) with explicit salting: stage 1 aggregates
    on (event_type, crc32(event_id) % 16) — the hot key's rows spread
    over 16 reducers — stage 2 merges 16 partial rows per key.
    Exactness holds because both COUNT and DECIMAL SUM are
    associative. Spark's own partial aggregation does this for
    algebraic aggs already; the explicit form is the template for
    non-algebraic cases (collect_set, exact distinct) where map-side
    combine can't save you."""
    events = load_table(spark, sf_dir, "events")
    salted = (
        events.filter(
            F.col("value").isNotNull() & F.col("event_type").isNotNull()
        )
        .withColumn(
            "salt", F.crc32(F.col("event_id").cast("string")) % 16
        )
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(20,2)")).alias("pt"),
        )
    )
    return (
        salted.groupBy("event_type")
        .agg(
            F.sum("pn").cast("bigint").alias("n"),
            F.sum("pt").cast("double").alias("total"),
        )
        .orderBy("event_type")
    )


# Incremental dedup against an at-rest corpus ---------------------------------
# The cross-version op every continuously-ingesting corpus needs:
# "which of today's documents have we already ingested?". The batch
# side probes a Bloom sketch of the corpus fingerprints first
# (operators/sketch_join.py — bounded bitmap, broadcast, no shuffle),
# so the exact fingerprint join only pays for maybe-dups; false
# positives are removed by that join, keeping the result EXACT.


@query(
    "q_incremental_dedup",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT b.doc_id, b.source FROM fp b
    WHERE b.doc_id % 2 = 1
      AND NOT EXISTS (
        SELECT 1 FROM fp c WHERE c.doc_id % 2 = 0 AND c.fp = b.fp
      )
    ORDER BY b.doc_id
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even doc_ids play the at-rest corpus, odd doc_ids the incoming
    batch; keep batch documents whose normalized-text fingerprint is
    NOT already in the corpus. Plan shape: Bloom prefilter (broadcast
    bitmap, scan-side) → exact semi-join confirm on the surviving
    maybe-dups → narrow anti-join on doc_id. At 100 TB only the
    maybe-dup sliver pays the fingerprint shuffle; size n_bits to the
    corpus key count to hold the false-positive rate."""
    from babylon_data_loader_spark.functions.text import fingerprint
    from babylon_data_loader_spark.operators.sketch_join import (
        bloom_prefilter,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", fingerprint(F.col("text")).alias("fp")
    )
    corpus = fp.filter(F.col("doc_id") % 2 == 0)
    batch = fp.filter(F.col("doc_id") % 2 == 1)
    maybe_dups = bloom_prefilter(batch, corpus, "fp", "fp")
    confirmed = maybe_dups.join(
        corpus.select("fp").distinct(), on="fp", how="left_semi"
    )
    return (
        batch.join(
            confirmed.select("doc_id"), on="doc_id", how="left_anti"
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


# File provenance via the hidden _metadata column ------------------------------
# Every scanned row carries its source file (Spark's `_metadata`
# struct) — the lineage primitive behind per-file error isolation and
# audit logging (reference: per-file Stats.Failures,
# /root/reference/datalake/stats.go). The oracle pins the invariant
# that per-file attribution partitions the table exactly: file counts
# sum back to COUNT(*) with the staged file count intact.


@query(
    "q_file_provenance",
    oracle="""
    SELECT CAST(4 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS total_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
    FROM lineitem
    """,
)
def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage lineitem as 4 parquet files, read back grouping by
    `_metadata.file_path`, and fold the per-file rows into whole-table
    invariants. The per-file grouping is the provenance plumbing a
    100 TB audit needs (which file contributed which rows) at the cost
    of one shuffle keyed by file path — O(files) groups."""
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_provenance_{uuid.uuid4().hex[:12]}")
    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(4).write.mode("overwrite").parquet(work)
    try:
        staged = spark.read.parquet(work)
        per_file = staged.groupBy(
            F.col("_metadata.file_path").alias("file_path")
        ).agg(
            F.count(F.lit(1)).alias("file_rows"),
            F.count_distinct("l_orderkey").alias("file_orders"),
        )
        # n_orders must be recounted globally (orders span files), so
        # carry the order keys per file only as a correctness probe of
        # the sum; the distinct count comes from the staged table.
        total = staged.agg(
            F.count_distinct("l_orderkey").alias("n_orders")
        )
        final = per_file.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("file_rows").cast("bigint").alias("total_rows"),
        ).crossJoin(F.broadcast(total))
        rows = final.collect()  # 1-row invariant summary
        out_schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)
