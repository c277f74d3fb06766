"""Round-4 wave 5: warehouse/curation shapes the suite did not yet
cover — fuzzy record linkage, SCD Type-2 dimension building, triangle
counting, a data-quality constraint suite, OOV-rate against a derived
vocabulary, and equal-frequency binning.

Determinism discipline (same as every other module): integer or
DECIMAL arithmetic wherever a value crosses rows, epoch-micros for
event time, explicit total orders under every window/top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table

# Fuzzy record linkage ---------------------------------------------------------


@query(
    "q_fuzzy_join",
    oracle="""
    WITH names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS block_key,
             CAST(COUNT(*) AS BIGINT) AS n_records
      FROM part GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_records AS n_a, b.n_records AS n_b
    FROM names a
    JOIN names b ON a.block_key = b.block_key AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage: part-name variants within edit distance
    1–2, found via BLOCKED comparison — candidates share a blocking
    key (the noun token), so the self-join compares O(sum of block²)
    pairs instead of all-pairs; Levenshtein runs JVM-side only on the
    blocked candidates. This is the entity-resolution recipe (block →
    verify) at its smallest: at 100 TB the block key would be a
    phonetic code or MinHash bucket, but the join shape — never a
    cartesian, verify only inside blocks — is exactly this one.
    Reference analogue: the dedup key-matching at datalake/merge
    semantics is exact; this is its fuzzy extension."""
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy(
            "p_name", F.split("p_name", " ").getItem(1).alias("block_key")
        )
        .agg(F.count(F.lit(1)).alias("n_records"))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("block_key"),
        F.col("n_records").alias("n_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("block_key"),
        F.col("n_records").alias("n_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(b, "block_key")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(dist.between(1, 2))
        .select(
            "name_a",
            "name_b",
            dist.cast("long").alias("edit_dist"),
            "n_a",
            "n_b",
        )
        .orderBy("name_a", "name_b")
    )


# SCD Type-2 dimension build ---------------------------------------------------


@query(
    "q_scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts_us, event_id,
             CASE WHEN prev_type IS NULL OR prev_type <> event_type
                  THEN 1 ELSE 0 END AS is_change
      FROM ordered
    ),
    islands AS (
      SELECT user_id, event_type, ts_us,
             SUM(is_change) OVER (PARTITION BY user_id
                                  ORDER BY ts_us, event_id) AS version
      FROM changes
    ),
    runs AS (
      SELECT user_id, CAST(version AS BIGINT) AS version,
             MIN(event_type) AS event_type,
             MIN(ts_us) AS eff_from_us
      FROM islands GROUP BY user_id, version
    )
    SELECT user_id, version, event_type, eff_from_us,
           LEAD(eff_from_us) OVER (PARTITION BY user_id
                                   ORDER BY version) AS eff_to_us
    FROM runs
    WHERE user_id % 50 = 0
    ORDER BY user_id, version
    """,
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build: collapse each user's
    event stream into validity intervals [eff_from_us, eff_to_us) per
    run of identical event_type, open-ended (NULL) for the current
    state. Classic gaps-and-islands: LAG marks change points, a
    running SUM numbers the islands, one groupBy collapses them, LEAD
    closes each interval. All four windows share ONE partitioning
    (user_id) — a single shuffle serves the whole build. The user_id
    filter keeps the declared result compact; the build itself runs
    over every user."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        event_ts_us(load_table(spark, sf_dir, "events")).alias("ts_us"),
        "event_id",
    )
    w_order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = ev.withColumn(
        "is_change",
        F.when(
            F.lag("event_type").over(w_order).isNull()
            | (F.lag("event_type").over(w_order) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    islands = changes.withColumn(
        "version",
        F.sum("is_change").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = islands.groupBy("user_id", F.col("version").cast("long").alias("version")).agg(
        F.min("event_type").alias("event_type"),
        F.min("ts_us").alias("eff_from_us"),
    )
    w_ver = Window.partitionBy("user_id").orderBy("version")
    return (
        runs.withColumn("eff_to_us", F.lead("eff_from_us").over(w_ver))
        .filter(F.col("user_id") % 50 == 0)
        .select(
            "user_id", "version", "event_type", "eff_from_us", "eff_to_us"
        )
        .orderBy("user_id", "version")
    )


# Triangle counting ------------------------------------------------------------


@query(
    "q_triangle_count",
    oracle="""
    WITH ok_orders AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_partkey) BETWEEN 2 AND 10
    ), op AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN ok_orders USING (l_orderkey)
    ), e AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node AS part, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY node
    ORDER BY n_triangles DESC, part ASC LIMIT 20
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the co-purchase
    graph (same capped edge derivation as q_copurchase_pagerank). The
    operator (operators/graph.py::triangle_counts) orients every edge
    low→high (degree, id) and enumerates wedges only from forward
    adjacency — out-degree bounded O(sqrt(E)) even on hub nodes, the
    arboricity bound that keeps distributed triangle counting from
    exploding on skewed graphs. The oracle enumerates the same
    triangles the naive a<b<c way; counts agree exactly because
    orientation never changes the triangle set."""
    from babylon_data_loader_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    ok = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np").between(2, 10))
        .select("l_orderkey")
    )
    op2 = op.join(ok, "l_orderkey")
    a = op2.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = op2.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    counts = triangle_counts(edges, src="u", dst="v")
    return (
        counts.select(F.col("node").alias("part"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), F.col("part").asc())
        .limit(20)
    )


# Data-quality constraint suite ------------------------------------------------


@query(
    "q_data_quality",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(o_custkey) AS BIGINT) AS n_custkey,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct_key,
             CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_price_ok,
             CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_status_ok
      FROM orders
    ), orphan AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
      FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    )
    SELECT * FROM (
      SELECT 'completeness_custkey' AS constraint_name,
             round(CAST(n_custkey AS DOUBLE) / n_rows, 9) AS metric,
             n_custkey = n_rows AS passed FROM m
      UNION ALL
      SELECT 'uniqueness_orderkey',
             round(CAST(n_distinct_key AS DOUBLE) / n_rows, 9),
             n_distinct_key = n_rows FROM m
      UNION ALL
      SELECT 'range_totalprice_nonneg',
             round(CAST(n_price_ok AS DOUBLE) / n_rows, 9),
             n_price_ok = n_rows FROM m
      UNION ALL
      SELECT 'accepted_values_status',
             round(CAST(n_status_ok AS DOUBLE) / n_rows, 9),
             n_status_ok = n_rows FROM m
      UNION ALL
      SELECT 'referential_custkey',
             round(1.0 - CAST(o.n_orphans AS DOUBLE) / m.n_rows, 9),
             o.n_orphans = 0 FROM m, orphan o
    ) ORDER BY constraint_name
    """,
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality suite over `orders`: completeness,
    key uniqueness, value range, accepted values, and referential
    integrity against `customer`, emitted as one row per constraint
    with a [0,1] metric and a pass flag. Everything except the
    referential check folds into ONE single-pass aggregate (no
    per-constraint scans); the orphan count is a broadcast anti-join
    probe. At 100 TB this is the pattern for a pre-training data
    contract: one scan, many constraints. Reference analogue: the
    per-batch sanity guard at datalake/stats.go wraps counts the same
    way — this generalizes it to declarative constraints."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    m = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_orderkey").alias("n_distinct_key"),
        F.sum(
            F.when(F.col("o_totalprice") >= 0, 1).otherwise(0)
        ).alias("n_price_ok"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("n_status_ok"),
    )
    orphans = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            on=[o.o_custkey == c.c_custkey],
            how="left_anti",
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    base = m.join(F.broadcast(orphans))

    def row(name: str, metric: F.Column, passed: F.Column) -> DataFrame:
        return base.select(
            F.lit(name).alias("constraint_name"),
            F.round(metric, 9).alias("metric"),
            passed.alias("passed"),
        )

    n = F.col("n_rows").cast("double")
    out = (
        row(
            "completeness_custkey",
            F.col("n_custkey").cast("double") / n,
            F.col("n_custkey") == F.col("n_rows"),
        )
        .unionAll(
            row(
                "uniqueness_orderkey",
                F.col("n_distinct_key").cast("double") / n,
                F.col("n_distinct_key") == F.col("n_rows"),
            )
        )
        .unionAll(
            row(
                "range_totalprice_nonneg",
                F.col("n_price_ok").cast("double") / n,
                F.col("n_price_ok") == F.col("n_rows"),
            )
        )
        .unionAll(
            row(
                "accepted_values_status",
                F.col("n_status_ok").cast("double") / n,
                F.col("n_status_ok") == F.col("n_rows"),
            )
        )
        .unionAll(
            row(
                "referential_custkey",
                F.lit(1.0) - F.col("n_orphans").cast("double") / n,
                F.col("n_orphans") == 0,
            )
        )
    )
    return out.orderBy("constraint_name")


# OOV rate vs a derived vocabulary ---------------------------------------------


@query(
    "q_oov_rate",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+'))
             AS token
      FROM documents
    ),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token ASC)
                 AS rnk
        FROM toks GROUP BY token
      ) WHERE rnk <= 100
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           round(CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 9) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against a vocabulary
    DERIVED from the corpus itself (top-100 tokens, deterministic
    count-then-token rank). The tokenizer-coverage check every
    training pipeline runs before committing to a vocab: the vocab is
    a top-k agg (map-side partials), then a BROADCAST left join marks
    OOV tokens — the token explosion never shuffles twice. Exact
    integer counts; the rate divides two identical integers in both
    engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
            ),
        )
        .filter(F.col("rnk") <= 100)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    marked = toks.join(F.broadcast(vocab), "token", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double"),
                9,
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


# Equal-frequency binning ------------------------------------------------------


@query(
    "q_equal_freq_binning",
    oracle="""
    WITH binned AS (
      SELECT o_totalprice,
             NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q_equal_freq_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (decile) binning of order value — the feature
    bucketizer: NTILE over a TOTAL order (price, then orderkey, so
    ties at bin boundaries land identically in any engine), then
    per-bin count and bounds. MIN/MAX pick existing doubles — no float
    summation anywhere. Note the global NTILE is a single-partition
    window — fine for a bounded dimension, and the declared shape for
    the oracle; the at-scale variant is approx_percentile cutpoints +
    a broadcast range join (the q_length_band pattern)."""
    o = load_table(spark, sf_dir, "orders")
    binned = o.select(
        "o_totalprice",
        F.ntile(10)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("bin"),
    )
    return (
        binned.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bin")
    )


# Spearman rank correlation ----------------------------------------------------


@query(
    "q_spearman_corr",
    oracle="""
    WITH j AS (
      SELECT value AS x,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS y
      FROM events
      WHERE value IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ), ranked AS (
      -- doubled average ranks stay INTEGER under ties:
      -- 2*avg_rank = 2*RANK + (|ties| - 1)
      SELECT CAST(2 * RANK() OVER (ORDER BY x)
                  + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS rx2,
             CAST(2 * RANK() OVER (ORDER BY y)
                  + COUNT(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS ry2
      FROM j
    ), m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx2 * rx2 AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(rx2 * ry2 AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((sxy - sx * sy / n)
                 / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6)
             AS spearman_rho
    FROM m
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and its JSON `k`
    prop — the robust twin of q_correlation_moments (Pearson): rho is
    Pearson over RANKS, immune to outliers and monotone transforms.
    Exactness trick: tie-averaged ranks are half-integers, so the
    query carries DOUBLED ranks (2·avg_rank = 2·RANK + |ties| − 1 —
    always an integer; rho is invariant under the linear transform)
    and every cross-row sum is integer DECIMAL — both engines agree
    digit for digit. The global RANK is a single-partition window —
    the documented tradeoff for an exact oracle (same note as
    q_equal_freq_binning); the at-scale variant ranks against
    approx-percentile cutpoints, trading exact rho for boundedness."""
    j = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("value").alias("x"),
            F.get_json_object("props", "$.k").cast("double").alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    rx2 = (
        2 * F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
    ).cast("long")
    ry2 = (
        2 * F.rank().over(Window.orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("y"))
        - 1
    ).cast("long")
    ranked = j.select(rx2.alias("rx2"), ry2.alias("ry2"))
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("rx2")).alias("sx"),
        dec(F.col("ry2")).alias("sy"),
        dec(F.col("rx2") * F.col("rx2")).alias("sxx"),
        dec(F.col("ry2") * F.col("ry2")).alias("syy"),
        dec(F.col("rx2") * F.col("ry2")).alias("sxy"),
    )
    n = F.col("n")
    num = F.col("sxy") - F.col("sx") * F.col("sy") / n
    den = F.sqrt(F.col("sxx") - F.col("sx") * F.col("sx") / n) * F.sqrt(
        F.col("syy") - F.col("sy") * F.col("sy") / n
    )
    return m.select(
        n.cast("long").alias("n"),
        F.round(num / den, 6).alias("spearman_rho"),
    )


# Deterministic weighted sampling ----------------------------------------------

# P(keep) = l_quantity / 50: the md5-derived 24-bit uniform is compared
# against quantity * floor(2^24 / 50). Integer arithmetic end to end —
# no RNG state, no float thresholds — so the SAME rows are kept on
# every run, partitioning, and engine.
_WS_SCALE = (1 << 24) // 50  # 335544


@query(
    "q_weighted_sample",
    oracle=f"""
    WITH tagged AS (
      SELECT l_returnflag, l_quantity,
             ('0x' || substr(md5('wsample:' || CAST(l_orderkey AS VARCHAR)
                                 || '-' || CAST(l_linenumber AS VARCHAR)),
                             1, 6))::BIGINT
               < CAST(l_quantity AS BIGINT) * {_WS_SCALE} AS kept
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept THEN CAST(l_quantity AS DECIMAL(25,6))
                         ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
             AS qty_kept
    FROM tagged GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sampling (P ∝ l_quantity),
    DETERMINISTIC: the keep decision hashes the row's stable key
    (md5 → 24-bit integer) against an integer threshold, so the sample
    is reproducible across engines/runs/partitionings — the property
    `df.sample()` cannot give (its RNG seeds per partition). This is
    the importance-sampling primitive for corpus mixing: upweight
    high-value rows without a shuffle (the decision is per-row,
    embarrassingly parallel; the only shuffle is the evidence agg).
    Kept mass skews toward high quantity — visible as
    qty_kept/n_kept > mean quantity."""
    li = load_table(spark, sf_dir, "lineitem")
    u = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("wsample:"),
                    F.col("l_orderkey").cast("string"),
                    F.lit("-"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            6,
        ),
        16,
        10,
    ).cast("long")
    kept = u < F.col("l_quantity").cast("long") * F.lit(_WS_SCALE)
    zero = F.lit(0).cast("decimal(25,6)")
    return (
        li.select("l_returnflag", "l_quantity", kept.alias("kept"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.sum(
                F.when(
                    F.col("kept"), F.col("l_quantity").cast("decimal(25,6)")
                ).otherwise(zero)
            )
            .cast("double")
            .alias("qty_kept"),
        )
        .orderBy("l_returnflag")
    )


# Inverted-index boolean search ------------------------------------------------


@query(
    "q_boolean_search",
    oracle=r"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
               AS token
      FROM documents
    ), hits AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM toks WHERE token IN ('data', 'table', 'join')
      GROUP BY doc_id
    )
    SELECT doc_id, n_terms FROM hits WHERE n_terms = 3
    ORDER BY doc_id
    """,
)
def q_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) keyword search over an inverted-index shape:
    explode to DISTINCT (doc, token) postings, keep only the query
    terms (the posting-list read — at rest this is a partition-pruned
    scan of a token-partitioned index, exactly like the LSH bucket
    store), and intersect posting lists with ONE groupBy: a doc
    matches iff it holds all |terms| distinct terms. No joins at all —
    posting intersection degenerates to a count, the classic
    small-conjunction plan. At 100 TB the term filter reaches the
    index scan (three one-token partitions read, the corpus never
    scanned)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = ["data", "table", "join"]
    postings = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower("text")), r"\s+"))
        ).alias("token"),
    )
    return (
        postings.filter(F.col("token").isin(terms))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"))
        .filter(F.col("n_terms") == len(terms))
        .orderBy("doc_id")
    )


# Bounded BFS hop distance -----------------------------------------------------


@query(
    "q_bfs_hops",
    oracle="""
    WITH ok_orders AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_partkey) BETWEEN 2 AND 10
    ), op AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN ok_orders USING (l_orderkey)
    ), e AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ), src AS (
      SELECT MIN(src) AS s FROM e
    ), d0 AS (
      SELECT s AS node FROM src
    ), d1 AS (
      SELECT DISTINCT e.dst AS node FROM e JOIN d0 ON e.src = d0.node
    ), d2 AS (
      SELECT DISTINCT e.dst AS node FROM e JOIN d1 ON e.src = d1.node
    ), d3 AS (
      SELECT DISTINCT e.dst AS node FROM e JOIN d2 ON e.src = d2.node
    ), all_hops AS (
      SELECT node, 0 AS hop FROM d0
      UNION ALL SELECT node, 1 FROM d1
      UNION ALL SELECT node, 2 FROM d2
      UNION ALL SELECT node, 3 FROM d3
    )
    SELECT CAST(hop AS BIGINT) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM (SELECT node, MIN(hop) AS hop FROM all_hops GROUP BY node)
    GROUP BY hop ORDER BY hop
    """,
)
def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first traversal: nodes reachable from the
    lowest-id part of the co-purchase graph within 3 hops, grouped by
    minimum hop distance — the graph-traversal primitive (reachability
    / blast-radius queries) the iterative family (PageRank, connected
    components, triangles) did not yet cover. Each hop is ONE join of
    the frontier against the edge table co-partitioned on src plus a
    distinct — frontier frames are O(reached nodes), edges are never
    rewritten, and the hop bound makes the unrolled SQL oracle exact.
    At depth >3 the operator generalizes to iterate-until-fixpoint
    with the same per-iteration shape (the connected_components
    loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    ok = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np").between(2, 10))
        .select("l_orderkey")
    )
    op2 = op.join(ok, "l_orderkey")
    a = op2.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = op2.select("l_orderkey", F.col("l_partkey").alias("dst"))
    from babylon_data_loader_spark.functions.cache import persist_tracked

    edges = persist_tracked(
        a.join(b, "l_orderkey")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    frontier = edges.agg(F.min("src").alias("node"))
    hops = [frontier.withColumn("hop", F.lit(0))]
    for depth in (1, 2, 3):
        frontier = (
            edges.join(
                frontier.select(F.col("node").alias("src")), on="src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        hops.append(frontier.withColumn("hop", F.lit(depth)))
    from functools import reduce

    all_hops = reduce(lambda x, y: x.unionAll(y), hops)
    return (
        all_hops.groupBy("node")
        .agg(F.min("hop").alias("hop"))
        .groupBy(F.col("hop").cast("long").alias("hop"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("hop")
    )


# Time-weighted average --------------------------------------------------------


@query(
    "q_twap",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
      FROM events
      WHERE value IS NOT NULL AND user_id % 10 = 0
    ), seg AS (
      SELECT user_id, value, ts_us,
             LEAD(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS next_us
      FROM ev
    ), agg AS (
      SELECT user_id,
             SUM(CAST(value * (next_us - ts_us) AS DECIMAL(38,6)))
               AS weighted,
             CAST(SUM(next_us - ts_us) AS BIGINT) AS span_us
      FROM seg WHERE next_us IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           round(CAST(weighted AS DOUBLE) / span_us, 9) AS twap,
           span_us
    FROM agg WHERE span_us > 0
    ORDER BY user_id
    """,
)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — the financial/telemetry
    aggregate where each observation counts for HOW LONG it was
    current, not once: value_i holds from its event until the next
    (LEAD over the user timeline), weight = duration in integer
    micros, TWAP = Σ value·dur / Σ dur. The per-segment products are
    DECIMAL-summed (value × micros is exact at 6 decimal places), so
    the one float division at the end is engine-identical. One
    user_id shuffle serves the LEAD and the aggregate. Users with one
    event (zero span) are excluded rather than divided by zero."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id",
        event_ts_us(ev_raw).alias("ts_us"),
        "event_id",
        "value",
    ).filter(F.col("value").isNotNull() & (F.col("user_id") % 10 == 0))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = ev.withColumn("next_us", F.lead("ts_us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    dur = F.col("next_us") - F.col("ts_us")
    agg = seg.groupBy("user_id").agg(
        F.sum((F.col("value") * dur).cast("decimal(38,6)")).alias(
            "weighted"
        ),
        F.sum(dur).cast("long").alias("span_us"),
    )
    return (
        agg.filter(F.col("span_us") > 0)
        .select(
            "user_id",
            F.round(
                F.col("weighted").cast("double") / F.col("span_us"), 9
            ).alias("twap"),
            "span_us",
        )
        .orderBy("user_id")
    )


# Key-skew diagnostics ---------------------------------------------------------


@query(
    "q_key_skew",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ), top10 AS (
      SELECT SUM(c) AS t FROM (
        SELECT c FROM per_key ORDER BY c DESC, user_id ASC LIMIT 10
      )
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_key_n,
             CAST(SUM(c * c) AS BIGINT) AS sum_sq
      FROM per_key
    )
    SELECT m.n_keys, m.n_rows, m.max_key_n,
           CAST(top10.t AS BIGINT) AS top10_n,
           round(CAST(m.max_key_n AS DOUBLE) / m.n_rows, 9) AS top1_share,
           round(CAST(m.sum_sq AS DOUBLE)
                 / (CAST(m.n_rows AS DOUBLE) * m.n_rows), 9) AS hhi
    FROM m, top10
    """,
)
def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics — the pre-flight check before any
    big groupBy/join on a candidate key: per-key counts (one shuffle,
    map-side combinable), then the concentration summary a planner
    needs: max-key share (does one key dominate a partition?), top-10
    mass, and the Herfindahl index Σ(cᵢ/N)² computed from EXACT
    integer sums (Σcᵢ² / N² — no float accumulation). HHI ≈ 1/n_keys
    means uniform (salting unnecessary); HHI ≫ 1/n_keys flags the keys
    q_salted_agg's two-phase plan exists for. Output is one row —
    the diagnostics cost one pass regardless of table size."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    from babylon_data_loader_spark.functions.cache import persist_tracked

    per_key = persist_tracked(per_key)
    top10 = (
        per_key.orderBy(F.col("c").desc(), F.col("user_id").asc())
        .limit(10)
        .agg(F.sum("c").alias("t"))
    )
    m = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_n"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    return m.join(F.broadcast(top10)).select(
        "n_keys",
        "n_rows",
        "max_key_n",
        F.col("t").cast("long").alias("top10_n"),
        F.round(
            F.col("max_key_n").cast("double") / F.col("n_rows"), 9
        ).alias("top1_share"),
        F.round(
            F.col("sum_sq").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows")),
            9,
        ).alias("hhi"),
    )


# Unicode normalization before dedup -------------------------------------------


@query(
    "q_unicode_normalize",
    oracle=r"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' caf' || chr(233)
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' cafe' || chr(769)
      FROM documents WHERE doc_id % 7 = 0
    ), n AS (
      SELECT doc_id, text,
             regexp_replace(trim(lower(nfc_normalize(text))),
                            '\s+', ' ', 'g') AS norm
      FROM corpus
    ), groups_raw AS (
      SELECT md5(text) AS h, COUNT(*) AS c FROM n GROUP BY 1
    ), groups_norm AS (
      SELECT md5(norm) AS h, COUNT(*) AS c FROM n GROUP BY 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM n) AS n_docs,
           (SELECT CAST(SUM(CASE WHEN norm <> text THEN 1 ELSE 0 END)
                        AS BIGINT) FROM n) AS n_changed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM groups_raw WHERE c > 1)
             AS dup_groups_raw,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM groups_norm WHERE c > 1)
             AS dup_groups_norm
    """,
)
def q_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode normalization BEFORE dedup — the CCNet/Dolma corpus
    pass exact dedup is wrong without: precomposed 'café' (U+00E9)
    and decomposed 'cafe'+U+0301 are different byte strings that
    render identically. The query plants both forms as twins of every
    7th document; raw-md5 grouping sees them as distinct while
    normalized-md5 grouping (functions/udfs.py::nfc_casefold — NFC in
    an Arrow-batched pandas UDF, Spark's one missing text built-in)
    finds exactly one extra dup group per planted pair. n_changed
    counts precisely the docs whose bytes normalization touched —
    the decomposed twins."""
    from babylon_data_loader_spark.functions.udfs import nfc_casefold

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sevens = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = (
        docs.unionByName(
            sevens.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" café")).alias("text"),
            )
        ).unionByName(
            sevens.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" café")).alias("text"),
            )
        )
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    n = persist_tracked(
        corpus.withColumn("norm", nfc_casefold(F.col("text")))
    )
    groups_raw = (
        n.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dup_groups_raw"))
    )
    groups_norm = (
        n.groupBy(F.md5(F.col("norm").cast("binary")).alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dup_groups_norm"))
    )
    m = n.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("norm") != F.col("text"), 1).otherwise(0)
        ).alias("n_changed"),
    )
    return (
        m.join(F.broadcast(groups_raw))
        .join(F.broadcast(groups_norm))
        .select("n_docs", "n_changed", "dup_groups_raw", "dup_groups_norm")
    )


# EWMA smoothing ---------------------------------------------------------------


@query(
    "q_ewma",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
      FROM events
      WHERE value IS NOT NULL AND user_id % 25 = 0
    ), idx AS (
      SELECT user_id, ts_us, event_id, value,
             ROW_NUMBER() OVER w AS rn
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ), terms AS (
      SELECT a.user_id, a.rn, a.ts_us, a.event_id,
             SUM(CAST(b.value * power(0.5, a.rn - b.rn + 1)
                      AS DECIMAL(38,18))) AS s
      FROM idx a JOIN idx b
        ON b.user_id = a.user_id AND b.rn BETWEEN a.rn - 19 AND a.rn
      GROUP BY 1, 2, 3, 4
    )
    SELECT user_id, ts_us, round(CAST(s AS DOUBLE), 9) AS ewma
    FROM terms
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY rn DESC) = 1
    ORDER BY user_id
    """,
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of each user's
    value series, reported at their latest event. The recurrence
    y_t = αx_t + (1−α)y_{t−1} unrolls to Σ x_i·2^{−(t−i+1)} — and
    because α is a power of two, every weight is an EXACT double, so
    the 20-term window sum (weights below 2^-20 are sub-rounding
    noise) is engine-identical through DECIMAL addition with no
    rounding laundering. Spark side: one user_id shuffle; the window
    self-join is rank-banded (20 rows) — at scale this is the
    bounded-state streaming smoother (applyInPandasWithState carries
    y_{t-1}); the batch form is its audit twin."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id",
        event_ts_us(ev_raw).alias("ts_us"),
        "event_id",
        "value",
    ).filter(F.col("value").isNotNull() & (F.col("user_id") % 25 == 0))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    idx = ev.withColumn("rn", F.row_number().over(w))
    from babylon_data_loader_spark.functions.cache import persist_tracked

    idx = persist_tracked(idx)
    a = idx.select(
        "user_id",
        F.col("rn").alias("arn"),
        F.col("ts_us").alias("a_ts"),
        F.col("event_id").alias("a_id"),
    )
    b = idx.select(
        "user_id", F.col("rn").alias("brn"), F.col("value").alias("bval")
    )
    terms = (
        a.join(b, "user_id")
        .filter(F.col("brn").between(F.col("arn") - 19, F.col("arn")))
        .groupBy("user_id", "arn", "a_ts", "a_id")
        .agg(
            F.sum(
                (
                    F.col("bval")
                    * F.pow(F.lit(0.5), F.col("arn") - F.col("brn") + 1)
                ).cast("decimal(38,18)")
            ).alias("s")
        )
    )
    w_last = Window.partitionBy("user_id").orderBy(F.col("arn").desc())
    return (
        terms.withColumn("rk", F.row_number().over(w_last))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("a_ts").alias("ts_us"),
            F.round(F.col("s").cast("double"), 9).alias("ewma"),
        )
        .orderBy("user_id")
    )


# Per-group linear regression --------------------------------------------------


@query(
    "q_linreg_by_group",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS x,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS sx,
             SUM(y) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(18,0))) AS DECIMAL(18,0))
               AS sxx,
             SUM(CAST(x AS DECIMAL(12,0)) * y) AS sxy
      FROM ev GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 9) AS slope,
           round(CAST(sy * sxx - sx * sxy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept
    FROM m ORDER BY event_type
    """,
)
def q_linreg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares trend per event type (value vs integer
    DAY index): the grouped-model primitive — thousands of independent
    regressions in ONE map-combinable aggregate, no per-group
    iteration. Numerical discipline learned the hard way: the centered
    moment form (sxx − sx²/n) cancels ~8 significant digits at
    epoch-scale x and the last-ulp float noise diverges ACROSS ENGINES
    (FMA contraction, rounding boundaries). So x is an exact integer
    day, y an exact DECIMAL(18,6), and BOTH closed forms —
    slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) and
    intercept = (Σy·Σx² − Σx·Σxy)/(n·Σx² − (Σx)²) — are evaluated as
    EXACT decimal integer arithmetic end to end (operand precisions
    sized so products stay ≤ 37 digits, below Spark's cap), with ONE
    IEEE division at the very end. No float cancellation exists
    anywhere in the plan."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_type",
        F.floor(event_ts_us(ev_raw) / F.lit(86400000000))
        .cast("long")
        .alias("x"),
        F.col("value").cast("decimal(18,6)").alias("y"),
    ).filter(F.col("y").isNotNull() & F.col("x").isNotNull())
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(18,0)")).cast("decimal(18,0)").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,0)"))
        .cast("decimal(18,0)")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(12,0)") * F.col("y")).alias("sxy"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    icpt_num = (
        F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    ).cast("double")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(slope_num / den, 9).alias("slope"),
        F.round(icpt_num / den, 6).alias("intercept"),
    ).orderBy("event_type")


# Two-sample hypothesis tests --------------------------------------------------


@query(
    "q_rank_sum_test",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS grp,
             value AS x
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ), ranked AS (
      SELECT grp,
             CAST(2 * RANK() OVER (ORDER BY x)
                  + COUNT(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS r2
      FROM s
    ), ties AS (
      SELECT CAST(SUM(c * c * c - c) AS BIGINT) AS tie_term
      FROM (SELECT COUNT(*) AS c FROM s GROUP BY x)
    ), m AS (
      SELECT CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(SUM(CASE WHEN grp = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS r1_2
      FROM ranked
    )
    SELECT m.n1, m.n2,
           CAST(m.r1_2 - m.n1 * (m.n1 + 1) AS BIGINT) AS u1_doubled,
           round((CAST(m.r1_2 - m.n1 * (m.n1 + 1) AS DOUBLE) / 2
                  - CAST(m.n1 AS DOUBLE) * m.n2 / 2)
                 / sqrt(CAST(m.n1 AS DOUBLE) * m.n2 / 12.0
                        * ((m.n1 + m.n2 + 1)
                           - CAST(t.tie_term AS DOUBLE)
                             / ((m.n1 + m.n2)
                                * (m.n1 + m.n2 - 1.0)))), 6) AS z
    FROM m, ties t
    """,
)
def q_rank_sum_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test: do click and purchase values
    come from the same distribution? The nonparametric A/B-test
    primitive — robust where the t-test's moments are not. Exactness:
    doubled tie-averaged ranks (the q_spearman_corr trick) make the U
    statistic an INTEGER; the tie-corrected normal-approximation
    variance consumes only integer sums (Σ(t³−t) over tie groups), so
    both engines derive the same doubles before one sqrt. Global RANK
    = single-partition window, the documented exact-oracle tradeoff."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select(
            F.when(F.col("event_type") == "click", 1)
            .otherwise(2)
            .alias("grp"),
            F.col("value").alias("x"),
        )
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    s = persist_tracked(s)
    r2 = (
        2 * F.rank().over(Window.orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("x"))
        - 1
    ).cast("long")
    ranked = s.select("grp", r2.alias("r2"))
    ties = (
        s.groupBy("x")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(
                F.col("c") * F.col("c") * F.col("c") - F.col("c")
            ).alias("tie_term")
        )
    )
    m = ranked.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("grp") == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("grp") == 1, F.col("r2")).otherwise(0)).alias(
            "r1_2"
        ),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    u1d = F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)
    ntot = F.col("n1") + F.col("n2")
    var = (
        n1 * n2 / F.lit(12.0)
        * (
            (ntot + 1).cast("double")
            - F.col("tie_term").cast("double")
            / (ntot * (ntot - 1)).cast("double")
        )
    )
    z = (u1d.cast("double") / 2 - n1 * n2 / 2) / F.sqrt(var)
    return (
        m.join(F.broadcast(ties))
        .select(
            "n1",
            "n2",
            u1d.cast("long").alias("u1_doubled"),
            F.round(z, 6).alias("z"),
        )
    )


@query(
    "q_ks_statistic",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g2,
             value AS x
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ), counts AS (
      SELECT x, CAST(SUM(g1) AS BIGINT) AS c1, CAST(SUM(g2) AS BIGINT) AS c2
      FROM s GROUP BY x
    ), n AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM counts
    ), cum AS (
      SELECT SUM(c1) OVER (ORDER BY x) AS f1,
             SUM(c2) OVER (ORDER BY x) AS f2
      FROM counts
    )
    SELECT n.n1, n.n2,
           CAST(MAX(abs(cum.f1 * n.n2 - cum.f2 * n.n1)) AS BIGINT)
             AS d_num,
           CAST(n.n1 * n.n2 AS BIGINT) AS d_den,
           round(CAST(MAX(abs(cum.f1 * n.n2 - cum.f2 * n.n1)) AS DOUBLE)
                 / (n.n1 * n.n2), 9) AS d
    FROM cum, n GROUP BY n.n1, n.n2
    """,
)
def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic D = max|F₁−F₂| between
    click and purchase value distributions — the distribution-drift
    test that needs no binning choice (unlike the chi-square in
    q_source_drift). Exactness: D's numerator max|f₁·n₂ − f₂·n₁| is
    computed over INTEGER cumulative counts per distinct value — the
    maximum of integers is engine-exact, and one final division
    yields D. The cumulative window runs over DISTINCT values (not
    rows) — bounded by value cardinality; the at-scale variant bins
    to quantile sketches first."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select(
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("g1"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("g2"),
            F.col("value").alias("x"),
        )
    )
    counts = s.groupBy("x").agg(
        F.sum("g1").alias("c1"), F.sum("g2").alias("c2")
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    counts = persist_tracked(counts)
    n = counts.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        F.sum("c1").over(w).alias("f1"), F.sum("c2").over(w).alias("f2")
    )
    d = cum.join(F.broadcast(n)).select(
        "n1",
        "n2",
        F.abs(
            F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
        ).alias("num"),
    )
    return (
        d.groupBy("n1", "n2")
        .agg(F.max("num").alias("d_num"))
        .select(
            "n1",
            "n2",
            F.col("d_num").cast("long").alias("d_num"),
            (F.col("n1") * F.col("n2")).cast("long").alias("d_den"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                9,
            ).alias("d"),
        )
    )


@query(
    "q_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 2 END AS grp,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM events
      WHERE value IS NOT NULL AND event_type IN ('click', 'purchase')
    ), m AS (
      SELECT grp, CAST(COUNT(*) AS DECIMAL(18,0)) AS n,
             SUM(y) AS sy, SUM(y * y) AS syy
      FROM s GROUP BY grp
    ), w AS (
      SELECT CAST(a.n AS BIGINT) AS n1, CAST(b.n AS BIGINT) AS n2,
             CAST(a.sy AS DOUBLE) / CAST(a.n AS DOUBLE) AS m1,
             CAST(b.sy AS DOUBLE) / CAST(b.n AS DOUBLE) AS m2,
             CAST(a.n * a.syy - a.sy * a.sy AS DOUBLE)
               / (CAST(a.n AS DOUBLE) * (CAST(a.n AS DOUBLE) - 1)) AS v1,
             CAST(b.n * b.syy - b.sy * b.sy AS DOUBLE)
               / (CAST(b.n AS DOUBLE) * (CAST(b.n AS DOUBLE) - 1)) AS v2
      FROM m a, m b WHERE a.grp = 1 AND b.grp = 2
    )
    SELECT n1, n2, round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
           round(power(v1 / n1 + v2 / n2, 2)
                 / (power(v1 / n1, 2) / (n1 - 1)
                    + power(v2 / n2, 2) / (n2 - 1)), 3) AS df
    FROM w
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between click and purchase
    values — the parametric sibling of q_rank_sum_test, with the
    Satterthwaite effective degrees of freedom. Numerics discipline
    from the q_linreg_by_group lesson: each group's variance comes
    from the EXACT decimal determinant n·Σy² − (Σy)² divided once in
    double (never the cancelling sxx − sx²/n float form), so both
    engines see identical (m, v) pairs before the closing t and df
    arithmetic."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("click", "purchase")
        )
        .select(
            F.when(F.col("event_type") == "click", 1)
            .otherwise(2)
            .alias("grp"),
            F.col("value").cast("decimal(18,6)").alias("y"),
        )
    )
    m = s.groupBy("grp").agg(
        F.count(F.lit(1)).cast("decimal(18,0)").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    a = m.filter(F.col("grp") == 1).select(
        F.col("n").alias("na"), F.col("sy").alias("sya"),
        F.col("syy").alias("syya"),
    )
    b = m.filter(F.col("grp") == 2).select(
        F.col("n").alias("nb"), F.col("sy").alias("syb"),
        F.col("syy").alias("syyb"),
    )
    j = a.join(F.broadcast(b))
    n1d = F.col("na").cast("double")
    n2d = F.col("nb").cast("double")
    m1 = F.col("sya").cast("double") / n1d
    m2 = F.col("syb").cast("double") / n2d
    v1 = (F.col("na") * F.col("syya") - F.col("sya") * F.col("sya")).cast(
        "double"
    ) / (n1d * (n1d - 1))
    v2 = (F.col("nb") * F.col("syyb") - F.col("syb") * F.col("syb")).cast(
        "double"
    ) / (n2d * (n2d - 1))
    se2 = v1 / n1d + v2 / n2d
    t = (m1 - m2) / F.sqrt(se2)
    df = F.pow(se2, 2) / (
        F.pow(v1 / n1d, 2) / (n1d - 1) + F.pow(v2 / n2d, 2) / (n2d - 1)
    )
    return j.select(
        F.col("na").cast("long").alias("n1"),
        F.col("nb").cast("long").alias("n2"),
        F.round(m1 - m2, 6).alias("mean_diff"),
        F.round(t, 6).alias("t"),
        F.round(df, 3).alias("df"),
    )


@query(
    "q_acf",
    oracle="""
    WITH clean AS (
      SELECT epoch_us(ts) AS ts_us FROM events WHERE ts IS NOT NULL
    ), hourly AS (
      SELECT (ts_us // 3600000000) AS h, CAST(COUNT(*) AS BIGINT) AS c
      FROM clean GROUP BY 1
    ), spine AS (
      SELECT g.h, COALESCE(hourly.c, 0) AS c
      FROM (SELECT unnest(generate_series(
              (SELECT MIN(h) FROM hourly),
              (SELECT MAX(h) FROM hourly))) AS h) g
      LEFT JOIN hourly ON hourly.h = g.h
    ), pairs AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.c) AS BIGINT) AS sx,
             CAST(SUM(b.c) AS BIGINT) AS sy,
             CAST(SUM(a.c * a.c) AS BIGINT) AS sxx,
             CAST(SUM(b.c * b.c) AS BIGINT) AS syy,
             CAST(SUM(a.c * b.c) AS BIGINT) AS sxy
      FROM (VALUES (1), (2), (3)) l(lag)
      JOIN spine a ON TRUE
      JOIN spine b ON b.h = a.h + l.lag
      GROUP BY l.lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 9)
             AS acf
    FROM pairs ORDER BY lag
    """,
)
def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1-3 —
    the seasonality probe run before any forecasting. The series is
    the gap-filled dense hour spine (missing hours count 0, exactly
    like q_gap_fill — skipping them would silently splice
    non-adjacent hours together); every moment is an INTEGER sum over
    integer counts, the correlation is a ratio of exact integer
    determinants, and the only floats are two sqrts and one division
    at the end. Lagged pairing is a self-equi-join on hour+lag —
    co-partitioned, no window."""
    ev_raw = load_table(spark, sf_dir, "events")
    us = event_ts_us(ev_raw)
    hourly = (
        ev_raw.filter(F.col("ts").isNotNull())
        .select((us / F.lit(3_600_000_000)).cast("long").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    ).collect()[0]
    spine = (
        ev_raw.sparkSession.range(bounds["h0"], bounds["h1"] + 1)
        .withColumnRenamed("id", "h")
        .join(hourly, "h", "left")
        .select("h", F.coalesce("c", F.lit(0)).alias("c"))
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    spine = persist_tracked(spine)
    lags = ev_raw.sparkSession.range(1, 4).select(
        F.col("id").alias("lag")
    )
    a = spine.select("h", F.col("c").alias("ca"))
    b = spine.select(
        F.col("h").alias("hb"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(F.broadcast(lags))
        .join(b, F.col("hb") == F.col("h") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ca").alias("sx"),
            F.sum("cb").alias("sy"),
            F.sum(F.col("ca") * F.col("ca")).alias("sxx"),
            F.sum(F.col("cb") * F.col("cb")).alias("syy"),
            F.sum(F.col("ca") * F.col("cb")).alias("sxy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    denx = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    deny = F.sqrt(
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return pairs.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n"),
        F.round(num / (denx * deny), 9).alias("acf"),
    ).orderBy("lag")


@query(
    "q_feature_mi",
    oracle="""
    WITH s AS (
      SELECT event_type AS label, value,
             NTILE(10) OVER (ORDER BY value, event_id) AS b
      FROM events WHERE value IS NOT NULL
    ), joint AS (
      SELECT b, label, CAST(COUNT(*) AS BIGINT) AS c
      FROM s GROUP BY b, label
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n FROM joint
    ), marg_b AS (
      SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM joint GROUP BY b
    ), marg_l AS (
      SELECT label, CAST(SUM(c) AS BIGINT) AS cl FROM joint GROUP BY label
    ), terms AS (
      SELECT CAST(round(
               (CAST(j.c AS DOUBLE) / t.n)
               * ln(CAST(j.c AS DOUBLE) * t.n
                    / (CAST(mb.cb AS DOUBLE) * ml.cl)), 12)
             AS DECIMAL(28,12)) AS term
      FROM joint j
      JOIN marg_b mb ON mb.b = j.b
      JOIN marg_l ml ON ml.label = j.label
      CROSS JOIN tot t
    )
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n,
           round(CAST(SUM(term) AS DOUBLE), 9) AS mi_nats
    FROM terms
    """,
)
def q_feature_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between a continuous feature (value,
    decile-binned over a TOTAL order) and the event-type label — the
    feature-selection score for tabular ML. Every probability is a
    ratio of exact integers; each cell's p·ln(p/(p_b·p_l)) term is
    computed from identical doubles in both engines, rounded to 12
    decimals, then DECIMAL-summed — the q_copurchase_pagerank recipe
    for making transcendental sums partition-order-proof. The NTILE
    total order (value, event_id) makes binning engine-deterministic
    under ties."""
    s = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("label"),
            F.ntile(10)
            .over(Window.orderBy("value", "event_id"))
            .alias("b"),
        )
    )
    joint = s.groupBy("b", "label").agg(F.count(F.lit(1)).alias("c"))
    from babylon_data_loader_spark.functions.cache import persist_tracked

    joint = persist_tracked(joint)
    tot = joint.agg(F.sum("c").alias("n"))
    marg_b = joint.groupBy("b").agg(F.sum("c").alias("cb"))
    marg_l = joint.groupBy("label").agg(F.sum("c").alias("cl"))
    terms = (
        joint.join(F.broadcast(marg_b), "b")
        .join(F.broadcast(marg_l), "label")
        .join(F.broadcast(tot))
        .select(
            F.round(
                (F.col("c").cast("double") / F.col("n"))
                * F.log(
                    F.col("c").cast("double")
                    * F.col("n")
                    / (F.col("cb").cast("double") * F.col("cl"))
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("term"),
            "n",
        )
    )
    return terms.groupBy("n").agg(
        F.round(F.sum("term").cast("double"), 9).alias("mi_nats")
    ).select(F.col("n").cast("long").alias("n"), "mi_nats")


@query(
    "q_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS i
      FROM spend
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx,
             SUM(CAST(i AS DECIMAL(18,0)) * x) AS six
      FROM ranked
    )
    SELECT n,
           round(CAST(sx AS DOUBLE), 2) AS total_spend,
           round(2.0 * CAST(six AS DOUBLE)
                 / (n * CAST(sx AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1) / n, 9) AS gini
    FROM m
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration — the
    inequality score behind 'top 1% of customers drive X% of
    revenue'. Computed from the sorted-rank identity
    G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n with per-customer spend summed in
    DECIMAL, ranks from a TOTAL order (spend, custkey), and the
    rank-weighted sum Σi·xᵢ kept in exact DECIMAL — two exact decimal
    aggregates, float only in the final expression. The global sort
    is the documented exact-oracle tradeoff (at scale: bin to
    quantile buckets and compute the Lorenz curve piecewise)."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("x")
        )
    )
    ranked = spend.select(
        "x",
        F.row_number()
        .over(Window.orderBy("x", "o_custkey"))
        .cast("decimal(18,0)")
        .alias("i"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(F.col("sx").cast("double"), 2).alias("total_spend"),
        F.round(
            F.lit(2.0) * F.col("six").cast("double")
            / (nd * F.col("sx").cast("double"))
            - (nd + 1) / nd,
            9,
        ).alias("gini"),
    )


# Sequence / behavioral analytics ----------------------------------------------


@query(
    "q_sequence_pattern",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), event_id) AS s
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN regexp_matches(s, 'v[^p]*vp')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matching,
           CAST(SUM(len(s)) AS BIGINT) AS total_events
    FROM seq
    """,
)
def q_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching (the MATCH_RECOGNIZE shape): users
    whose ordered event stream contains view → (no purchase) → view →
    purchase. Each user's timeline collapses to a one-char-per-event
    string via an ORDER-SENSITIVE aggregation — sort_array over
    (ts, event_id, char) structs makes collect-order deterministic
    regardless of partitioning (the classic Spark trap:
    collect_list alone has NO order guarantee) — then one regex per
    user does the sequence test JVM-side. One user_id shuffle; the
    pattern state machine costs O(events per user), not a join."""
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id",
        F.struct(
            event_ts_us(ev_raw).alias("ts_us"),
            F.col("event_id"),
            F.substring("event_type", 1, 1).alias("ch"),
        ).alias("e"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("e")), lambda x: x["ch"]
            ),
            "",
        ).alias("s")
    )
    return seq.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(F.col("s").rlike("v[^p]*vp"), 1).otherwise(0)
        ).alias("n_matching"),
        F.sum(F.length("s")).alias("total_events"),
    )


@query(
    "q_markov_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
               AS next_type
      FROM events
    ), pairs AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ), outdeg AS (
      SELECT from_type, CAST(SUM(c) AS BIGINT) AS total
      FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.c,
           round(CAST(p.c AS DOUBLE) / o.total, 9) AS p
    FROM pairs p JOIN outdeg o ON o.from_type = p.from_type
    ORDER BY p.from_type, p.to_type
    """,
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next event type | current) — the behavioral model behind
    next-action prediction and funnel leak analysis. LEAD pairs each
    event with its successor on ONE user_id shuffle; probabilities
    are ratios of exact integer counts. The |types|² matrix is
    metadata-sized output regardless of corpus scale."""
    ev_raw = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        event_ts_us(ev_raw), F.col("event_id")
    )
    ordered = ev_raw.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = ordered.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    pairs = persist_tracked(pairs)
    outdeg = pairs.groupBy("from_type").agg(F.sum("c").alias("total"))
    return (
        pairs.join(F.broadcast(outdeg), "from_type")
        .select(
            "from_type",
            "to_type",
            "c",
            F.round(
                F.col("c").cast("double") / F.col("total"), 9
            ).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "q_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(epoch_us(o_orderdate)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS freq,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT NTILE(4) OVER (ORDER BY last_us, o_custkey) AS r,
             NTILE(4) OVER (ORDER BY freq, o_custkey) AS f,
             NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m,
             monetary
      FROM rfm
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(CAST(SUM(monetary) AS DOUBLE), 2) AS segment_value
    FROM scored GROUP BY r, f, m ORDER BY r, f, m
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: each customer scored into recency / frequency /
    monetary quartiles (NTILE over TOTAL orders — (metric, custkey) —
    so quartile boundaries are engine-deterministic under ties), then
    the 4×4×4 segment census with DECIMAL-exact segment value. The
    classic CRM cube; per-customer aggregation is one shuffle, the
    three rankings share the tiny per-customer frame."""
    o = load_table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max(
            F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        ).alias("last_us"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
            "monetary"
        ),
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    rfm = persist_tracked(rfm)
    scored = rfm.select(
        F.ntile(4).over(Window.orderBy("last_us", "o_custkey")).alias("r"),
        F.ntile(4).over(Window.orderBy("freq", "o_custkey")).alias("f"),
        F.ntile(4)
        .over(Window.orderBy("monetary", "o_custkey"))
        .alias("m"),
        "monetary",
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("monetary").cast("double"), 2).alias(
                "segment_value"
            ),
        )
        .select(
            F.col("r").cast("long").alias("r"),
            F.col("f").cast("long").alias("f"),
            F.col("m").cast("long").alias("m"),
            "n_customers",
            "segment_value",
        )
        .orderBy("r", "f", "m")
    )


@query(
    "q_association_rules",
    oracle="""
    WITH ok_orders AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_partkey) BETWEEN 2 AND 10
    ), op AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN ok_orders USING (l_orderkey)
    ), n AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM op
    ), item AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY 1
    ), pair AS (
      SELECT a.l_partkey AS x, b.l_partkey AS y,
             CAST(COUNT(*) AS BIGINT) AS cxy
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    )
    SELECT p.x, p.y, p.cxy,
           round(CAST(p.cxy AS DOUBLE) / ix.c, 9) AS confidence,
           round(CAST(p.cxy AS DOUBLE) * n.n_orders
                 / (CAST(ix.c AS DOUBLE) * iy.c), 9) AS lift
    FROM pair p
    JOIN item ix ON ix.l_partkey = p.x
    JOIN item iy ON iy.l_partkey = p.y
    CROSS JOIN n
    ORDER BY lift DESC, x, y LIMIT 25
    """,
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over the capped co-purchase
    baskets: support (co-occurrence count ≥ 3), confidence
    P(y|x) and lift P(x,y)/(P(x)P(y)) — all ratios of exact integer
    counts, top-25 by lift with full tiebreak. The pair join is the
    same bounded basket self-join as the graph queries (≤10 items per
    basket ⇒ ≤45 pairs per order, never quadratic); item counts
    broadcast into the rule assembly."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    ok = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np").between(2, 10))
        .select("l_orderkey")
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    op2 = persist_tracked(op.join(ok, "l_orderkey"))
    n = op2.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    item = op2.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = op2.select("l_orderkey", F.col("l_partkey").alias("x"))
    b = op2.select("l_orderkey", F.col("l_partkey").alias("y"))
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("cxy"))
        .filter(F.col("cxy") >= 3)
    )
    ix = item.select(F.col("l_partkey").alias("x"), F.col("c").alias("cx"))
    iy = item.select(F.col("l_partkey").alias("y"), F.col("c").alias("cy"))
    return (
        pair.join(F.broadcast(ix), "x")
        .join(F.broadcast(iy), "y")
        .join(F.broadcast(n))
        .select(
            "x",
            "y",
            "cxy",
            F.round(F.col("cxy").cast("double") / F.col("cx"), 9).alias(
                "confidence"
            ),
            F.round(
                F.col("cxy").cast("double")
                * F.col("n_orders")
                / (F.col("cx").cast("double") * F.col("cy")),
                9,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "x", "y")
        .limit(25)
    )


# IR ranking / phrase search / growth ------------------------------------------


@query(
    "q_bm25_topk",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\s+')) AS token
      FROM documents
    ), doclen AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM doclen
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS f
      FROM toks WHERE token IN ('data', 'table', 'join')
      GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS d FROM tf GROUP BY token
    ), terms AS (
      SELECT tf.doc_id,
             CAST(round(
               ln((CAST(s.n_docs AS DOUBLE) - df.d + 0.5)
                  / (df.d + 0.5) + 1.0)
               * (tf.f * 2.2)
               / (tf.f + 1.2 * (0.25 + 0.75 * dl.dl
                                * s.n_docs / CAST(s.total_len AS DOUBLE))),
               9) AS DECIMAL(28,9)) AS score_term
      FROM tf
      JOIN df ON df.token = tf.token
      JOIN doclen dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id,
           round(CAST(SUM(score_term) AS DOUBLE), 6) AS bm25
    FROM terms GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC LIMIT 20
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-20 documents for the 3-term query — the scoring
    function behind every lexical search engine (k1=1.2, b=0.75).
    Exactness for a float formula: tf/df/doclen are exact integers, so
    each per-(doc,term) score is computed from identical doubles in
    both engines, rounded to 9 decimals, then DECIMAL-summed per doc —
    the partition-order-proof recipe. The term filter prunes the
    postings scan to the query terms (at rest: partition pruning of
    the inverted index, like q_boolean_search); doc-length and
    corpus stats are metadata-scale broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    terms_list = ["data", "table", "join"]
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
            "token"
        ),
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    toks = persist_tracked(toks)
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    tf = (
        toks.filter(F.col("token").isin(terms_list))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    tf = persist_tracked(tf)
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("d"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("d") + 0.5)
        / (F.col("d") + 0.5)
        + 1.0
    )
    norm = F.col("f") + 1.2 * (
        0.25
        + 0.75
        * F.col("dl")
        * F.col("n_docs")
        / F.col("total_len").cast("double")
    )
    term_score = F.round(idf * (F.col("f") * 2.2) / norm, 9).cast(
        "decimal(28,9)"
    )
    scored = (
        tf.join(F.broadcast(df_), "token")
        .join(doclen, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", term_score.alias("score_term"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("score_term").cast("double"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@query(
    "q_phrase_search",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), bigrams AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM bigrams WHERE w1 = 'data' AND w2 = 'table'
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("data table", adjacent tokens) — the
    positional-postings operation a bag-of-words index cannot answer:
    posexplode keeps each token's POSITION, and the phrase test is a
    self-join on (doc, pos+1). Expressed as an adjacent-pair zip
    (arrays_zip of the array with its own tail) so the plan is one
    projection + explode — no join at all; at rest the bigram becomes
    the posting key (phrase indexes store n-grams for exactly this
    reason)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower("text")), r"\s+")
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            )
        ).alias("bg"),
    )
    return (
        pairs.filter(
            (F.col("bg.0") == "data") & (F.col("bg.1") == "table")
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy("doc_id")
    )


@query(
    "q_cumulative_uniques",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(epoch_us(ts) // 86400000000) AS first_day
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT CAST(first_day AS BIGINT) AS day,
             CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY 1
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT)
             AS cumulative_users
    FROM daily ORDER BY day
    """,
)
def q_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users and the cumulative distinct-user curve — the
    growth chart. A naive running COUNT(DISTINCT) over an expanding
    window re-scans history per day; the first-seen reduction makes it
    exact and cheap: MIN(day) per user (one shuffle), daily counts,
    one running sum over O(days) rows. This reduction — distinct
    becomes first-occurrence — is the standard trick for cumulative
    uniqueness at any scale."""
    ev_raw = load_table(spark, sf_dir, "events")
    firsts = (
        ev_raw.select(
            "user_id",
            F.floor(event_ts_us(ev_raw) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
        )
        .groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
    )
    daily = firsts.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return daily.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    ).orderBy("day")


@query(
    "q_js_divergence",
    oracle=r"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\s+')) AS token
      FROM documents
    ), counts AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ), totals AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM counts GROUP BY 1
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
             ta.n AS na, tb.n AS nb,
             COALESCE(ca.token, cb.token) AS token
      FROM totals a
      JOIN totals b ON a.source < b.source
      JOIN totals ta ON ta.source = a.source
      JOIN totals tb ON tb.source = b.source
      CROSS JOIN (SELECT DISTINCT token FROM counts) t
      LEFT JOIN counts ca ON ca.source = a.source AND ca.token = t.token
      LEFT JOIN counts cb ON cb.source = b.source AND cb.token = t.token
      WHERE COALESCE(ca.c, 0) + COALESCE(cb.c, 0) > 0
    ), terms AS (
      SELECT src_a, src_b,
             CAST(round(
               0.5 * CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE)/na)
                 * ln((CAST(ca AS DOUBLE)/na)
                      / (0.5*(CAST(ca AS DOUBLE)/na
                              + CAST(cb AS DOUBLE)/nb)))
                 ELSE 0 END
               + 0.5 * CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE)/nb)
                 * ln((CAST(cb AS DOUBLE)/nb)
                      / (0.5*(CAST(ca AS DOUBLE)/na
                              + CAST(cb AS DOUBLE)/nb)))
                 ELSE 0 END, 12) AS DECIMAL(28,12)) AS term
      FROM pairs
    )
    SELECT src_a, src_b,
           round(CAST(SUM(term) AS DOUBLE), 9) AS jsd_nats
    FROM terms GROUP BY src_a, src_b ORDER BY src_a, src_b
    """,
)
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the sources' token
    distributions — the symmetric, always-finite drift measure for
    dataset mixing (KL blows up on unshared vocabulary; JSD's mixture
    midpoint never does). Probabilities are ratios of exact integer
    counts; each token's contribution is computed from identical
    doubles, rounded to 12 decimals, and DECIMAL-summed per source
    pair. The token-pair frame is built with a FULL join per source
    pair (a token absent on one side contributes only the other
    side's half-term), keyed joins only — no all-pairs anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias(
            "token"
        ),
    )
    counts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    counts = persist_tracked(counts)
    totals = counts.groupBy("source").agg(F.sum("c").alias("n"))
    srcs = totals.select(
        F.col("source").alias("src_a"), F.col("n").alias("na")
    ).join(
        F.broadcast(
            totals.select(
                F.col("source").alias("src_b"), F.col("n").alias("nb")
            )
        ),
        F.col("src_a") < F.col("src_b"),
    )
    ca = counts.select(
        F.col("source").alias("src_a"),
        F.col("token"),
        F.col("c").alias("ca"),
    )
    cb = counts.select(
        F.col("source").alias("src_b"),
        F.col("token"),
        F.col("c").alias("cb"),
    )
    # full outer on token within each pair: join each side to the
    # pair frame, then full-outer merge the two sides on (pair, token)
    left = srcs.join(ca, "src_a").select(
        "src_a", "src_b", "na", "nb", "token", "ca"
    )
    right = srcs.join(cb, "src_b").select(
        F.col("src_a").alias("src_a2"),
        F.col("src_b").alias("src_b2"),
        F.col("token").alias("token2"),
        "cb",
    )
    merged = left.join(
        right,
        (F.col("src_a") == F.col("src_a2"))
        & (F.col("src_b") == F.col("src_b2"))
        & (F.col("token") == F.col("token2")),
        "full",
    ).select(
        F.coalesce("src_a", "src_a2").alias("src_a"),
        F.coalesce("src_b", "src_b2").alias("src_b"),
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        "na",
        "nb",
    )
    # na/nb are NULL on right-only rows; rejoin the pair totals
    merged = merged.drop("na", "nb").join(
        F.broadcast(
            srcs.select("src_a", "src_b", "na", "nb")
        ),
        ["src_a", "src_b"],
    )
    pa = F.col("ca").cast("double") / F.col("na")
    pb = F.col("cb").cast("double") / F.col("nb")
    mid = 0.5 * (pa + pb)
    term = (
        F.round(
            0.5
            * F.when(F.col("ca") > 0, pa * F.log(pa / mid)).otherwise(0.0)
            + 0.5
            * F.when(F.col("cb") > 0, pb * F.log(pb / mid)).otherwise(0.0),
            12,
        )
    ).cast("decimal(28,12)")
    return (
        merged.select("src_a", "src_b", term.alias("term"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.sum("term").cast("double"), 9).alias("jsd_nats"))
        .orderBy("src_a", "src_b")
    )
