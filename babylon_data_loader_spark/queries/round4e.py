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
             CAST(n_custkey AS DOUBLE) / n_rows AS metric,
             n_custkey = n_rows AS passed FROM m
      UNION ALL
      SELECT 'uniqueness_orderkey',
             CAST(n_distinct_key AS DOUBLE) / n_rows,
             n_distinct_key = n_rows FROM m
      UNION ALL
      SELECT 'range_totalprice_nonneg',
             CAST(n_price_ok AS DOUBLE) / n_rows,
             n_price_ok = n_rows FROM m
      UNION ALL
      SELECT 'accepted_values_status',
             CAST(n_status_ok AS DOUBLE) / n_rows,
             n_status_ok = n_rows FROM m
      UNION ALL
      SELECT 'referential_custkey',
             CAST(1.0 AS DOUBLE)
               - CAST(o.n_orphans AS DOUBLE) / m.n_rows,
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
        # each metric is a count ratio: single unrounded IEEE division
        # (round(x, 9) on an integer ratio is the half-way build
        # hazard — the r6 token-budget failure class)
        return base.select(
            F.lit(name).alias("constraint_name"),
            metric.alias("metric"),
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
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.token = t.token
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against a vocabulary
    DERIVED from the corpus itself (top-100 tokens, deterministic
    count-then-token rank). The tokenizer-coverage check every
    training pipeline runs before committing to a vocab: Misra–Gries
    heavy hitters prune the vocabulary candidates WITHOUT a
    full-cardinality shuffle (operators/heavy_hitters.py — exact
    counts above the φ threshold), the top-100 is a TakeOrdered over
    the tiny candidate frame (per-partition top-k, no global window),
    and a BROADCAST left join marks OOV tokens. If φ pruned below 100
    candidates (a pathologically flat corpus) the exact distributed
    group-count top-k is the fallback, so the result is always the
    true top-100 by (count desc, token asc). Exact integer counts;
    the rate divides two identical integers in both engines."""
    from babylon_data_loader_spark.functions.cache import persist_tracked
    from babylon_data_loader_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token"),
    )
    cand = persist_tracked(
        heavy_hitters(toks.select("token"), "token", phi=1 / 4096)
    )
    if cand.count() < 100:
        cand = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        cand.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(100)
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
            (
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double")
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
    summation anywhere. The NTILE is the DISTRIBUTED two-pass global
    rank (operators/rank.py: range-repartition, per-partition row
    numbers, broadcast prefix offsets) — identical output to the SQL
    window, no single-partition sort."""
    from babylon_data_loader_spark.operators.rank import (
        with_global_ntile,
    )

    o = load_table(spark, sf_dir, "orders")
    binned = with_global_ntile(
        o.select("o_totalprice", "o_orderkey"),
        [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
        10,
        "bin",
    ).select("o_totalprice", "bin")
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
    digit for digit. Ranks come from the DISTRIBUTED value-rank
    operator (operators/rank.py): rank the DISTINCT values (a frame
    orders of magnitude smaller than the events), then join the
    doubled tie-averaged ranks back by value — two ordinary shuffles,
    no single-partition window, byte-identical ranks."""
    from babylon_data_loader_spark.operators.rank import value_ranks

    j = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("value").alias("x"),
            F.get_json_object("props", "$.k").cast("double").alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    vx = value_ranks(j.select("x"), ["x"]).select(
        "x", F.col("rnk2_avg").alias("rx2")
    )
    vy = value_ranks(j.select("y"), ["y"]).select(
        "y", F.col("rnk2_avg").alias("ry2")
    )
    ranked = j.join(vx, "x").join(vy, "y").select("rx2", "ry2")
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
             SUM(CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT)
                 * (next_us - ts_us)) AS weighted_c,
             CAST(SUM(next_us - ts_us) AS BIGINT) AS span_us
      FROM seg WHERE next_us IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(weighted_c AS DOUBLE)
             / (CAST(span_us AS DOUBLE) * 100.0) AS twap,
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
    EXACT integers (cents × micros) summed as DECIMAL, so the one
    float division at the end is engine-identical. One
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
    # EXACT integer weights: cents x micros per segment (a double
    # product cast to DECIMAL diverges across engines — Spark casts
    # double->decimal via the shortest decimal repr, DuckDB via the
    # exact binary value, and at 1e11-scale products the 6th decimal
    # is below one ulp)
    cents = (F.col("value").cast("decimal(20,2)") * 100).cast("long")
    agg = seg.groupBy("user_id").agg(
        F.sum((cents * dur).cast("decimal(38,0)")).alias("weighted_c"),
        F.sum(dur).cast("long").alias("span_us"),
    )
    return (
        agg.filter(F.col("span_us") > 0)
        .select(
            "user_id",
            (
                F.col("weighted_c").cast("double")
                / (
                    F.col("span_us").cast("double") * F.lit(100.0)
                )
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
           CAST(m.max_key_n AS DOUBLE) / m.n_rows AS top1_share,
           CAST(m.sum_sq AS DOUBLE)
             / (CAST(m.n_rows AS DOUBLE) * m.n_rows) AS hhi
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
        (
            F.col("max_key_n").cast("double") / F.col("n_rows")
        ).alias("top1_share"),
        (
            F.col("sum_sq").cast("double")
            / (F.col("n_rows").cast("double") * F.col("n_rows"))
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
           CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
                AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0)
             AS slope,
           CAST(CAST((sy * sxx - sx * sxy) * 1000000 AS HUGEINT)
                AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE) * 1000000.0)
             AS intercept
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
    # determinants with fractional scale are multiplied to EXACT
    # integers before the double conversion (scale-6 decimal->double
    # double-rounds differently across engines); the scale-0 den
    # converts in one rounding in both.
    den6 = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double") * F.lit(1000000.0)
    slope_num6 = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * 1000000
    ).cast("decimal(38,0)").cast("double")
    icpt_num6 = (
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        * 1000000
    ).cast("decimal(38,0)").cast("double")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (slope_num6 / den6).alias("slope"),
        (icpt_num6 / den6).alias("intercept"),
    ).orderBy("event_type")
