"""Third-wave declared queries: statistical aggregates via exact
moments, scalar subqueries, array/string/date scalar functions,
median. Rounds out the scalar-function and subquery categories."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

# Statistical aggregates from exact decimal moments ----------------------------
# Plain stddev/variance are float-reduction-order dependent; computing
# from DECIMAL-exact Σx and Σx² makes them deterministic and
# oracle-matchable: var = (Σx² − (Σx)²/n) / (n−1), all in double from
# exact inputs.


@query(
    "q_variance_moments",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(30,2))) * 100
                  AS HUGEINT) AS sx2,
             CAST(SUM(CAST(value * value AS DECIMAL(30,4))) * 10000
                  AS HUGEINT) AS sxx4
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           n,
           CAST(sx2 AS DOUBLE)
             / (CAST(n AS DOUBLE) * 100.0) AS mean_value,
           CAST(n * sxx4 - sx2 * sx2 AS DOUBLE)
             / ((10000.0 * CAST(n AS DOUBLE))
                * (CAST(n AS DOUBLE) - 1)) AS var_value
    FROM m
    """,
)
def q_variance_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance per event type from exact moments (deterministic
    where stddev()'s float reduction is not)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(30,2)")) * 100)
        .cast("decimal(38,0)")
        .alias("sx2"),
        (
            F.sum(
                (F.col("value") * F.col("value")).cast("decimal(30,4)")
            )
            * 10000
        )
        .cast("decimal(38,0)")
        .alias("sxx4"),
    )
    # exact-determinant form: the centered sx2 - sx^2/n DOUBLE shape
    # cancels and its last-ulp noise differs across engines, and
    # round(x, 6) of the exact-rational quotient is the half-way
    # build hazard — so the numerator is EXACT integer decimal and
    # each output is correctly-rounded IEEE ops only. The e2/e4 grid
    # (value at cents, value^2 at 1e-4) — not e6/e12 — keeps
    # n*sxx - sx*sx inside 38 digits out to ~1e13 rows per group;
    # at e6 the sx*sx product crosses 1e38 near 1e12 rows.
    ndbl = F.col("n").cast("double")
    var_num = (
        F.col("n") * F.col("sxx4")
        - F.col("sx2") * F.col("sx2")
    ).cast("double")
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (
            F.col("sx2").cast("double") / (ndbl * F.lit(100.0))
        ).alias("mean_value"),
        (
            var_num
            / (
                (F.lit(10000.0) * ndbl) * (ndbl - F.lit(1))
            )
        ).alias("var_value"),
    )


@query(
    "q_correlation_moments",
    oracle="""
    WITH j AS (
      SELECT value AS x,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS y
      FROM events
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(30,2))) * 100
                  AS HUGEINT) AS sx2,
             CAST(SUM(CAST(y AS DECIMAL(30,2))) * 100
                  AS HUGEINT) AS sy2,
             CAST(SUM(CAST(x * x AS DECIMAL(30,4))) * 10000
                  AS HUGEINT) AS sxx4,
             CAST(SUM(CAST(y * y AS DECIMAL(30,4))) * 10000
                  AS HUGEINT) AS syy4,
             CAST(SUM(CAST(x * y AS DECIMAL(30,4))) * 10000
                  AS HUGEINT) AS sxy4
      FROM j
    )
    SELECT n,
           CAST(n * sxy4 - sx2 * sy2 AS DOUBLE)
             / ((10000.0 * CAST(n AS DOUBLE))
                * (CAST(n AS DOUBLE) - 1)) AS cov_xy,
           CAST(n * sxy4 - sx2 * sy2 AS DOUBLE)
             / (sqrt(CAST(n * sxx4 - sx2 * sx2 AS DOUBLE))
                * sqrt(CAST(n * syy4 - sy2 * sy2
                            AS DOUBLE))) AS corr_xy
    FROM m
    """,
)
def q_correlation_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance/correlation between event value and its JSON `k`
    prop, from exact decimal moments — deterministic where corr()'s
    float reduction is not."""
    ev = load_table(spark, sf_dir, "events")
    j = ev.select(
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("double").alias("y"),
    )
    # x1e6-scaled EXACT integer moments (scale-6 decimal -> double
    # double-rounds differently across engines), exact determinants,
    # then correctly-rounded IEEE ops only — no centered-form
    # cancellation, no round(x, 6) half-way build hazard
    # e2/e4 grid (see q_variance_moments): first moments at cents,
    # second moments at 1e-4 — determinants stay inside 38 digits out
    # to ~1e13 rows, where the former e6/e12 grid overflowed near 1e12
    dec2 = lambda c: (  # noqa: E731
        F.sum(c.cast("decimal(30,2)")) * 100
    ).cast("decimal(38,0)")
    dec4 = lambda c: (  # noqa: E731
        F.sum(c.cast("decimal(30,4)")) * 10000
    ).cast("decimal(38,0)")
    m = j.agg(
        F.count(F.lit(1)).alias("n"),
        dec2(F.col("x")).alias("sx2"),
        dec2(F.col("y")).alias("sy2"),
        dec4(F.col("x") * F.col("x")).alias("sxx4"),
        dec4(F.col("y") * F.col("y")).alias("syy4"),
        dec4(F.col("x") * F.col("y")).alias("sxy4"),
    )
    n = F.col("n")
    ndbl = n.cast("double")
    num = (
        n * F.col("sxy4") - F.col("sx2") * F.col("sy2")
    ).cast("double")
    dxx = (
        n * F.col("sxx4") - F.col("sx2") * F.col("sx2")
    ).cast("double")
    dyy = (
        n * F.col("syy4") - F.col("sy2") * F.col("sy2")
    ).cast("double")
    return m.select(
        n.cast("bigint").alias("n"),
        (
            num
            / ((F.lit(10000.0) * ndbl) * (ndbl - F.lit(1)))
        ).alias("cov_xy"),
        (num / (F.sqrt(dxx) * F.sqrt(dyy))).alias("corr_xy"),
    )


# Scalar subquery ---------------------------------------------------------------


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
      FROM orders) * 1.5
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders 50% above the average price — scalar subquery in a
    predicate (the average computes once and broadcasts)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_orders_w3")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _orders_w3
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE)
          FROM _orders_w3) * 1.5
        """
    )


# Array scalar functions -----------------------------------------------------------


@query(
    "q_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           round(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_val,
           round(list_sum(list_transform(embedding[1:4],
                 x -> CAST(x AS DOUBLE))), 6) AS head_sum
    FROM embeddings
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions: size, element_at (1-based / negative),
    slice + fold."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 4)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias(
            "first_val"
        ),
        F.round(F.element_at("embedding", -1).cast("double"), 6).alias(
            "last_val"
        ),
        F.round(
            F.aggregate(
                head, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("head_sum"),
    )


# String scalar functions ------------------------------------------------------------


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           substring(c_name, 10, 8) AS name_digits,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           replace(c_name, 'Customer#', 'C-') AS short_name,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR))
             AS seg_nation,
           CAST(length(c_name) AS INT) AS name_len
    FROM customer
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar surface: upper/substring/lpad/replace/concat_ws/
    length (P13/P15 family generalized)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 10, 8).alias("name_digits"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias(
            "padded_key"
        ),
        F.replace(
            F.col("c_name"), F.lit("Customer#"), F.lit("C-")
        ).alias("short_name"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.length("c_name").alias("name_len"),
    )


# Date/time scalar functions ------------------------------------------------------------


@query(
    "q_date_funcs",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing: date_trunc / year / quarter rollup (P16
    family + partition-key derivation for time-partitioned lakes)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# Median -----------------------------------------------------------------------------------


@query(
    "q_median",
    oracle="""
    SELECT event_type,
           round(median(CAST(value AS DOUBLE)), 6) AS median_value
    FROM events GROUP BY event_type
    """,
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (both engines interpolate the midpoint
    for even counts on DOUBLE input; the interpolation (a+b)/2 is a
    single deterministic float op)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median(F.col("value").cast("double")), 6).alias(
            "median_value"
        )
    )


# Sketches (HLL distinct, t-digest quantiles) ---------------------------------------


@query("q_sketch_distinct")  # rows-only: HLL register layout is
# engine-specific; the exact twin + relative error ride along so the
# driver's record witnesses the bound (r4 VERDICT stretch #8)
def q_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via HyperLogLog++
    (approx_count_distinct, rsd 2%). At 100 TB this is THE distinct
    operator: fixed-size registers merge map-side, no shuffle of raw
    ids — exact count-distinct expands rows by group and shuffles
    every id. The output carries the EXACT count side-by-side with
    the estimate plus the relative error, and the query ASSERTS the
    error stays under 3× rsd — the exact side is the verification
    harness the sketch replaces at scale, not part of the scale
    path."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias(
                "approx_users"
            ),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            F.round(
                F.abs(
                    F.col("approx_users").cast("double")
                    - F.col("exact_users")
                )
                / F.col("exact_users"),
                6,
            ).alias("rel_err"),
            F.lit(0.06).alias("err_bound"),
        )
        .orderBy("event_type")
    )
    worst = out.agg(F.max("rel_err")).first()[0]
    if worst is not None and worst > 0.06:
        raise AssertionError(
            f"HLL relative error {worst:.4f} exceeds 3x rsd bound 0.06"
        )
    return out


@query("q_sketch_quantiles")  # rows-only: quantile sketch register
# layout is engine-specific; the exact order-statistic twin + rank
# error ride along so the driver's record witnesses the bound
# in-query (the q_sketch_distinct pattern, r5 VERDICT ask #2)
def q_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type
    (percentile_approx, accuracy 10k). Mergeable sketch: map-side
    partials, O(accuracy) state per group — the scale path where exact
    percentiles would sort every group.

    Self-certifying: each row carries the EXACT per-type order
    statistic at rank ceil(p*n) (selection, no arithmetic — computed
    with the distributed grouped prefix scan, never a per-type
    single-task window), the sketch value's true rank interval
    [rank_lo, rank_hi], the value-space rel_err, and within_bound =
    "the returned value's rank interval intersects target ± n/accuracy
    (+1 slack)" — the Greenwald–Khanna guarantee percentile_approx
    documents. The query RAISES if any row violates the bound. The
    exact side is the verification harness the sketch replaces at
    scale, not part of the scale path."""
    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    ACCURACY = 10000
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    # p as exact rationals so target = ceil(p*n) is pure integer math
    ps = [(1, 2), (19, 20), (99, 100)]
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx(
            "value", [num / den for num, den in ps], ACCURACY
        ).alias("quantiles")
    )
    sk = agg.select(
        "event_type",
        F.posexplode("quantiles").alias("pos", "quantile"),
    ).select(
        "event_type",
        F.element_at(
            F.array(*[F.lit(num / den) for num, den in ps]),
            F.col("pos") + 1,
        ).alias("p"),
        F.element_at(
            F.array(*[F.lit(num) for num, _ in ps]), F.col("pos") + 1
        ).alias("__p_num"),
        F.element_at(
            F.array(*[F.lit(den) for _, den in ps]), F.col("pos") + 1
        ).alias("__p_den"),
        F.col("quantile"),
    )
    # per-type cumulative counts over DISTINCT values: the compact
    # rank carrier (|distinct| << |rows| at scale), cumulated with the
    # distributed grouped scan — event_type is low-cardinality, so a
    # plain partitionBy window would sort each type in one task.
    vals = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = grouped_running_totals(
        vals,
        ["event_type"],
        [F.col("value").asc()],
        {"cum_cnt": F.col("cnt")},
    ).withColumn("cum_cnt", F.col("cum_cnt").cast("long"))
    tot = cum.groupBy("event_type").agg(
        F.sum("cnt").alias("__n")
    )
    sk = sk.join(F.broadcast(tot), "event_type").withColumn(
        "__target",
        F.floor(
            (F.col("__p_num") * F.col("__n") + F.col("__p_den") - 1)
            / F.col("__p_den")
        ).cast("long"),
    )
    # one distributed pass: replicate each distinct-value row across
    # the (3 per type) broadcast sketch rows, then aggregate the rank
    # interval of the sketch value and the exact order statistic
    joined = cum.join(F.broadcast(sk), "event_type")
    out = (
        joined.groupBy(
            "event_type", "p", "quantile", "__n", "__target"
        )
        .agg(
            F.min(
                F.when(
                    F.col("cum_cnt") >= F.col("__target"),
                    F.col("value"),
                )
            ).alias("exact"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("value") < F.col("quantile"),
                        F.col("cum_cnt"),
                    )
                ),
                F.lit(0),
            ).alias("__cnt_lt"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("value") <= F.col("quantile"),
                        F.col("cum_cnt"),
                    )
                ),
                F.lit(0),
            ).alias("__cnt_le"),
        )
        .withColumn(
            "__bound",
            F.floor(F.col("__n") / F.lit(ACCURACY)).cast("long")
            + F.lit(1),
        )
        .select(
            "event_type",
            "p",
            F.round(F.col("quantile"), 9).alias("quantile"),
            F.round(F.col("exact"), 9).alias("exact"),
            F.round(
                F.abs(F.col("quantile") - F.col("exact"))
                / F.greatest(F.abs(F.col("exact")), F.lit(1e-12)),
                9,
            ).alias("rel_err"),
            (F.col("__cnt_lt") + 1).alias("rank_lo"),
            F.col("__cnt_le").alias("rank_hi"),
            F.col("__target").alias("target_rank"),
            (
                (
                    F.col("__cnt_le")
                    >= F.col("__target") - F.col("__bound")
                )
                & (
                    F.col("__cnt_lt") + 1
                    <= F.col("__target") + F.col("__bound")
                )
            ).alias("within_bound"),
        )
        .orderBy("event_type", "p")
    )
    bad = out.where(~F.col("within_bound")).count()
    if bad:
        raise AssertionError(
            f"percentile_approx rank error exceeds the n/{ACCURACY} "
            f"GK bound on {bad} (event_type, p) row(s)"
        )
    return out


# --- q_kmv_distinct: the ORACLE-CHECKABLE distinct sketch ------------------
# q_sketch_distinct (above) exercises Spark's native HLL++, whose
# register layout is engine-specific — it stays rows-only with its
# exact twin + error raise. This lane is the same capability built
# from a sketch whose every decision an independent engine CAN
# recompute: KMV / bottom-k (Bar-Yossef et al. 2002, the Theta-sketch
# core): keep the k smallest md5-derived hash values per group;
# if fewer than k distinct hashes exist the sketch IS the exact
# answer, else estimate (k-1)·M/R from the k-th minimum R over hash
# space M. Selection + one double divide of exact integers — no
# registers, no float accumulation, bit-identical everywhere.

_KMV_K = 64
_KMV_M = 1 << 60  # 15 hex chars of the md5 = 60-bit hash space


@query(
    "q_kmv_distinct",
    oracle=f"""
    WITH hv AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT AS h
      FROM events
    ), ranked AS (
      SELECT event_type, h,
             row_number() OVER (
               PARTITION BY event_type ORDER BY h ASC) AS rn
      FROM hv
    ), nd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM hv GROUP BY event_type
    ), sk AS (
      SELECT event_type,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth
      FROM ranked WHERE rn <= {_KMV_K}
      GROUP BY event_type
    )
    SELECT n.event_type, n.n_exact,
           COALESCE(s.kth, CAST(0 AS BIGINT)) AS kth_hash,
           CASE WHEN n.n_exact < {_KMV_K}
                THEN CAST(n.n_exact AS DOUBLE)
                ELSE round({_KMV_K - 1} * CAST({_KMV_M} AS DOUBLE)
                           / CAST(s.kth AS DOUBLE), 6) END
             AS est_distinct,
           round(ABS(CASE WHEN n.n_exact < {_KMV_K}
                          THEN CAST(n.n_exact AS DOUBLE)
                          ELSE {_KMV_K - 1} * CAST({_KMV_M} AS DOUBLE)
                               / CAST(s.kth AS DOUBLE) END
                     - n.n_exact) / n.n_exact, 6) AS rel_err,
           CAST(0.4 AS DOUBLE) AS err_bound
    FROM nd n LEFT JOIN sk s ON s.event_type = n.event_type
    ORDER BY n.event_type
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per event type via a KMV
    (k-minimum-values / bottom-k) sketch, k=64 over the 60-bit
    md5-derived hash space — the oracle-checkable complement to
    q_sketch_distinct's native HLL++: every retained hash, the k-th
    minimum, and the (k−1)·M/R estimate are integer selection plus
    ONE double divide of exact integers, so a DuckDB oracle
    recomputes the whole sketch bit-for-bit. Groups with fewer than k
    distinct users return the exact count (the sketch holds
    everything). rel_err rides along and the query RAISES past the
    3σ ≈ 0.4 bound (σ ≈ 1/√(k−2)).

    Scale shape: the bottom-k per group is a rank-LIMITED window —
    Spark inserts WindowGroupLimit, so each partition pre-prunes to
    its local k smallest before the shuffle: the sketch property
    (fixed-size mergeable state, never a full sort of the group)
    holds in the physical plan, plan-asserted in tests. At 100 TB the
    distinct-hash projection is the only wide stage and carries
    (event_type, 8-byte hash) rows."""
    ev = load_table(spark, sf_dir, "events")
    hv = (
        ev.select(
            "event_type",
            F.conv(
                F.substring(
                    F.md5(F.col("user_id").cast("string")), 1, 15
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.col("h").asc())
    ranked = hv.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _KMV_K
    )
    nd = hv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    sk = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == _KMV_K, F.col("h"))
        ).alias("kth")
    )
    raw_est = (
        F.lit(float(_KMV_K - 1))
        * F.lit(float(_KMV_M))
        / F.col("kth").cast("double")
    )
    out = (
        nd.join(F.broadcast(sk), "event_type", "left")
        .select(
            "event_type",
            "n_exact",
            F.coalesce(F.col("kth"), F.lit(0).cast("long")).alias(
                "kth_hash"
            ),
            F.when(
                F.col("n_exact") < _KMV_K,
                F.col("n_exact").cast("double"),
            )
            .otherwise(F.round(raw_est, 6))
            .alias("est_distinct"),
            F.round(
                F.abs(
                    F.when(
                        F.col("n_exact") < _KMV_K,
                        F.col("n_exact").cast("double"),
                    ).otherwise(raw_est)
                    - F.col("n_exact")
                )
                / F.col("n_exact"),
                6,
            ).alias("rel_err"),
            F.lit(0.4).alias("err_bound"),
        )
        .orderBy("event_type")
    )
    worst = out.agg(F.max("rel_err")).first()[0]
    if worst is not None and worst > 0.4:
        raise AssertionError(
            f"KMV relative error {worst:.4f} exceeds the 3-sigma "
            "bound 0.4"
        )
    return out


@query(
    "q_robust_zscore",
    oracle="""
    WITH stats AS (
      SELECT user_id, median(value) AS med, mad(value) AS mad
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id,
           round(CASE WHEN s.mad > 0 THEN (e.value - s.med) / s.mad
                      ELSE 0.0 END, 9) AS z
    FROM events e JOIN stats s USING (user_id)
    """,
)
def q_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust z-score via grouped-map applyInPandas
    (functions/udfs.py::robust_zscore). Median and MAD are order
    statistics — selections, not sums — so the pandas path and the
    DuckDB oracle agree bit-for-bit: a FULLY oracle-checked pandas
    UDF."""
    from babylon_data_loader_spark.functions.udfs import robust_zscore

    ev = load_table(spark, sf_dir, "events")
    return robust_zscore(ev, key_col="user_id", value_col="value")


@query(
    "q_udtf_ngrams",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    )
    SELECT doc_id, CAST(j - 1 AS INT) AS pos, t[j] || ' ' || t[j+1] AS gram
    FROM tok, unnest(generate_series(1, len(t) - 1)) AS u(j)
    WHERE len(t) >= 2
    """,
)
def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF through SQL LATERAL: one document row in, one row
    per bigram out (functions/udfs.py::NGrams). The UDTF's output is
    deterministic string manipulation, so even this Python
    table-function path carries a full DuckDB oracle."""
    from babylon_data_loader_spark.functions.udfs import NGrams

    spark.udtf.register("ngrams", NGrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_v"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.gram
        FROM documents_v d, LATERAL ngrams(d.text, 2) t
        """
    )


@query(
    "q_hash_split",
    oracle="""
    WITH tagged AS (
      SELECT source,
             CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < 'cc' THEN 'train'
                  WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < 'e6' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n
    FROM tagged GROUP BY source, split
    """,
)
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by md5-prefix threshold
    (~80/10/10): the same document lands in the same split on every
    run, every partitioning, and every engine — which `sampleBy`
    cannot promise (its row-level RNG depends on partition layout).
    This is how training pipelines get STABLE splits; the salt string
    versions the split so a corpus can be re-split deliberately."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2
    )
    split = (
        F.when(prefix < "cc", "train")
        .when(prefix < "e6", "val")
        .otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
