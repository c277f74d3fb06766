"""Analytical declared queries: joins, aggregation, windows, set ops,
rollups, sessionization, as-of joins — the capability categories the
reference lacks (SURVEY.md §2.7), expressed as stock Spark plans.

These are also the bench headliners (bench.py): TPC-H-shaped Q1/Q3/Q5
over lineitem/orders/customer/nation/region exercise scan+agg, the
3-way join+top-k, and the 6-table star join respectively.

Float discipline: every cross-row SUM goes through DECIMAL (exact in
both engines) and is cast back to DOUBLE; per-row products are cast to
a decimal with headroom digits before summing (the true values have ≤6
fractional digits, double error ~1e-10, so the cast rounds identically
in Spark and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.numerics import grid_sum
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


# TPC-H Q1 — pricing summary ---------------------------------------------------


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
                AS DOUBLE) / 1000000.0 AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(25,8))) * 100000000 AS HUGEINT)
                AS DOUBLE) / 100000000.0 AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(20,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary scan+aggregate. One scan, one shuffle over a
    low-cardinality key (≤6 groups) — partial aggregation does nearly
    all the work map-side; at 100 TB this is scan-bound, as it should
    be."""
    li = load_table(spark, sf_dir, "lineitem")
    dec2 = lambda c: F.col(c).cast("decimal(20,2)")  # noqa: E731
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,6)"
    )
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    ).cast("decimal(25,8)")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
            grid_sum(disc_price, 6).alias("sum_disc_price"),
            grid_sum(charge, 8).alias("sum_charge"),
            (F.sum(dec2("l_quantity")).cast("double") / n.cast("double")).alias(
                "avg_qty"
            ),
            (
                F.sum(dec2("l_extendedprice")).cast("double") / n.cast("double")
            ).alias("avg_price"),
            (F.sum(dec2("l_discount")).cast("double") / n.cast("double")).alias(
                "avg_disc"
            ),
            n.cast("bigint").alias("count_order"),
        )
    )


# TPC-H Q3 — shipping-priority top-k ---------------------------------------------


@query(
    "q_tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
                AS DOUBLE) / 1000000.0 AS revenue,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregate + deterministic top-k (revenue DESC with
    orderdate/orderkey tiebreaks). The customer side is filtered before
    the join so AQE can broadcast it; the top-k is a TakeOrdered, not a
    full sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2000-01-01 00:00:00").cast("timestamp_ntz")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,6)"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(grid_sum(revenue, 6).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc(),
            F.col("orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


# TPC-H Q5 — star join revenue by nation ------------------------------------------


@query(
    "q_tpch_q5",
    oracle="""
    SELECT n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(25,6))) * 1000000 AS HUGEINT)
                AS DOUBLE) / 1000000.0 AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table star join. Dimension sides (region, nation, supplier)
    are explicitly broadcast — at 100 TB only orders⋈lineitem shuffles,
    on the join key both sides already share."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(25,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(grid_sum(revenue, 6).alias("revenue"))
    )


# Window top-k per group -----------------------------------------------------------


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(row_number() OVER (
             PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rnk
    FROM customer
    QUALIFY rnk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window with deterministic tiebreak — top-3 customers by
    balance per market segment."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rnk")
    )


# Rollup -----------------------------------------------------------------------------


@query(
    "q_rollup",
    oracle="""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (status → priority → grand total)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
        )
    )


# Set operations ------------------------------------------------------------------------


@query(
    "q_set_ops",
    oracle="""
    SELECT 'both' AS op, n_key FROM (
      SELECT DISTINCT c_nationkey AS n_key FROM customer
      INTERSECT
      SELECT DISTINCT s_nationkey AS n_key FROM supplier)
    UNION ALL
    SELECT 'customer_only' AS op, n_key FROM (
      SELECT DISTINCT c_nationkey AS n_key FROM customer
      EXCEPT
      SELECT DISTINCT s_nationkey AS n_key FROM supplier)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over nation keys."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_key")
    ).distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_key")
    ).distinct()
    both = c.intersect(s).select(F.lit("both").alias("op"), "n_key")
    only = c.exceptAll(s).select(
        F.lit("customer_only").alias("op"), "n_key"
    )
    return both.unionByName(only)


# Running balance (cumulative window) ---------------------------------------------------


@query(
    "q_running_balance",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(20,2))) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS running_total
    FROM events
    """,
)
def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user total — the 'running balance' the reference
    only stores as a source column (datalake.go:242-255), computed
    properly. DECIMAL accumulator keeps the prefix sums exact. Both
    engines order by integer microseconds + event_id (identical total
    order)."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = event_ts_us(ev)
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(20,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


# Sessionization (batch analog of streaming session windows) -----------------------------


@query(
    "q_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  > {_SESSION_GAP_US}
                  OR lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, event_id, ts_us,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): the batch analog
    of Structured Streaming's session_window (streaming/windows.py).
    One shuffle on user_id serves both window passes and the final
    aggregate — Catalyst reuses the partitioning."""
    ev = load_table(spark, sf_dir, "events")
    ts_us = event_ts_us(ev)
    order = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    prev = F.lag(ts_us).over(order)
    is_new = F.when(
        prev.isNull() | ((ts_us - prev) > _SESSION_GAP_US), 1
    ).otherwise(0)
    cum = (
        Window.partitionBy("user_id")
        .orderBy(ts_us, F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            ts_us.alias("ts_us"),
            F.sum(is_new).over(cum).cast("bigint").alias("session_id"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
        )
    )


# As-of join ------------------------------------------------------------------------------


@query(
    "q_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id
      FROM events WHERE event_type IN ('click', 'purchase')
    ), joined AS (
      SELECT user_id, ts_us, event_id, kind,
             last_value(click_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts_us, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_id
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id, ts_us, last_click_id
    FROM joined WHERE kind = 1
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each purchase, the most recent click
    by the same user at-or-before its time. Implemented as the
    union+last-carry-forward pattern — ONE shuffle on user_id, no
    range-join explosion; this is the scalable form (DuckDB's native
    ASOF JOIN expresses the same semantics in the oracle's dialect,
    spelled via window functions here for deterministic tie handling).
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    ts_us = event_ts_us(ev)
    tagged = ev.select(
        "user_id",
        ts_us.alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_click_id", F.last("click_id", ignorenulls=True).over(w)
        )
        .filter(F.col("kind") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "ts_us",
            "last_click_id",
        )
    )


@query(
    "q_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(20,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join: orders and lineitem written
    bucketed by order key (sources/bucketed.py), then joined with NO
    Exchange on either join side — the query RAISES if the join plan
    contains one, making bucketing's core promise part of the
    correctness gate. At 100 TB this is the difference between
    shuffling the fact table per join and a per-bucket streaming
    merge."""
    import uuid as _uuid

    from babylon_data_loader_spark.sources.bucketed import (
        bucketed_join,
        write_bucketed,
    )

    tag = _uuid.uuid4().hex[:10]
    t_orders, t_lineitem = f"bj_orders_{tag}", f"bj_lineitem_{tag}"
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    # Disable auto-broadcast for the assertion: at harness scale the
    # orders side fits a broadcast (whose BroadcastExchange is not a
    # shuffle), but the bucketing contract being verified is the
    # 100 TB shape — SMJ over aligned buckets with no Exchange at all.
    saved_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(orders, t_orders, "o_orderkey", n_buckets=8)
        write_bucketed(lineitem, t_lineitem, "o_orderkey", n_buckets=8)
        joined = bucketed_join(spark, t_orders, t_lineitem, on="o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        if "Exchange" in plan:
            raise AssertionError(
                "bucketed join planned an Exchange — bucket "
                "metadata was not used"
            )
        out = joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_price"),
        )
        rows = out.collect()
        schema = out.schema
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", saved_thresh
        )
        for t in (t_orders, t_lineitem):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return spark.createDataFrame(rows, schema=schema)
