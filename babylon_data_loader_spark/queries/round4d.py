"""Round-4 wave 4: ordered-funnel conversion and retention cohorts —
the two classic event-analytics shapes the suite did not yet cover
(sessionization and attribution joins are neighbors, but neither is
an ORDERED multi-step progression nor a cohort × offset matrix).

Time discipline: all comparisons in epoch-microsecond BIGINTs via
`schemas.event_ts_us` (both testdata `ts` encodings), day ids by
integer division — no calendar functions, so both engines agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table

_DAY_US = 86_400_000_000


# Ordered funnel ---------------------------------------------------------------


@query(
    "q_event_funnel",
    oracle=f"""
    WITH pv AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS v_us
      FROM events GROUP BY user_id
    ), pc AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS c_us
      FROM events e JOIN pv ON pv.user_id = e.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > pv.v_us
        AND epoch_us(e.ts) <= pv.v_us + {_DAY_US}
      GROUP BY e.user_id
    ), pp AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN pc ON pc.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > pc.c_us
        AND epoch_us(e.ts) <= pc.c_us + {_DAY_US}
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(v_us) AS BIGINT) FROM pv) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pc) AS n_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM pp) AS n_purchase
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion, each step within 24 h of
    the previous step's FIRST occurrence — the ordered-progression
    semantics a flat type-count can't express (a purchase before the
    click does not count). Three aggregates keyed by user_id; after
    the first shuffle the two step joins co-partition on the same key,
    and the step frames shrink monotonically (150 → 60 → 25 on the
    test corpus), so at scale each successive stage is cheaper, not
    wider."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", event_ts_us(ev))
    pv = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts_us"))
        ).alias("v_us")
    )
    pc = (
        ev.filter(F.col("event_type") == "click")
        .join(pv, on="user_id")
        .filter(
            (F.col("ts_us") > F.col("v_us"))
            & (F.col("ts_us") <= F.col("v_us") + F.lit(_DAY_US))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("c_us"))
    )
    pp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(pc, on="user_id")
        .filter(
            (F.col("ts_us") > F.col("c_us"))
            & (F.col("ts_us") <= F.col("c_us") + F.lit(_DAY_US))
        )
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("p_us"))
    )
    n_view = pv.filter(F.col("v_us").isNotNull()).count()
    n_click = pc.count()
    n_purchase = pp.count()
    return spark.createDataFrame(
        [(n_view, n_click, n_purchase)],
        "n_view BIGINT, n_click BIGINT, n_purchase BIGINT",
    )


# Retention cohorts ------------------------------------------------------------


@query(
    "q_retention_cohorts",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             MIN(epoch_us(ts) // {_DAY_US}) AS d0
      FROM events GROUP BY user_id
    ), base AS (SELECT MIN(d0) AS b FROM firsts)
    SELECT CAST(f.d0 - (SELECT b FROM base) AS BIGINT) AS cohort_day,
           CAST((epoch_us(e.ts) // {_DAY_US}) - f.d0 AS BIGINT)
             AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention matrix: users grouped by first-seen day (cohort),
    counted distinct on each subsequent day offset — the standard
    activation/retention readout. Day ids are integer division of
    epoch micros (no calendar/timezone functions to disagree on).
    Two shuffles: first-seen per user, then the (cohort, offset)
    rollup; the firsts frame joins back broadcast-eligibly since it
    is one row per user."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts_us", event_ts_us(ev)).withColumn(
        "day", (F.col("ts_us") / F.lit(_DAY_US)).cast("bigint")
    )
    # integer floor-div: ts_us >= 0 in this data, so cast-trunc == floor
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    base = firsts.agg(F.min("d0").alias("b"))
    return (
        ev.join(firsts, on="user_id")
        .crossJoin(F.broadcast(base))
        .groupBy(
            (F.col("d0") - F.col("b")).alias("cohort_day"),
            (F.col("day") - F.col("d0")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "day_offset")
    )


# Co-purchase PageRank ---------------------------------------------------------


@query(
    "q_copurchase_pagerank",
    oracle="""
    WITH ok_orders AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING COUNT(DISTINCT l_partkey) BETWEEN 2 AND 10
    ), op AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN ok_orders USING (l_orderkey)
    ), uedges AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
       AND a.l_partkey <> b.l_partkey
    ),
    nodes AS (SELECT DISTINCT src AS node FROM uedges),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
            FROM uedges GROUP BY src),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, round(1.0/(SELECT n FROM n), 12) AS r
           FROM nodes),
    r1 AS (
      SELECT e.dst AS node,
             round(0.15/(SELECT n FROM n)
                   + 0.85*CAST(SUM(CAST(round(r0.r/deg.d, 12)
                       AS DECIMAL(38,12))) AS DOUBLE), 12) AS r
      FROM uedges e JOIN r0 ON r0.node = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT e.dst AS node,
             round(0.15/(SELECT n FROM n)
                   + 0.85*CAST(SUM(CAST(round(r1.r/deg.d, 12)
                       AS DECIMAL(38,12))) AS DOUBLE), 12) AS r
      FROM uedges e JOIN r1 ON r1.node = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    )
    SELECT node AS part, r AS rank FROM r2
    ORDER BY r DESC, node ASC LIMIT 10
    """,
)
def q_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-importance ranking by PageRank over the co-purchase
    graph (parts sharing an order, orders capped at 10 distinct parts
    so a degenerate basket cannot go quadratic — mirrored in the
    oracle). Two power iterations unrolled exactly in the SQL twin;
    the operator's per-edge round + DECIMAL-sum discipline
    (operators/graph.py::pagerank) is what makes an ITERATIVE float
    algorithm hash-comparable across engines. Every node has
    out-degree ≥ 1 (the edge set is symmetric), so no dangling mass."""
    from babylon_data_loader_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    ok = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np").between(2, 10))
        .select("l_orderkey")
    )
    opk = op.join(ok, on="l_orderkey")
    edges = (
        opk.alias("a")
        .join(opk.alias("b"), on="l_orderkey")
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    ranks = pagerank(edges, n_iters=2, damping=0.85)
    return (
        ranks.select(F.col("node").alias("part"), F.col("r").alias("rank"))
        .orderBy(F.col("rank").desc(), F.col("part").asc())
        .limit(10)
    )


# Time-spine gap filling -------------------------------------------------------

_HOUR_US = 3_600_000_000


@query(
    "q_gap_fill",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(epoch_us(ts) // {_HOUR_US}) AS h0,
             MAX(epoch_us(ts) // {_HOUR_US}) AS h1
      FROM events WHERE ts IS NOT NULL
    ), spine AS (
      SELECT unnest(generate_series(h0, h1)) AS hour FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
      WHERE event_type IS NOT NULL
    ), grid AS (
      SELECT s.hour, t.event_type FROM spine s CROSS JOIN types t
    ), actual AS (
      SELECT epoch_us(ts) // {_HOUR_US} AS hour, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT CAST(g.hour AS BIGINT) AS hour, g.event_type,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN actual a USING (hour, event_type)
    ORDER BY hour, event_type
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with explicit zeros — the
    resample step every time-series consumer (anomaly detection,
    forecasting) needs, because a missing hour and a zero hour are
    different facts. The spine is `sequence()` over the observed hour
    bounds exploded against the type dimension (both tiny — the grid
    is |hours|×|types|, metadata-scale next to the fact table), then
    one LEFT join against the hourly aggregate. At 100 TB the actuals
    aggregation dominates and is one map-side-combined shuffle."""
    ev = load_table(spark, sf_dir, "events")
    ev = (
        ev.withColumn("ts_us", event_ts_us(ev))
        .filter(
            F.col("ts_us").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .withColumn(
            "hour", (F.col("ts_us") / F.lit(_HOUR_US)).cast("bigint")
        )
    )
    bounds = ev.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(types)
    actual = ev.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("a_n")
    )
    return (
        grid.join(actual, on=["hour", "event_type"], how="left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("a_n"), F.lit(0))
            .cast("bigint")
            .alias("n"),
        )
        .orderBy("hour", "event_type")
    )


# Sliding (overlapping) windows in batch ---------------------------------------


@query(
    "q_sliding_window",
    oracle=f"""
    WITH e AS (
      SELECT event_type, epoch_us(ts) // {_HOUR_US} AS h FROM events
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
    ), w AS (
      SELECT event_type, unnest([h - 1, h]) AS w_start FROM e
    )
    SELECT event_type, CAST(w_start AS BIGINT) AS w_start,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM w GROUP BY event_type, w_start
    ORDER BY event_type, w_start
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour, batch form: each event
    explodes into the two windows containing it (the same
    row-multiplication Structured Streaming's sliding `F.window`
    performs), then one count per (type, window-start). Overlap factor
    = window/slide = 2, so the exploded frame is exactly 2× the
    input — bounded, predictable, and the aggregate's map-side combine
    eats most of it before the shuffle."""
    ev = load_table(spark, sf_dir, "events")
    ev = (
        ev.withColumn("ts_us", event_ts_us(ev))
        .filter(
            F.col("ts_us").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .withColumn(
            "h", (F.col("ts_us") / F.lit(_HOUR_US)).cast("bigint")
        )
    )
    return (
        ev.select(
            "event_type",
            F.explode(
                F.array(F.col("h") - 1, F.col("h"))
            ).alias("w_start"),
        )
        .groupBy("event_type", "w_start")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "w_start")
    )


# Time-series anomaly flags ----------------------------------------------------


@query(
    "q_anomaly_hours",
    oracle=f"""
    WITH bounds AS (
      SELECT MIN(epoch_us(ts) // {_HOUR_US}) AS h0,
             MAX(epoch_us(ts) // {_HOUR_US}) AS h1
      FROM events WHERE ts IS NOT NULL
    ), spine AS (
      SELECT unnest(generate_series(h0, h1)) AS hour FROM bounds
    ), types AS (
      SELECT DISTINCT event_type FROM events
      WHERE event_type IS NOT NULL
    ), grid AS (
      SELECT s.hour, t.event_type FROM spine s CROSS JOIN types t
    ), actual AS (
      SELECT epoch_us(ts) // {_HOUR_US} AS hour, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ), dense AS (
      SELECT g.hour, g.event_type, COALESCE(a.n, 0) AS n
      FROM grid g LEFT JOIN actual a USING (hour, event_type)
    ), stats AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(n) AS BIGINT) AS s1,
             CAST(SUM(n * n) AS BIGINT) AS s2
      FROM dense GROUP BY event_type
    )
    SELECT d.event_type, CAST(d.hour AS BIGINT) AS hour,
           CAST(d.n AS BIGINT) AS n
    FROM dense d JOIN stats t USING (event_type)
    WHERE CAST(CAST(d.n AS HUGEINT) * t.cnt - t.s1 AS DOUBLE)
          > 3 * sqrt(CAST(CAST(t.cnt AS HUGEINT) * t.s2
                          - CAST(t.s1 AS HUGEINT) * t.s1 AS DOUBLE))
    ORDER BY d.event_type, d.hour
    """,
)
def q_anomaly_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-sigma spike detection over the GAP-FILLED hourly series (the
    zero hours must be in the population or the mean is inflated and
    spikes hide — this is why q_gap_fill exists). The 3-sigma test is
    the exact-determinant form n*cnt - s1 > 3*sqrt(cnt*s2 - s1^2):
    both sides derive from exact integers through single
    correctly-rounded IEEE ops (no centered-variance cancellation, no
    round(x, 9) build hazard). Two shuffles beyond the dense-series
    build: the per-type moment aggregate (6 rows) broadcasts back
    over the series."""
    ev = load_table(spark, sf_dir, "events")
    ev = (
        ev.withColumn("ts_us", event_ts_us(ev))
        .filter(
            F.col("ts_us").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .withColumn(
            "hour", (F.col("ts_us") / F.lit(_HOUR_US)).cast("bigint")
        )
    )
    bounds = ev.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("a_n")
    )
    from babylon_data_loader_spark.functions.cache import persist_tracked

    dense = persist_tracked(
        spine.crossJoin(types)
        .join(actual, on=["hour", "event_type"], how="left")
        .select(
            "hour",
            "event_type",
            F.coalesce(F.col("a_n"), F.lit(0))
            .cast("bigint")
            .alias("n"),
        )
    )
    stats = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    lhs = (
        F.col("n").cast("decimal(38,0)") * F.col("cnt") - F.col("s1")
    ).cast("double")
    det = (
        F.col("cnt").cast("decimal(38,0)") * F.col("s2")
        - F.col("s1").cast("decimal(38,0)") * F.col("s1")
    ).cast("double")
    return (
        dense.join(F.broadcast(stats), on="event_type")
        .filter(lhs > F.lit(3) * F.sqrt(det))
        .select("event_type", "hour", "n")
        .orderBy("event_type", "hour")
    )
