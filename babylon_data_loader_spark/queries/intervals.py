"""Interval / range joins — point-in-interval semantics.

Two physical regimes, both declared:
- equi + range (`q_interval_join`): the interval table shares an equi
  key with the probe side, so the range predicate rides a plain hash
  join — shuffle on the key, range filter applied post-match. This is
  the scale-safe shape: always hunt for an equi key before accepting a
  pure range join.
- pure range vs a SMALL interval table (`q_range_band_join`): no equi
  key exists, so the plan is a BroadcastNestedLoopJoin — correct ONLY
  because the band table is tiny and broadcast; at 100 TB a
  range-only join against a LARGE interval table must instead be
  bucketed (floor ts to interval-width buckets, equi-join on bucket,
  then range-filter), which turns it back into regime one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.numerics import grid_sum
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table


@query(
    "q_interval_join",
    oracle="""
    WITH iv AS (
      SELECT user_id, MIN(epoch_us(ts)) AS start_us,
             MIN(epoch_us(ts)) + 1800000000 AS end_us
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_in_window
    FROM events e JOIN iv ON e.user_id = iv.user_id
    WHERE epoch_us(e.ts) BETWEEN iv.start_us AND iv.end_us
    GROUP BY e.user_id
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events falling in each user's first-30-minutes window: the
    range predicate shares the user_id equi key, so this is one hash
    join + post-filter — no nested-loop anywhere (the range join trap
    avoided)."""
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select("user_id", event_ts_us(raw).alias("ts_us"))
    iv = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("start_us"),
        (F.min("ts_us") + F.lit(1_800_000_000)).alias("end_us"),
    )
    return (
        ev.join(iv, on="user_id")
        .filter(F.col("ts_us").between(F.col("start_us"), F.col("end_us")))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_in_window"))
    )


@query(
    "q_range_band_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 100.0), ('mid', 100.0, 500.0),
             ('high', 500.0, 1e18)
    )
    SELECT b.band, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(25,6))) * 1000000
                     AS HUGEINT) AS DOUBLE) / 1000000.0
             AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-band classification as a range join against a 3-row
    broadcast band table — the one place a BroadcastNestedLoopJoin is
    the RIGHT plan (build side is O(1)); the aggregate still combines
    map-side."""
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 500.0), ("high", 500.0, 1e18)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            grid_sum(
                F.col("value").cast("decimal(25,6)"), 6
            ).alias("total_value"),
        )
    )


@query(
    "q_attribution_join",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS purchase_us
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.click_id, p.purchase_id
    FROM c JOIN p ON c.user_id = p.user_id
     AND p.purchase_us >= c.click_us
     AND p.purchase_us <= c.click_us + 1800000000
    """,
)
def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution: every (click, purchase) pair of the same user with
    the purchase inside the click's 30-minute window — the BATCH twin
    of the watermarked stream-stream join (streaming/joins.py::
    attribute_purchases); identical join condition, so the oracle here
    verifies the streaming operator's semantics. Times compared in
    integer microseconds for cross-engine exactness."""
    from babylon_data_loader_spark.schemas import events_with_time
    from babylon_data_loader_spark.streaming.joins import (
        attribute_purchases,
    )

    ev = events_with_time(load_table(spark, sf_dir, "events"))
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = attribute_purchases(clicks, purchases, within="30 minutes")
    return out.select("user_id", "click_id", "purchase_id")


@query(
    "q_windowed_dedup",
    oracle="""
    WITH w AS (
      SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
             CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS win
      FROM events
    )
    SELECT user_id, event_type, win, event_id, ts_us
    FROM w
    QUALIFY row_number() OVER (
      PARTITION BY user_id, event_type, win
      ORDER BY ts_us ASC, event_id ASC) = 1
    """,
)
def q_windowed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) within each 1-hour window — the
    batch twin of streaming dropDuplicatesWithinWatermark: the window
    bound is what lets streaming state expire, and the same bound here
    keeps the dedup key space finite per partition. One shuffle on the
    composite key; micro-truncated times for cross-engine order."""
    raw = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    # INTEGER div for the window id in BOTH the partition key and the
    # output — float division truncated at a window boundary could
    # disagree with `div` by one in the last ulp.
    ev = raw.withColumn("ts_us", event_ts_us(raw))
    ts_us = F.col("ts_us")
    win = F.expr("ts_us div 3600000000")
    w = Window.partitionBy("user_id", "event_type", win).orderBy(
        ts_us.asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("win", win)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            "win",
            "event_id",
            ts_us.alias("ts_us"),
        )
    )


@query(
    "q_window_breadth",
    oracle="""
    SELECT user_id, event_id,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           CAST(SUM(CAST(CAST(value AS DECIMAL(20,2)) * 100 AS BIGINT))
                  OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(100 * COUNT(value) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling_avg,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def q_window_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining window-function families in one deterministic
    shape: ntile, percent_rank, a bounded ROWS frame (rolling 4-row
    average — the frame order pins the float summation order in both
    engines), first_value, and last_value over the full-partition
    frame (the default running frame would make last_value = current
    row). One shuffle on user_id serves every function."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ts_us = event_ts_us(ev)
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    w_roll = w.rowsBetween(-3, Window.currentRow)
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # pr is the structural integer ratio (rank-1)/(n-1) and the
    # rolling average is money/count — both emitted as SINGLE
    # unrounded IEEE divisions of exact integers (cents for the sum);
    # round(x, 9) on either is the half-way-case build hazard.
    cents = (F.col("value").cast("decimal(20,2)") * 100).cast("bigint")
    roll_avg = F.sum(cents).over(w_roll).cast("double") / (
        F.lit(100) * F.count(F.col("value")).over(w_roll)
    ).cast("double")
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        roll_avg.alias("rolling_avg"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(w_full).alias("last_event"),
    )


@query(
    "q_asof_tolerance",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us
      FROM events WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, event_id AS p_id, epoch_us(ts) AS p_us
      FROM events WHERE event_type = 'purchase'
    ), ranked AS (
      SELECT c.user_id, c.event_id, c.ts_us, p.p_id, p.p_us,
             row_number() OVER (
               PARTITION BY c.user_id, c.event_id
               ORDER BY p.p_us DESC, p.p_id DESC) AS rn
      FROM c JOIN p ON p.user_id = c.user_id
                   AND p.p_us <= c.ts_us
                   AND p.p_us >= c.ts_us - 3600000000
    )
    SELECT user_id, event_id, p_id AS last_purchase_id,
           ts_us - p_us AS staleness_us
    FROM ranked WHERE rn = 1
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE: each click matched to the user's
    most recent purchase, but only if it happened within the last
    hour — stale state beyond the tolerance yields no row (the kdb/
    QuestDB `ASOF ... TOLERANCE` semantics). The tolerance bound is
    what makes this state-boundable in a streaming setting; here it
    also bounds the join fan-in. Deterministic tiebreak on purchase
    id."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    ts_us = event_ts_us(ev)
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", ts_us.alias("ts_us")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        ts_us.alias("p_us"),
    )
    joined = c.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_us") <= F.col("ts_us"))
        & (F.col("p_us") >= F.col("ts_us") - F.lit(3_600_000_000)),
    )
    w = Window.partitionBy("user_id", "event_id").orderBy(
        F.col("p_us").desc(), F.col("p_id").desc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.col("p_id").alias("last_purchase_id"),
            (F.col("ts_us") - F.col("p_us")).alias("staleness_us"),
        )
    )


@query(
    "q_histogram",
    oracle="""
    WITH b AS (
      SELECT event_type,
             least(CAST(value * 100 AS BIGINT) // 1000, 9) AS bucket
      FROM events
    )
    SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY event_type, bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (10 buckets of width 10 over
    [0,100), top bucket clamped). Bucket ids use INTEGER-exact
    arithmetic — value has 2 decimals, so value*100 is an exact
    double; cast truncates and integer-div buckets — rather than
    float floor-division, which can disagree across engines at exact
    boundaries. One shuffle, map-side combinable."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.expr("CAST(value * 100 AS BIGINT) div 1000"), F.lit(9).cast("bigint")
    )
    return (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_event_type, n
    FROM counts
    QUALIFY row_number() OVER (
      PARTITION BY user_id ORDER BY n DESC, event_type ASC) = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user mode (most frequent event type, ties →
    lexicographically first). Built-in mode() returns an ARBITRARY
    value on ties in both engines — count + row_number makes the
    answer reproducible, which any hash-checked pipeline needs."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id", F.col("event_type").alias("mode_event_type"), "n"
        )
    )
