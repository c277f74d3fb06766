"""Driver-visible change-data-feed surface: incremental view
maintenance from the transactional lake's diff().

The 100 TB story: a downstream aggregate over a continuously-merged
table must NOT be recomputed from scratch per version — the change
feed (insert/delete row pairs, computed only over the partitions the
merge touched) is enough to roll the aggregate forward:

    agg(v2) = agg(v1) + Σ inserts − Σ deletes        (per group)

This query builds a two-version lake (base load, then an update batch
that doubles every fifth event's value), maintains the per-type
COUNT/SUM incrementally from diff(v1, v2), ASSERTS the incremental
state equals a full recompute of v2, and returns it. The oracle is
the closed-form final state over the source table — so the driver's
row checks the whole chain: merge semantics, CDF correctness, and
the incremental-maintenance algebra. Mirrors the reference's
sync-log consumers reading per-batch deltas rather than re-scanning
(datalake/datalake.go sync accounting).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table

_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN event_id % 5 = 0 THEN 2 * value
                          ELSE value END AS DECIMAL(20,2)))
            AS DOUBLE) AS total
FROM events
WHERE event_id IS NOT NULL AND event_type IS NOT NULL
  AND value IS NOT NULL
GROUP BY event_type
"""


@query("q_incremental_agg", oracle=_ORACLE)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll a grouped COUNT/SUM forward from v1 to v2 using only the
    change feed (delete/insert pairs over touched partitions), then
    assert it equals the full v2 recompute before returning it.
    Decimal-routed sums keep the v1-aggregate + delta addition exact.
    """
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.filter(
        F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select("event_id", "event_type", "value")

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_lake_cdc_{uuid.uuid4().hex[:12]}")
    dec = lambda c: c.cast("decimal(20,2)")  # noqa: E731
    try:
        lake = TransactionalLake(work, partition_col="event_type")
        lake.merge(spark, base, key=["event_id"])  # v1
        updates = base.filter(F.col("event_id") % 5 == 0).withColumn(
            "value", F.col("value") * 2
        )
        lake.merge(spark, updates, key=["event_id"])  # v2

        agg1 = (
            lake.read(spark, version=1)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n1"),
                F.sum(dec(F.col("value"))).alias("s1"),
            )
        )
        cdf = lake.diff(spark, 1, 2, key=["event_id"])
        signed = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        delta = cdf.groupBy("event_type").agg(
            F.sum(signed).alias("dn"),
            F.sum(signed * dec(F.col("value"))).alias("ds"),
        )
        incr = (
            agg1.join(delta, on="event_type", how="full")
            .select(
                "event_type",
                (
                    F.coalesce("n1", F.lit(0)) + F.coalesce("dn", F.lit(0))
                ).cast("bigint").alias("n"),
                (
                    F.coalesce(F.col("s1"), dec(F.lit(0)))
                    + F.coalesce(F.col("ds"), dec(F.lit(0)))
                ).cast("double").alias("total"),
            )
        )
        incr_rows = sorted(map(tuple, incr.collect()))
        full_rows = sorted(
            map(
                tuple,
                lake.read(spark, version=2)
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum(dec(F.col("value"))).cast("double").alias("total"),
                )
                .collect(),
            )
        )
        if incr_rows != full_rows:
            raise AssertionError(
                "incremental maintenance diverged from full recompute: "
                f"{incr_rows[:3]} vs {full_rows[:3]}"
            )
        schema = incr.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(incr_rows, schema=schema)


# Time travel: both versions of a twice-merged lake read AS OF their
# version numbers, side by side. The oracle derives both states in
# closed form from the source table, so the row checks snapshot
# isolation end to end: v1 must still read exactly the pre-update
# state after v2 commits (immutable version dirs + per-version
# manifests, operators/tx_lake.py).
_TT_ORACLE = """
WITH clean AS (
  SELECT event_id, event_type, value FROM events
  WHERE event_id IS NOT NULL AND event_type IS NOT NULL
    AND value IS NOT NULL
)
SELECT 1 AS version, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total
FROM clean GROUP BY event_type
UNION ALL
SELECT 2 AS version, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CASE WHEN event_id % 5 = 0 THEN 2 * value
                          ELSE value END AS DECIMAL(20,2)))
            AS DOUBLE) AS total
FROM clean GROUP BY event_type
"""


@query("q_time_travel", oracle=_TT_ORACLE)
def q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate the SAME lake at version 1 and version 2 after an
    overlapping merge — the v1 numbers must be byte-identical to the
    pre-update state (snapshot isolation), the v2 numbers reflect the
    update batch."""
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.filter(
        F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select("event_id", "event_type", "value")

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_lake_tt_{uuid.uuid4().hex[:12]}")
    dec = lambda c: c.cast("decimal(20,2)")  # noqa: E731
    try:
        lake = TransactionalLake(work, partition_col="event_type")
        lake.merge(spark, base, key=["event_id"])  # v1
        updates = base.filter(F.col("event_id") % 5 == 0).withColumn(
            "value", F.col("value") * 2
        )
        lake.merge(spark, updates, key=["event_id"])  # v2

        frames = []
        for v in (1, 2):
            frames.append(
                lake.read(spark, version=v)
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum(dec(F.col("value"))).cast("double").alias("total"),
                )
                .select(
                    F.lit(v).alias("version"), "event_type", "n", "total"
                )
            )
        out = frames[0].unionByName(frames[1])
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema)


# Schema evolution: v2 merges a batch carrying a NEW column; v1 rows
# must backfill NULL for it on read, and the pre-evolution snapshot
# must remain readable with its original schema. Closed-form oracle
# over the source table.
_EVO_ORACLE = """
WITH clean AS (
  SELECT event_id, event_type, value FROM events
  WHERE event_id IS NOT NULL AND event_type IS NOT NULL
    AND value IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(SUM(CASE WHEN event_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_flag
FROM clean
GROUP BY event_type
"""


@query("q_schema_evolution", oracle=_EVO_ORACLE)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge a second batch that adds a `flag` column (every 3rd
    event); aggregate the evolved table counting flagged vs
    NULL-backfilled rows per type. Old rows surviving with NULL in the
    new column — not a read failure — IS the schema-evolution
    contract."""
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.filter(
        F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select("event_id", "event_type", "value")

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_lake_evo_{uuid.uuid4().hex[:12]}")
    try:
        lake = TransactionalLake(work, partition_col="event_type")
        lake.merge(spark, base, key=["event_id"])  # v1: no flag column
        evolved_batch = base.filter(F.col("event_id") % 3 == 0).withColumn(
            "flag", F.lit("y")
        )
        lake.merge(spark, evolved_batch, key=["event_id"])  # v2: + flag
        out = (
            lake.read(spark)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(
                    F.when(F.col("flag").isNotNull(), 1).otherwise(0)
                ).cast("bigint").alias("n_flagged"),
                F.sum(
                    F.when(F.col("flag").isNull(), 1).otherwise(0)
                ).cast("bigint").alias("n_null_flag"),
            )
        )
        rows = out.collect()
        schema = out.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema)


# Write-time expectations with quarantine --------------------------------------

_EXPECT_ORACLE = """
WITH src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS price,
         CASE WHEN o_orderkey % 89 = 0 THEN 'X'
              ELSE o_orderstatus END AS status
  FROM orders
),
marked AS (
  SELECT *,
         (price >= 0) AS ok_price,
         (status IN ('F','O','P')) AS ok_status
  FROM src
)
SELECT outcome, n FROM (
  SELECT 'passed' AS outcome, CAST(COUNT(*) AS BIGINT) AS n
  FROM marked WHERE ok_price AND ok_status
  UNION ALL
  SELECT 'quarantined', CAST(COUNT(*) AS BIGINT)
  FROM marked WHERE NOT (ok_price AND ok_status)
  UNION ALL
  SELECT 'viol_price_nonneg', CAST(COUNT(*) AS BIGINT)
  FROM marked WHERE NOT ok_price
  UNION ALL
  SELECT 'viol_status_accepted', CAST(COUNT(*) AS BIGINT)
  FROM marked WHERE NOT ok_status
) ORDER BY outcome
"""


@query("q_write_expectations", oracle=_EXPECT_ORACLE)
def q_write_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time data contract: a batch (orders with deterministic
    corruptions injected — negative price on every 97th key, bad
    status on every 89th) is routed through two quarantine-action
    expectations (operators/expectations.py), the passing rows MERGE
    into a transactional lake and the violating rows land in a
    quarantine lake with their violation names. The declared result
    re-READS both lakes — so the driver's check covers the routing
    arithmetic AND the round trip through the write path, like
    q_schema_evolution does for evolution. One projection evaluates
    every predicate; a row failing both expectations is quarantined
    once but counted under each violation."""
    from babylon_data_loader_spark.operators.expectations import (
        Expectation,
        apply_expectations,
    )
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    o = load_table(spark, sf_dir, "orders")
    src = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice")
        ).otherwise(F.col("o_totalprice")).alias("price"),
        F.when(F.col("o_orderkey") % 89 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
    )
    res = apply_expectations(
        src,
        [
            Expectation("price_nonneg", "price >= 0", "quarantine"),
            Expectation(
                "status_accepted", "status IN ('F','O','P')", "quarantine"
            ),
        ],
    )
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_lake_expect_{uuid.uuid4().hex[:12]}")
    try:
        good = TransactionalLake(
            os.path.join(work, "good"), partition_col="status"
        )
        good.merge(spark, res.passed, key=["o_orderkey"])
        bad = TransactionalLake(
            os.path.join(work, "bad"), partition_col="status"
        )
        bad.merge(
            spark,
            res.quarantined.withColumn(
                "violations", F.array_join("violations", ",")
            ),
            key=["o_orderkey"],
        )
        passed_n = good.read(spark).count()
        quar = bad.read(spark)
        quar_n = quar.count()
        viol_rows = (
            quar.select(
                F.explode(F.split("violations", ",")).alias("v")
            )
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    viol = {r["v"]: r["n"] for r in viol_rows}
    out = [
        ("passed", passed_n),
        ("quarantined", quar_n),
        ("viol_price_nonneg", viol.get("price_nonneg", 0)),
        ("viol_status_accepted", viol.get("status_accepted", 0)),
    ]
    return spark.createDataFrame(
        sorted(out), schema="outcome STRING, n BIGINT"
    )


# Materialized-view rewrite ----------------------------------------------------

_MV_ORACLE = """
WITH clean AS (
  SELECT event_type, epoch_us(ts) AS ts_us, value
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
)
SELECT event_type,
       (ts_us // 86400000000) * 86400000000 AS day_us,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
FROM clean
GROUP BY 1, 2
"""


@query("q_mv_rewrite", oracle=_MV_ORACLE)
def q_mv_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view REWRITE — the read-side twin of
    q_incremental_agg's maintenance: a finer (hourly) COUNT/SUM
    summary is materialized once, and the daily aggregate is answered
    by RE-AGGREGATING THE SUMMARY (SUM of hourly sums, SUM of hourly
    counts), never rescanning the fact table. The algebra only works
    for decomposable aggregates — which is why the summary carries
    COUNT and DECIMAL SUM (AVG would be derived, never stored). The
    query ASSERTS the rewrite equals the direct fact-table recompute
    before returning: at 100 TB the summary is O(groups × hours) —
    the rewrite reads megabytes where the fact scan reads terabytes.
    Reference analogue: the sync-log consumers aggregate per-batch
    counters instead of re-scanning the lake
    (datalake/datalake.go sync accounting)."""
    events = load_table(spark, sf_dir, "events")
    us = event_ts_us(events)
    clean = events.filter(
        F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "event_type",
        us.alias("ts_us"),
        F.col("value").cast("decimal(20,2)").alias("v"),
    )
    # Floor-based bucketing in pure integer arithmetic: the oracle's
    # `//` floors, while double-divide + cast('long') truncates toward
    # zero — they diverge on pre-1970 (negative-micros) timestamps.
    # `x - ((x % N) + N) % N` is the exact floor bucket start for any
    # sign, with no double rounding.
    def _floor_bucket(col: str, n: int):
        x = F.col(col)
        lit = F.lit(n)
        return x - ((x % lit) + lit) % lit

    hour = _floor_bucket("ts_us", 3_600_000_000)
    hourly = clean.groupBy(
        "event_type", hour.alias("hour_us")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_v"),
    )
    # materialize the summary (the "view"); at rest this is a lake
    # table maintained by q_incremental_agg's change-feed algebra
    from babylon_data_loader_spark.functions.cache import persist_tracked

    hourly = persist_tracked(hourly)
    day = _floor_bucket("hour_us", 86_400_000_000)
    rewritten = hourly.groupBy(
        "event_type", day.alias("day_us")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_dec"),
    )
    direct = clean.groupBy(
        "event_type",
        _floor_bucket("ts_us", 86_400_000_000).alias("day_us"),
    ).agg(
        F.count(F.lit(1)).alias("n_d"),
        F.sum("v").alias("sum_d"),
    )
    # in-query assertion: rewrite == direct recompute, exactly
    mismatches = (
        rewritten.join(direct, on=["event_type", "day_us"], how="full")
        .filter(
            F.col("n").isNull()
            | F.col("n_d").isNull()
            | (F.col("n") != F.col("n_d"))
            | (F.col("sum_dec") != F.col("sum_d"))
        )
        .count()
    )
    if mismatches:
        raise AssertionError(
            f"MV rewrite diverged from direct recompute: {mismatches} groups"
        )
    return rewritten.select(
        "event_type",
        "day_us",
        F.col("n").cast("long").alias("n"),
        F.col("sum_dec").cast("double").alias("total_value"),
    )
