"""Streaming exactly-once dedup: redundant delivery collapsed by the
STREAM (keyed state store), not by the sink.

`q_stream_replay` proves idempotence via a MERGE sink; this lane
proves the other standard pattern — `dropDuplicates` on the stream
itself, so a plain append-only sink (the common case for a training
corpus landing zone: parquet files, no transactional upsert) still
receives each event exactly once despite at-least-once delivery.

State discipline at 100 TB: the declared query uses unkeyed-watermark
`dropDuplicates` because the oracle demands EXACT results under
arbitrary file arrival order (a watermark would declare late
duplicates "too old to remember" and late uniques "too late to
keep" — bounded state is a recall tradeoff, not free).
`tests/test_skew_stateful.py::test_stream_dedup_watermarked` covers
the bounded-state `dropDuplicatesWithinWatermark` variant under
in-order arrival, which is what production would run with a
time-partitioned source. Reference analogue: the 5-key dedup sync
contract (/root/reference/datalake/datalake.go:274-295).
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
       CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value,
       MIN(epoch_us(ts)) AS first_us,
       MAX(epoch_us(ts)) AS last_us
FROM events
WHERE event_type IS NOT NULL AND value IS NOT NULL
  AND ts IS NOT NULL AND event_id IS NOT NULL
GROUP BY event_type
"""


@query("q_stream_dedup", oracle=_ORACLE)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the events table with every third event duplicated into a
    second file set, stream it through `dropDuplicates(event_id)` into
    an append-only parquet sink (AvailableNow, several micro-batches),
    and aggregate the sink. The oracle is the plain one-copy
    aggregate: the stream's keyed state must absorb the redundant
    delivery exactly."""
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_stream_dedup_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")

    events = load_table(spark, sf_dir, "events")
    clean = events.filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_id").isNotNull()
    )
    # At-least-once delivery: uniques in 3 files, then a fourth wave
    # re-delivering every third event.
    clean.repartition(3).write.mode("overwrite").parquet(src_dir)
    dupes = clean.filter(F.col("event_id") % 3 == 0)
    dupes.coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src_dir)
    )
    deduped = stream.dropDuplicates(["event_id"])
    (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    try:
        sunk = spark.read.parquet(out_dir)
        ts_us = event_ts_us(sunk)
        final = sunk.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_value"),
            F.min(ts_us).alias("first_us"),
            F.max(ts_us).alias("last_us"),
        )
        rows = final.collect()  # final-state rows (one per event_type)
        out_schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)


_JOIN_ORACLE = """
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
"""


@query("q_stream_join", oracle=_JOIN_ORACLE)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM attribution join, the real thing: two readStream
    handles over the staged events, both watermarked, joined on
    user_id with the 30-minute event-time range in the condition
    (streaming/joins.py::attribute_purchases — q_attribution_join is
    its batch twin and shares this oracle). The watermark here is set
    beyond the data's time span so the oracle is exact under arbitrary
    file arrival order; production narrows it to the attribution
    horizon and lets click state expire — that bound times the per-key
    event rate is the state-store footprint at 100 TB."""
    from babylon_data_loader_spark.schemas import events_with_time
    from babylon_data_loader_spark.streaming.joins import (
        attribute_purchases,
    )

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_stream_join_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")

    events = load_table(spark, sf_dir, "events")
    events.filter(
        F.col("event_type").isin("click", "purchase")
    ).repartition(3).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def side(event_type: str):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        return events_with_time(stream).filter(
            F.col("event_type") == event_type
        )

    joined = attribute_purchases(
        side("click"),
        side("purchase"),
        within="30 minutes",
        watermark="3650 days",  # beyond the data span: exactness over
        # state economy, documented above
    ).select("user_id", "click_id", "purchase_id")
    (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    try:
        final = spark.read.parquet(out_dir).select(
            "user_id", "click_id", "purchase_id"
        )
        rows = final.collect()  # join output (bounded by oracle size)
        out_schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)


_ENRICH_ORACLE = """
WITH dim AS (
  SELECT DISTINCT user_id, user_id % 3 AS tier FROM events
  WHERE user_id IS NOT NULL
)
SELECT d.tier,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
FROM events e JOIN dim d USING (user_id)
WHERE e.user_id IS NOT NULL AND e.value IS NOT NULL
GROUP BY d.tier
ORDER BY d.tier
"""


@query("q_stream_enrich", oracle=_ENRICH_ORACLE)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STATIC enrichment (streaming/enrich.py): the event
    stream joins a broadcast user dimension per micro-batch —
    stateless, the canonical high-volume-stream × slowly-changing-dim
    shape; a shuffle join here would re-shuffle every micro-batch.
    The dimension is derived once from the static table (user tier =
    user_id % 3), the enriched stream lands in an append-only parquet
    sink, and the final per-tier aggregate must equal the plain batch
    join oracle."""
    from babylon_data_loader_spark.streaming.enrich import enrich_events

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_stream_enrich_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "out")

    events = load_table(spark, sf_dir, "events")
    clean = events.filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    clean.repartition(3).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    user_dim = (
        clean.select("user_id")
        .distinct()
        .withColumn("tier", F.col("user_id") % 3)
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    enriched = enrich_events(stream, user_dim).select(
        "tier", "value"
    )
    (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    try:
        final = (
            spark.read.parquet(out_dir)
            .groupBy("tier")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(20,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .orderBy("tier")
        )
        rows = final.collect()  # final per-tier rows
        out_schema = final.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, out_schema)


# Stream-stream LEFT OUTER join ------------------------------------------------
# Unmatched-click emission is gated by the watermark: a click with no
# purchase in its 30-minute window appears (with NULL purchase) only
# once the global watermark strictly passes the click's window end —
# clicks inside the final horizon are withheld state and never reach
# the AvailableNow sink. The strict-< eviction boundary is pinned
# empirically by tests/test_round4e.py::test_stream_left_outer_boundary
# (a click whose window end EQUALS the final watermark is withheld).
# Watermark arithmetic in ms (Spark's event-time granularity): each
# side's watermark is floor_ms(max event time on that FILTERED side)
# − 90 min; the global watermark is their min.

_LEFT_JOIN_ORACLE = """
WITH clicks AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
), wm AS (
  SELECT LEAST((SELECT MAX(c_us) // 1000 FROM clicks),
               (SELECT MAX(p_us) // 1000 FROM purch))
         - 5400000 AS wm_ms
)
SELECT user_id, click_id, purchase_id FROM (
  SELECT c.user_id, c.click_id, p.purchase_id
  FROM clicks c JOIN purch p ON p.user_id = c.user_id
   AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 1800000000
  UNION ALL
  SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id
  FROM clicks c, wm
  WHERE NOT EXISTS (
    SELECT 1 FROM purch p WHERE p.user_id = c.user_id
      AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 1800000000
  ) AND (c.c_us // 1000) + 1800000 < wm.wm_ms
) ORDER BY click_id, purchase_id
"""


@query("q_stream_left_join", oracle=_LEFT_JOIN_ORACLE)
def q_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER attribution join with REAL watermarks
    (90 min) — unlike q_stream_join's beyond-the-span watermark, outer
    semantics force the real thing: NULL-purchase rows exist only
    because the engine proves no match can still arrive. Time-ordered
    replay (the _stage_time_ordered contract) guarantees no row is
    ever late-dropped and every genuine match beats its click's
    eviction (delay 90 min > window 30 min makes that a theorem, not
    luck — see the derivation in the module comment above the oracle).
    At 100 TB the left state store holds one window's clicks per key;
    the outer emission IS the state eviction, so state is bounded by
    watermark lag × event rate."""
    from babylon_data_loader_spark.queries.streaming_window import (
        _stage_time_ordered,
    )
    from babylon_data_loader_spark.streaming.joins import (
        attribute_purchases,
    )

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_stream_ljoin_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(work, "src")
    sink_dir = os.path.join(work, "sink")
    try:
        events = load_table(spark, sf_dir, "events")
        staged = events.filter(
            F.col("event_type").isin("click", "purchase")
        ).select(
            "event_id",
            F.timestamp_micros(event_ts_us(events)).alias("ts_ts"),
            "user_id",
            "event_type",
        )
        _stage_time_ordered(staged, work, src_dir)
        schema = spark.read.parquet(src_dir).schema

        def side(event_type: str) -> DataFrame:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src_dir)
            )
            return stream.filter(F.col("event_type") == event_type)

        joined = attribute_purchases(
            side("click"),
            side("purchase"),
            within="30 minutes",
            watermark="90 minutes",
            how="left",
        ).select("user_id", "click_id", "purchase_id")
        (
            joined.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = (
            spark.read.parquet(sink_dir)
            .select("user_id", "click_id", "purchase_id")
            .orderBy("click_id", "purchase_id")
        )
        rows = out.collect()
        schema_out = out.schema
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema_out)


# Complete-mode aggregation ----------------------------------------------------

_COMPLETE_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type IS NOT NULL AND value IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


@query("q_stream_complete", oracle=_COMPLETE_ORACLE)
def q_stream_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ninth streaming lane: COMPLETE output mode — the running
    dashboard. Unlike every append-mode lane, the full aggregate is
    re-emitted each micro-batch and NOTHING is ever late-dropped:
    there is no watermark, so file arrival order is irrelevant
    (deliberately staged unordered, the exact opposite of
    _stage_time_ordered's contract — and the oracle is the plain
    batch aggregate with no cutoff arithmetic). The cost of that
    convenience is state: the sink holds O(groups) rows forever and
    each batch rewrites them — fine for a |event_type|-sized
    dashboard, wrong for high-cardinality keys (that is what the
    watermarked lanes are for). Memory sink (complete mode's natural
    target); the final table equals the last re-emission."""
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_stream_complete_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(work, "src")
    table = f"complete_{uuid.uuid4().hex[:8]}"
    try:
        events = load_table(spark, sf_dir, "events")
        staged = events.filter(
            F.col("event_type").isNotNull() & F.col("value").isNotNull()
        ).select("event_type", "value")
        # UNORDERED staging — complete mode must not care
        staged.repartition(3).write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)"))
            .cast("double")
            .alias("total_value"),
        )
        (
            agg.writeStream.format("memory")
            .queryName(table)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = spark.table(table).orderBy("event_type")
        rows = out.collect()
        schema_out = out.schema
    finally:
        spark.catalog.dropTempView(table) if table in [
            t.name for t in spark.catalog.listTables()
        ] else None
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, schema=schema_out)
