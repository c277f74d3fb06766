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
from babylon_data_loader_spark.schemas import event_ts_us

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

    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
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
