"""Driver-visible streaming surface: batch-replay through the real
Structured Streaming stack.

The five streaming modules (streaming/*.py) were previously
pytest-only; this declared query routes the driver's correctness
check through an actual `readStream` file source:

    events table, split into ranged parquet chunks
      → readStream (maxFilesPerTrigger ⇒ several micro-batches)
      → foreachBatch MERGE into a transactional lake
      → Trigger.AvailableNow drain
      → REPLAYED with a fresh checkpoint (every file delivered again)
      → final lake state aggregated per event_type

Because the sink is the keyed MERGE (operators/merge.py — the
reference's upsert, storage/mongo_repository.go:33-75), the second
full delivery of every event is a no-op on final state: the oracle is
a plain aggregate over `events`, exact despite ~2× redundant
delivery and arbitrary file arrival order. This mirrors the
reference's unprocessed-dir sweep + re-ingest idempotence contract
(datalake/datalake.go:146-151,274-295) in streaming form.

The final state is collected (a handful of grouped rows — final-state
check, not a data-plane collect) so the staging dirs can be removed
before the DataFrame is returned.
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
WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
GROUP BY event_type
"""


@query("q_stream_replay", oracle=_ORACLE)
def q_stream_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the events table through readStream → foreachBatch MERGE
    (twice — the second pass re-delivers every file) and aggregate the
    lake's final state. Exactly-once effect comes from the keyed
    upsert, not from suppressing redundant delivery."""
    from babylon_data_loader_spark.operators.merge import merge_upsert
    from babylon_data_loader_spark.operators.tx_lake import TransactionalLake

    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    work = os.path.join(wh, f"_stream_replay_{uuid.uuid4().hex[:12]}")
    src_dir = os.path.join(work, "src")
    lake_dir = os.path.join(work, "lake")

    # Stage the source as several files so AvailableNow produces
    # several micro-batches (ts keeps its source encoding end to end;
    # the final aggregate converts via event_ts_us).
    events = load_table(spark, sf_dir, "events")
    clean = events.filter(
        F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    clean.repartition(3).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def run_pass(checkpoint: str, files_per_trigger: int) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", str(files_per_trigger))
            .parquet(src_dir)
        )

        def process_batch(batch_df, batch_id: int) -> None:
            merge_upsert(
                batch_df.sparkSession,
                lake_dir,
                batch_df,
                key=["event_id"],
                partition_col="event_type",
            )

        (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", os.path.join(work, checkpoint))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    try:
        # Pass A: one file per micro-batch (incremental arrival).
        # Pass B: fresh checkpoint ⇒ every file delivered AGAIN, in
        # differently-shaped batches (2 files/trigger) — idempotence
        # must hold regardless of batch boundaries.
        run_pass("ckpt_a", files_per_trigger=1)
        run_pass("ckpt_b", files_per_trigger=2)

        state = TransactionalLake(lake_dir, partition_col="event_type").read(
            spark
        )
        ts_us = event_ts_us(state)
        final = state.groupBy("event_type").agg(
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
