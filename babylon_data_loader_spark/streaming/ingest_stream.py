"""Streaming CSV ingest — the reference's unprocessed-dir sweep with
post-ingest archival (datalake/datalake.go:146-151,274-295) is exactly
Structured Streaming's file source contract:

    readStream(csv dir) → normalize/validate → foreachBatch merge
    with Trigger.AvailableNow (drain-and-stop) and
    cleanSource=archive (move processed files).

The batch path (ingest/pipeline.py) stays the reference-parity
default; this is the incremental variant for continuous arrival. The
file-source checkpoint replaces the reference's "move the file so we
don't re-read it" bookkeeping — exactly-once across restarts instead
of at-most-once.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from babylon_data_loader_spark.ingest.normalize import (
    normalize_transactions,
    validate_transactions,
)
from babylon_data_loader_spark.operators.merge import merge_upsert
from babylon_data_loader_spark.sources.csv_source import with_source_info

# The streaming source needs a fixed schema; use the canonical 8-column
# bank-export header (FIXTURES.md §A1) in its exact POSITIONAL order —
# Spark CSV binds user schemas by position, not by header name.
# Header-variant files belong to the batch path, which sniffs per-file
# headers.
STREAM_CSV_SCHEMA = StructType(
    [
        StructField(c, StringType())
        for c in [
            "details",
            "posting date",
            "description",
            "category",
            "amount",
            "type",
            "balance",
            "check or slip #",
        ]
    ]
)


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    lake_path: str,
    checkpoint_dir: str,
    archive_dir: str | None = None,
    available_now: bool = True,
    contract: list | None = None,
    quarantine_dir: str | None = None,
):
    """Start (and with available_now=True, drain) the streaming ingest.

    Returns the StreamingQuery. Each micro-batch runs the same
    normalize → validate → merge_upsert chain as the batch pipeline,
    via foreachBatch (merge is not an append — it needs the upsert).

    `contract` (list of operators/expectations.py Expectation) gates
    each micro-batch like a DLT expectation set: passing rows merge,
    quarantine-action violations append to `quarantine_dir` tagged
    with their violation names and batch id. The MERGE stays
    exactly-once under replay (keyed upsert); the quarantine append is
    at-least-once on batch retry — it is the diagnostic channel, so
    dedup on read (violations + key) if exactness matters there."""
    reader = (
        spark.readStream.format("csv")
        .schema(STREAM_CSV_SCHEMA)
        .option("header", "true")
        .option("pathGlobFilter", "*.[cC][sS][vV]")
        .option("maxFilesPerTrigger", "64")
    )
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    raw = reader.load(input_dir).withColumn(
        "_input_file", F.input_file_name()
    )
    raw = with_source_info(raw)

    def process_batch(batch_df, batch_id: int) -> None:
        accepted = batch_df.filter(F.col("data_source").isNotNull())
        valid = validate_transactions(
            normalize_transactions(accepted)
        ).drop("_input_file")
        if contract:
            from babylon_data_loader_spark.operators.expectations import (
                apply_expectations,
            )

            res = apply_expectations(valid, list(contract))
            if quarantine_dir is not None:
                (
                    res.quarantined.withColumn(
                        "violations", F.array_join("violations", ",")
                    )
                    .withColumn("_batch_id", F.lit(batch_id))
                    .write.mode("append")
                    .parquet(quarantine_dir)
                )
            valid = res.passed
        if valid.isEmpty():
            return
        merge_upsert(batch_df.sparkSession, lake_path, valid)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
