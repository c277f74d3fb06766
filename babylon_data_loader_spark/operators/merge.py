"""Dedup-upsert (MERGE) into a partitioned parquet lake.

Reproduces the reference sink's semantics (storage/mongo_repository.go:
33-75): per-row upsert keyed on the 5-tuple
(details, posting_date, description, data_source, account_id) — amount
is NOT part of the key, so re-ingest is idempotent and same-key rows
collapse. The reference's intra-batch "last write wins" is
nondeterministic (unordered bulk, mongo_repository.go:57); we resolve
it to a DEFINED total order (SURVEY.md §7 hard-part 3) so results are
stable and hashable.

Physical strategy: with Delta/Iceberg this is `MERGE INTO`; on plain
parquet we implement the same converged state as
  batch ∪ (existing ∖ batch-keys)  → dynamic partition overwrite
touching ONLY the partitions present in the batch. At 100 TB the
rewrite cost is bounded by the touched partitions, not the table, and
the anti-join build side (one batch of new keys) broadcasts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.schemas import TRANSACTION_KEY


def dedup_latest(
    df: DataFrame,
    key: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one row per key, deterministically.

    `order_cols` break ties (descending); defaults to every non-key
    column, giving a total order so the survivor never depends on
    partitioning. This is the batch-local pre-dedup MERGE requires
    (unique source keys).
    """
    if order_cols is None:
        order_cols = [c for c in df.columns if c not in key]
    window = Window.partitionBy(*key).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
    return (
        df.withColumn("_rn", F.row_number().over(window))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    spark: SparkSession,
    lake_path: str,
    batch: DataFrame,
    key: list[str] | None = None,
    partition_col: str = "data_source",
) -> None:
    """Upsert `batch` into the parquet lake at `lake_path`.

    MERGE semantics: batch rows replace same-key stored rows; all other
    stored rows survive. Only partitions present in the batch are
    rewritten (dynamic partition overwrite).
    """
    key = key or TRANSACTION_KEY
    batch = dedup_latest(batch, key)

    exists = os.path.exists(lake_path) and any(
        not entry.startswith(("_", ".")) for entry in os.listdir(lake_path)
    )
    staging: str | None = None
    if exists:
        # Restrict to touched partitions: the IN-list is tiny (one
        # entry per data source in the batch) ⇒ partition pruning on
        # the stored side; everything else is untouched.
        touched = [
            row[0]
            for row in batch.select(partition_col).distinct().collect()
        ]
        stored = spark.read.parquet(lake_path).filter(
            F.col(partition_col).isin(touched)
        )
        # Anti-join out stored rows whose key appears in the batch;
        # batch keys are small relative to the table ⇒ broadcast the
        # batch side of the anti join.
        survivors = stored.join(
            F.broadcast(batch.select(*key).distinct()), on=key, how="left_anti"
        )
        merged = batch.unionByName(survivors)
        # Spark cannot overwrite a path it is reading from in the same
        # plan; stage the merged partitions, then swap in. (With
        # Delta/Iceberg this whole dance is one transactional MERGE
        # INTO — the staging write is the plain-parquet price.)
        import uuid

        staging = f"{lake_path}__staging_{uuid.uuid4().hex}"
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(
            staging
        )
        merged = spark.read.parquet(staging)
    else:
        merged = batch

    writer_conf = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(lake_path)
        )
    finally:
        if writer_conf is not None:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", writer_conf
            )
        else:
            # Leaving 'dynamic' set session-wide would change the
            # semantics of the caller's later plain overwrites.
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        if staging is not None:
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
