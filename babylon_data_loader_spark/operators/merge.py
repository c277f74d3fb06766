"""Dedup-upsert (MERGE) into a partitioned parquet lake.

Reproduces the reference sink's semantics (storage/mongo_repository.go:
33-75): per-row upsert keyed on the 5-tuple
(details, posting_date, description, data_source, account_id) — amount
is NOT part of the key, so re-ingest is idempotent and same-key rows
collapse. The reference's intra-batch "last write wins" is
nondeterministic (unordered bulk, mongo_repository.go:57); we resolve
it to a DEFINED total order (SURVEY.md §7 hard-part 3) so results are
stable and hashable.

Physical strategy: with Delta/Iceberg this is `MERGE INTO`; without
them, the transactional lake (operators/tx_lake.py) provides the same
commit shape — the merged state
  batch ∪ (existing ∖ batch-keys)
is written ONCE into an immutable version directory covering only the
touched partitions, then activated with an atomic manifest-pointer
swap. A crash leaves the previous state fully intact; concurrent
writers race on an O_EXCL version claim and the loser retries on
fresh data. At 100 TB the rewrite cost is bounded by the touched
partitions, not the table, and the anti-join build side (one batch of
new keys) broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.operators.tx_lake import (
    RESOLVE_RN,
    TransactionalLake,
)
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
    if RESOLVE_RN in df.columns:
        raise ValueError(
            f"dedup_latest: reserved working column {RESOLVE_RN!r} "
            "collides with an input column — rename it"
        )
    window = Window.partitionBy(*key).orderBy(
        *[F.col(c).desc_nulls_last() for c in order_cols]
    )
    return (
        df.withColumn(RESOLVE_RN, F.row_number().over(window))
        .filter(F.col(RESOLVE_RN) == 1)
        .drop(RESOLVE_RN)
    )


def merge_upsert(
    spark: SparkSession,
    lake_path: str,
    batch: DataFrame,
    key: list[str] | None = None,
    partition_col: str = "data_source",
    order_cols: list[str] | None = None,
    max_retries: int = 3,
) -> None:
    """Upsert `batch` into the transactional lake at `lake_path`.

    MERGE semantics: batch rows replace same-key stored rows; all other
    stored rows survive. Only partitions present in the batch are
    rewritten, exactly once, and the commit is atomic (tx_lake.py).
    A pre-existing plain parquet lake is adopted in place with no data
    movement (its root becomes version 1's data directory).

    With ``order_cols``, same-key resolution (batch-internal AND
    vs stored rows) is by total order instead of last-commit-wins:
    the survivor is the max under (order_cols DESC, nulls last),
    making the final state independent of commit interleaving — the
    mode concurrent writers with divergent values need
    (tx_lake.merge docstring).
    """
    key = key or TRANSACTION_KEY
    batch = dedup_latest(batch, key, order_cols)
    # open() honors the partition column recorded in the manifest of a
    # migrated lake; the caller's column applies to fresh lakes only.
    TransactionalLake.open(
        lake_path, partition_col=partition_col
    ).merge(
        spark,
        batch,
        key,
        max_retries=max_retries,
        order_cols=order_cols,
    )
