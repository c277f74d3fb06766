"""Shared hot-bucket guard for LSH-style candidate generation.

Every banded-LSH path (MinHash bands over documents, sign buckets over
embeddings, shingle buckets for containment) generates within-bucket
pairs; one degenerate bucket — boilerplate text, near-identical
embeddings — turns that quadratic. All paths cap bucket size with the
SAME helper so a tuning fix lands in one place.

All current call sites use ``antijoin``: a partial-aggregating groupBy
+ broadcast anti-join against the oversized-bucket list, which stays
TINY (≤ rows/cap entries) at any corpus size — so the broadcast holds
at 100 TB where a keep-list of under-cap buckets would not. The guard
also bounds the downstream ``groupBy(bucket) + collect_list`` pair
generators: post-guard every bucket has ≤ cap members, so aggregation
buffers are capped by construction (the reason the guard must run
BEFORE collecting, never as a size filter on the collected array).

``window`` (COUNT window over the bucket keys, one full-data exchange
that a same-keyed self-join can reuse) is retained for callers whose
guarded frame feeds a bucket-keyed self-join; since the pair
generators moved to in-bucket collect_list + explode (r6), no
first-party call site uses it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def drop_oversized_buckets(
    df: DataFrame,
    keys: Sequence[str],
    cap: int | None,
    strategy: str = "window",
) -> DataFrame:
    """Drop every row belonging to a bucket with more than `cap`
    members. `cap=None` disables the guard."""
    if cap is None:
        return df
    # a bare string is a Sequence[str]: list('key') would split it
    # into single-character column names
    keys = [keys] if isinstance(keys, str) else list(keys)
    if strategy == "window":
        return (
            df.withColumn(
                "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
            )
            .filter(F.col("_n") <= cap)
            .drop("_n")
        )
    if strategy == "antijoin":
        oversized = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > cap)
            .select(*keys)
        )
        return df.join(oversized, on=keys, how="left_anti")
    raise ValueError(f"unknown strategy {strategy!r}")
