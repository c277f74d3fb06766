"""Shared hot-bucket guard for LSH-style candidate generation.

Every banded-LSH path (MinHash bands over documents, sign buckets over
embeddings, shingle buckets for containment) generates within-bucket
pairs; one degenerate bucket — boilerplate text, near-identical
embeddings — turns that quadratic. All paths cap bucket size with the
SAME helper so a tuning fix lands in one place.

The guard is a partial-aggregating groupBy + broadcast anti-join
against the oversized-bucket list, which stays TINY (≤ rows/cap
entries) at any corpus size — so the broadcast holds at 100 TB where
a keep-list of under-cap buckets would not. The guard also bounds the
downstream ``groupBy(bucket) + collect_list`` pair generators:
post-guard every bucket has ≤ cap members, so aggregation buffers are
capped by construction (the reason the guard must run BEFORE
collecting, never as a size filter on the collected array).

A COUNT-window variant existed through r10 for callers whose guarded
frame feeds a bucket-keyed self-join; the r6 move of all pair
generators to in-bucket collect_list + explode left it caller-less,
and r11 removed it (r10 VERDICT ask #4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_oversized_buckets(
    df: DataFrame,
    keys: Sequence[str],
    cap: int | None,
) -> DataFrame:
    """Drop every row belonging to a bucket with more than `cap`
    members. `cap=None` disables the guard."""
    if cap is None:
        return df
    # a bare string is a Sequence[str]: list('key') would split it
    # into single-character column names
    keys = [keys] if isinstance(keys, str) else list(keys)
    oversized = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(*keys)
    )
    return df.join(oversized, on=keys, how="left_anti")
