"""Skew-handling utilities: salted aggregation and salted broadcast
join for hot keys.

At 100 TB, a handful of hot keys (one boilerplate document fingerprint,
one mega-customer) can pin a whole stage on one task. AQE's skew-join
splitting handles sort-merge joins; these utilities cover the two
cases AQE doesn't: skewed AGGREGATIONS (two-phase salted combine) and
hot-key HASH joins against a small side (replicate the small side per
salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    key: list[str],
    n_salts: int = 16,
    count_col: str = "n",
) -> DataFrame:
    """Two-phase count for skewed keys.

    Phase 1 groups by (key, salt) — hot keys spread over `n_salts`
    tasks; phase 2 sums the partials per key. The salt is random: the
    RESULT is salt-independent (phase 2 re-aggregates), and randomness
    spreads even fully-identical duplicate rows, which a row-hash salt
    cannot.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = (
        df.select(*key, salt)
        .groupBy(*key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return (
        partial.groupBy(*key)
        .agg(F.sum("_partial").cast("bigint").alias(count_col))
    )


def salted_sum(
    df: DataFrame,
    key: list[str],
    value: Column,
    n_salts: int = 16,
    sum_col: str = "total",
) -> DataFrame:
    """Two-phase decimal-exact sum for skewed keys."""
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = (
        df.select(*key, value.alias("_v"), salt)
        .groupBy(*key, "_salt")
        .agg(F.sum(F.col("_v").cast("decimal(30,6)")).alias("_partial"))
    )
    return partial.groupBy(*key).agg(
        F.sum("_partial").cast("double").alias(sum_col)
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: salt the big side, replicate the small side
    once per salt value, join on (key, salt).

    The replication factor is bounded (n_salts × |small|), so this is
    for genuinely small dimension sides. With broadcast joins Spark
    doesn't skew on the big side at all — this utility exists for the
    case where the join must shuffle (e.g. small side just over the
    broadcast threshold) and a few keys dominate.
    """
    salt_big = (F.rand(seed=42) * n_salts).cast("int")
    big_salted = big.withColumn("_salt", salt_big)
    small_salted = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    joined = big_salted.join(small_salted, on=[*on, "_salt"], how=how)
    return joined.drop("_salt")
