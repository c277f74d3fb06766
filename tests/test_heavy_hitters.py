"""Misra–Gries heavy hitters: exactness against a brute-force count
under skew and across partition counts (the sketch must only prune,
never lose a true heavy hitter)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _truth(df, phi):
    total = df.count()
    thresh = int(phi * total)
    return {
        (r["item"], r["n"])
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > thresh)
        .collect()
    }


@pytest.mark.parametrize("parts", [1, 7])
def test_exact_under_zipf_skew(spark, parts):
    from babylon_data_loader_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    # zipf-ish: item k appears ~ 5000/k times — a few heavy items over
    # a long tail, deterministic construction.
    rows = []
    for k in range(1, 400):
        rows.extend([(f"item_{k}",)] * (5000 // k))
    df = spark.createDataFrame(rows, "item STRING").repartition(parts)

    got = {
        (r["item"], r["n"])
        for r in heavy_hitters(df, "item", phi=0.01).collect()
    }
    assert got == _truth(df, 0.01)


def test_adversarial_uniform_tail_does_not_evict_heavy(spark):
    """Worst case for MG: a heavy item interleaved with a flood of
    distinct singletons that constantly trigger decrements."""
    from babylon_data_loader_spark.operators.heavy_hitters import (
        heavy_hitters,
    )

    rows = [("heavy",)] * 3_000 + [(f"u{i}",) for i in range(60_000)]
    df = spark.createDataFrame(rows, "item STRING").repartition(5)
    got = {r["item"] for r in heavy_hitters(df, "item", phi=0.04).collect()}
    assert got == {"heavy"}
