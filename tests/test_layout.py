"""Layout optimizer: scan parallelism recovered, rows preserved,
sorted rewrite produces disjoint per-file ranges (skipping-friendly)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from babylon_data_loader_spark.operators.layout import optimize_layout


def _parts(path):
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]


def test_optimize_restores_parallelism_and_rows(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    dst = os.path.join(tmp_path, "dst")
    # one-file, one-row-group source: the degenerate layout
    spark.range(50_000).withColumn("v", F.col("id") * 2).coalesce(
        1
    ).write.parquet(src)
    assert len(_parts(src)) == 1

    out = optimize_layout(spark, src, dst, n_files=8)
    assert len(_parts(dst)) == 8
    assert out.count() == 50_000
    assert out.agg(F.sum("v")).collect()[0][0] == spark.read.parquet(
        src
    ).agg(F.sum("v")).collect()[0][0]


def test_sorted_rewrite_gives_disjoint_file_ranges(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    dst = os.path.join(tmp_path, "dst")
    spark.range(20_000).select(
        (F.hash("id") % 1000).alias("k"), F.col("id").alias("v")
    ).coalesce(1).write.parquet(src)

    optimize_layout(spark, src, dst, n_files=4, sort_by=["k"])
    ranges = []
    for p in _parts(dst):
        md = pq.ParquetFile(p).metadata
        col = md.row_group(0).column(0)
        lo = col.statistics.min
        hi = max(
            md.row_group(i).column(0).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    # consecutive file ranges must not interleave (allow touching at
    # the boundary value itself)
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert lo_b >= hi_a
