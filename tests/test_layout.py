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


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    from babylon_data_loader_spark.operators.layout import optimize_layout

    src = os.path.join(tmp_path, "src")
    zdst = os.path.join(tmp_path, "zdst")
    sdst = os.path.join(tmp_path, "sdst")
    # two independent uniform dims, deterministic from id
    spark.range(40_000).selectExpr(
        "CAST(hash(id) % 10000 AS DOUBLE) AS x",
        "CAST(hash(id + 7777) % 10000 AS DOUBLE) AS y",
        "id",
    ).coalesce(1).write.parquet(src)

    zopt = optimize_layout(spark, src, zdst, n_files=8, zorder_by=["x", "y"])
    sopt = optimize_layout(spark, src, sdst, n_files=8, sort_by=["x"])
    assert zopt.count() == 40_000

    def overlapping(path, col, lo, hi):
        n = 0
        for p in _parts(path):
            md = pq.ParquetFile(p).metadata
            idx = next(
                i
                for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mn = min(
                md.row_group(g).column(idx).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(idx).statistics.max
                for g in range(md.num_row_groups)
            )
            if mx >= lo and mn <= hi:
                n += 1
        return n

    # a narrow band probe on EACH dimension must skip z-ordered files
    assert overlapping(zdst, "x", -10000.0, -7600.0) < 8
    assert overlapping(zdst, "y", -10000.0, -7600.0) < 8
    # single-column sort prunes its own column but NOT the other
    assert overlapping(sdst, "x", -10000.0, -7600.0) < 8
    assert overlapping(sdst, "y", -10000.0, -7600.0) == 8
