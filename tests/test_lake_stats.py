"""File-level data skipping on the transactional lake: a clustered
write gets per-file min/max sidecars, and read_pruned opens strictly
fewer files while returning exactly read().filter(...). The at-scale
claim under test: a narrow range over a range-clustered 100 TB lake
touches O(files-in-range), not O(table)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from babylon_data_loader_spark.operators.lake_stats import STATS_SIDECAR
from babylon_data_loader_spark.operators.tx_lake import TransactionalLake

KEY = ["k"]


def clustered_lake(spark, path):
    lake = TransactionalLake(
        str(path),
        stats_cols=["amount", "name"],
        cluster_by=["amount"],
        cluster_files=8,
    )
    rows = [
        (i, float(i), f"n{i:05d}", "chase" if i % 2 else "syn")
        for i in range(4000)
    ]
    lake.merge(
        spark,
        spark.createDataFrame(
            rows, "k BIGINT, amount DOUBLE, name STRING, data_source STRING"
        ),
        KEY,
    )
    return lake


def test_sidecar_written_with_version(spark, tmp_path):
    lake = clustered_lake(spark, tmp_path / "lake")
    vdirs = os.listdir(os.path.join(lake.lake_path, "_versions"))
    assert len(vdirs) == 1
    sidecar = os.path.join(
        lake.lake_path, "_versions", vdirs[0], STATS_SIDECAR
    )
    assert os.path.isdir(sidecar)
    stats = spark.read.parquet(sidecar)
    # every (file × stats col) has a row; numeric col carries num bounds
    amt = stats.filter(F.col("column") == "amount")
    assert amt.filter(F.col("kind") != "num").count() == 0
    lo = amt.agg(F.min("min_num")).first()[0]
    hi = amt.agg(F.max("max_num")).first()[0]
    assert (lo, hi) == (0.0, 3999.0)


def test_pruned_read_matches_filter_and_skips_files(spark, tmp_path):
    lake = clustered_lake(spark, tmp_path / "lake")
    naive = lake.read(spark).filter(
        (F.col("amount") >= 100.0) & (F.col("amount") <= 220.0)
    )
    pruned = lake.read_pruned(spark, [("amount", 100.0, 220.0)])
    assert sorted(r["k"] for r in pruned.collect()) == sorted(
        r["k"] for r in naive.collect()
    )
    total = len(lake.read(spark).inputFiles())
    touched = len(pruned.inputFiles())
    # 8 range buckets × 2 hive partitions: a ~3% window lands in one
    # bucket ⇒ 2 of 16 files
    assert touched < total
    assert touched <= total // 4


def test_string_bounds_prune(spark, tmp_path):
    lake = clustered_lake(spark, tmp_path / "lake")
    pruned = lake.read_pruned(spark, [("name", "n03990", None)])
    naive = lake.read(spark).filter(F.col("name") >= "n03990")
    assert pruned.count() == naive.count() == 10
    assert len(pruned.inputFiles()) < len(lake.read(spark).inputFiles())


def test_disjoint_range_reads_nothing_but_keeps_schema(spark, tmp_path):
    lake = clustered_lake(spark, tmp_path / "lake")
    pruned = lake.read_pruned(spark, [("amount", 1e9, None)])
    assert pruned.count() == 0
    assert set(pruned.columns) == {"k", "amount", "name", "data_source"}


def test_unstated_lake_falls_back_to_full_read(spark, tmp_path):
    """Dirs written before stats existed (no sidecar) are read whole:
    skipping is an optimization, never a correctness dependency."""
    plain = TransactionalLake(str(tmp_path / "plain"))
    plain.merge(
        spark,
        spark.createDataFrame(
            [(1, 5.0, "x", "chase"), (2, 50.0, "y", "syn")],
            "k BIGINT, amount DOUBLE, name STRING, data_source STRING",
        ),
        KEY,
    )
    out = plain.read_pruned(spark, [("amount", 10.0, None)])
    assert [r["k"] for r in out.collect()] == [2]


def test_predicate_on_unstated_column_keeps_all_files(spark, tmp_path):
    """A predicate on a column with no collected stats must prune
    nothing (conservative), only filter rows."""
    lake = clustered_lake(spark, tmp_path / "lake")
    pruned = lake.read_pruned(spark, [("k", 0, 9)])
    assert pruned.count() == 10
    assert len(pruned.inputFiles()) == len(lake.read(spark).inputFiles())


def test_append_after_merge_prunes_both_versions(spark, tmp_path):
    lake = clustered_lake(spark, tmp_path / "lake")
    lake.append(
        spark,
        spark.createDataFrame(
            [(90000, 150.0, "zz", "chase")],
            "k BIGINT, amount DOUBLE, name STRING, data_source STRING",
        ),
    )
    pruned = lake.read_pruned(spark, [("amount", 100.0, 220.0)])
    ks = sorted(r["k"] for r in pruned.collect())
    assert ks == list(range(100, 221)) + [90000]
