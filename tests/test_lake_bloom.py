"""Bloom-filter sidecar: point lookups must skip files with no false
negatives, and versions without sidecars must read whole."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from babylon_data_loader_spark.operators.lake_bloom import bloom_keep_files
from babylon_data_loader_spark.operators.tx_lake import TransactionalLake


def _build(spark, path):
    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        (F.col("id") * 3).alias("v"),
    )
    lake = TransactionalLake(
        path,
        partition_col="part",
        bloom_cols=["k"],
        cluster_by=["v"],
        cluster_files=6,
    )
    lake.merge(spark, df, key=["k"])
    return lake


def test_lookup_exact_and_skipping(spark, tmp_path):
    lake = _build(spark, os.path.join(tmp_path, "lake"))
    got = lake.read_lookup(spark, "k", 12345).collect()
    assert [(r["k"], r["v"]) for r in got] == [(12345, 37035)]
    # missing key → empty, not an error
    assert lake.read_lookup(spark, "k", 10**9).count() == 0

    # skipping engaged: the bloom keeps strictly fewer files than exist
    man = lake.current_manifest()
    d = next(iter({x for ds in man["partitions"].values() for x in ds}))
    base = os.path.join(lake.lake_path, d)
    subdirs = sorted(
        s for s, ds in man["partitions"].items() if d in ds
    )
    kept = bloom_keep_files(spark, base, subdirs, "k", 12345)
    total = sum(
        1
        for s in subdirs
        for f in os.listdir(os.path.join(base, s))
        if f.endswith(".parquet")
    )
    assert kept is not None
    assert sum(len(v) for v in kept.values()) < total


def test_no_false_negatives_across_key_sample(spark, tmp_path):
    lake = _build(spark, os.path.join(tmp_path, "lake2"))
    for k in (0, 7, 1999, 19_999, 4242):
        assert lake.read_lookup(spark, "k", k).count() == 1, k


def test_bloomless_version_reads_whole(spark, tmp_path):
    path = os.path.join(tmp_path, "lake3")
    df = spark.range(500).select(
        F.col("id").alias("k"), F.lit("a").alias("part")
    )
    TransactionalLake(path, partition_col="part").merge(
        spark, df, key=["k"]
    )
    # no bloom_cols at write time → lookup still exact
    lake = TransactionalLake(path, partition_col="part")
    assert lake.read_lookup(spark, "k", 77).count() == 1
