"""Scale-shape checks: many-file ingest stays a constant number of
Spark jobs, and the scan parallelizes across files."""

from __future__ import annotations

import os


def test_many_files_one_scan_per_header_group(spark, tmp_path):
    from babylon_data_loader_spark.config import EngineConfig
    from babylon_data_loader_spark.ingest import ingest
    from babylon_data_loader_spark.sources.csv_source import group_by_header

    header_a = "Details,Posting Date,Description,Category,Amount,Type,Balance,Check or Slip #"
    header_b = "Amount,Description,Posting Date,Details,Category,Type,Balance,Check or Slip #"
    in_dir = tmp_path / "many"
    in_dir.mkdir()
    n_files = 120
    for i in range(n_files):
        header = header_a if i % 3 else header_b
        row = (
            f'D{i},01/0{1 + i % 9}/2024,"doc {i}",c,-{i}.25,T,1.0,'
            if i % 3
            else f'-{i}.25,"doc {i}",01/0{1 + i % 9}/2024,D{i},c,T,1.0,'
        )
        (in_dir / f"chase{1000 + i}.csv").write_text(f"{header}\n{row}\n")

    groups = group_by_header(
        [str(in_dir / f) for f in sorted(os.listdir(in_dir))]
    )
    # 120 files collapse into exactly 2 distributed scans
    assert len(groups) == 2
    assert sum(len(g.paths) for g in groups) == n_files

    cfg = EngineConfig(
        unprocessed_dir=str(in_dir),
        processed_dir=str(tmp_path / "done"),
        lake_dir=str(tmp_path / "lake"),
    )
    result = ingest(spark, cfg)
    assert result.processed_files == n_files
    assert result.records_uploaded == n_files
    from babylon_data_loader_spark.sources.parquet_lake import (
        read_transactions,
    )

    lake = read_transactions(spark, cfg.transactions_path)
    assert lake.count() == n_files
    # every file's account id landed
    accounts = {r["account_id"] for r in lake.select("account_id").collect()}
    assert len(accounts) == n_files


def test_distributed_header_sniff_many_files(spark, tmp_path):
    """Past the threshold, header sniffing runs as a Spark job over
    path rows instead of serializing through driver file handles —
    10⁴ files must group correctly in bounded time."""
    import time

    from babylon_data_loader_spark.sources.csv_source import group_by_header

    header_a = "Details,Posting Date,Amount"
    header_b = "Amount,Details,Posting Date"
    in_dir = tmp_path / "lots"
    in_dir.mkdir()
    n_files = 10_000
    for i in range(n_files):
        (in_dir / f"chase{i:05d}.csv").write_text(
            f"{header_a if i % 2 else header_b}\nD,01/01/2024,-1.0\n"
        )
    paths = [str(in_dir / f) for f in sorted(os.listdir(in_dir))]
    t0 = time.time()
    groups = group_by_header(paths, spark=spark)  # over threshold → job
    elapsed = time.time() - t0
    assert len(groups) == 2
    assert sum(len(g.paths) for g in groups) == n_files
    # aligned path↔header association survives the distributed map
    by_cols = {g.columns: g for g in groups}
    a = by_cols[tuple(c.lower() for c in header_a.split(","))]
    assert all(
        int(os.path.basename(p)[5:10]) % 2 == 1 for p in a.paths
    )
    assert elapsed < 120, f"distributed sniff too slow: {elapsed:.1f}s"


def test_distributed_sniff_keeps_header_strings_off_driver(spark, tmp_path):
    """The distributed grouping returns signatures + path assignments
    only (header_lines=None — per-file raw lines stay on executors),
    and read_header_group re-derives the header build side with a
    distributed one-line read: end-to-end rows must still parse, and
    each file's header line must still be dropped."""
    import os as _os

    from babylon_data_loader_spark.sources.csv_source import (
        group_by_header,
        read_header_group,
    )

    in_dir = tmp_path / "dist"
    in_dir.mkdir()
    for i in range(40):
        # case-varied headers: same signature, different raw lines
        hdr = "Details,Amount" if i % 2 else "DETAILS,AMOUNT"
        (in_dir / f"chase{i:04d}.csv").write_text(
            f"{hdr}\nD{i},-{i}.0\n"
        )
    paths = [str(in_dir / f) for f in sorted(_os.listdir(in_dir))]
    groups = group_by_header(paths, spark=spark, distributed_threshold=10)
    assert len(groups) == 1
    assert groups[0].header_lines is None  # no raw lines at the driver

    df = read_header_group(spark, groups[0])
    rows = df.collect()
    assert len(rows) == 40  # one data row per file, headers dropped
    assert {r["details"] for r in rows} == {f"D{i}" for i in range(40)}


def test_global_rank_at_millions_no_single_task_sort(spark):
    """The two-pass ranking must hold its shape at millions of rows:
    no WindowExec with an empty partition spec in the plan, and the
    result is a valid permutation with correct boundary ordering —
    checked by invariants (no reference global window is computed
    here; byte-parity vs the window is pinned at small scale in
    test_rank, and a 2M-row single-task sort is exactly what the
    operator exists to avoid)."""
    from pyspark.sql import functions as F

    from babylon_data_loader_spark.operators.rank import (
        global_row_number_with_total,
    )

    n = 2_000_000
    df = spark.range(n).select(
        F.col("id"),
        (F.hash("id") % 1000).alias("v"),  # 1000-value tie-heavy column
    )
    ranked, total = global_row_number_with_total(
        df, [F.col("v").asc(), F.col("id").asc()], "rn"
    )
    assert total == n

    plan = ranked._sc._jvm.PythonSQLUtils.explainString(
        ranked._jdf.queryExecution(), "formatted"
    )
    # every Window node is partitioned by the pinned partition id
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__rank_pid" in line

    stats = ranked.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("rn").alias("distinct_rn"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.sum(F.col("rn").cast("decimal(28,0)")).alias("s"),
    ).first()
    assert stats["cnt"] == n == stats["distinct_rn"]
    assert (stats["lo"], stats["hi"]) == (1, n)
    assert int(stats["s"]) == n * (n + 1) // 2  # exact permutation
    # rank order agrees with the value order: per-rank-adjacent check
    # via a self-join on rn+1 would shuffle 2M rows; the permutation +
    # per-value contiguity invariant below pins correctness instead
    per_v = ranked.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"),
        (F.max("rn") - F.min("rn") + 1).alias("span"),
    )
    assert per_v.filter(F.col("c") != F.col("span")).count() == 0


def test_grouped_scan_at_millions_few_groups_no_single_task(spark):
    """grouped_running_totals exists for the FEW-group case (5 event
    types over a fact table) where Window.partitionBy(group) would
    sort each group in one task. At 2M rows / 5 groups: every window
    in the plan is partitioned by the pinned partition id, and the
    per-group running count is an exact 1..N_g permutation."""
    from pyspark.sql import functions as F

    from babylon_data_loader_spark.operators.rank import (
        grouped_running_totals,
    )

    n = 2_000_000
    df = spark.range(n).select(
        F.col("id"),
        (F.hash("id") % 5).alias("g"),  # 5 groups, fact-table shape
    )
    out = grouped_running_totals(
        df, ["g"], [F.col("id").asc()], {"rn": F.lit(1)}
    )

    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__rank_pid" in line

    per_g = out.groupBy("g").agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("rn").alias("d"),
        F.min("rn").alias("lo"),
        F.max("rn").alias("hi"),
        F.sum(F.col("rn").cast("decimal(28,0)")).alias("s"),
    )
    for r in per_g.collect():
        assert r["c"] == r["d"] == r["hi"]
        assert r["lo"] == 1
        assert int(r["s"]) == r["c"] * (r["c"] + 1) // 2
