"""CLI surface (python -m babylon_data_loader_spark) — the reference's
command interface, driven as a subprocess."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def _run(args: list[str], env_extra: dict | None = None, timeout: int = 300):
    env = dict(os.environ)
    env.update(env_extra or {})
    env["SPARK_GRAFT_CPUS"] = "4"
    return subprocess.run(
        [sys.executable, "-m", "babylon_data_loader_spark", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_cli_generate_then_ingest(tmp_path):
    gen_dir = tmp_path / "gen"
    out = _run(
        [
            "generate-synthetic-data",
            "--rows",
            "10",
            "--seed",
            "3",
            "--dir",
            str(gen_dir),
        ]
    )
    assert out.returncode == 0, out.stderr[-500:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats == {"rows": 10, "target": str(gen_dir)}

    # stage the generated CSV under a synthetic-pattern name and ingest
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    part = next(p for p in os.listdir(gen_dir) if p.endswith(".csv"))
    os.rename(gen_dir / part, in_dir / "synthetic_cli.csv")
    out = _run(
        ["ingest"],
        env_extra={
            "UNPROCESSED_DIR": str(in_dir),
            "LAKE_DIR": str(tmp_path / "lake"),
        },
    )
    assert out.returncode == 0, out.stderr[-500:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["processed_files"] == 1
    assert stats["records_uploaded"] == 10
    assert stats["failures"] == {}


def test_cli_rejects_unknown_command():
    out = _run(["frobnicate"])
    assert out.returncode != 0
    assert "invalid choice" in out.stderr


def test_cli_compact_lake(spark, tmp_path):
    """compact-lake folds append-accumulated version dirs to one per
    partition, through the same atomic commit protocol."""
    from babylon_data_loader_spark.operators.tx_lake import TransactionalLake

    path = str(tmp_path / "lake")
    lake = TransactionalLake(path)
    df = spark.createDataFrame(
        [(1, "a", "chase"), (2, "b", "chase")],
        "k BIGINT, v STRING, data_source STRING",
    )
    lake.append(spark, df)
    lake.append(spark, df)
    assert len(lake.current_manifest()["partitions"]["data_source=chase"]) == 2

    out = _run(["compact-lake", "--path", path])
    assert out.returncode == 0, out.stderr[-500:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["dirs_before"] == 2
    assert stats["dirs_after"] == 1
    assert lake.read(spark).count() == 4


def test_cli_fsck_and_vacuum(spark, tmp_path):
    """fsck-lake reports integrity (exit 1 when broken); vacuum-lake
    prunes history — both straight from the CLI."""
    from babylon_data_loader_spark.operators.tx_lake import TransactionalLake

    path = str(tmp_path / "lake")
    lake = TransactionalLake(path)
    df = spark.createDataFrame(
        [(1, "a", "chase")], "k BIGINT, v STRING, data_source STRING"
    )
    for _ in range(3):
        lake.merge(spark, df, ["k"])

    out = _run(["fsck-lake", "--path", path])
    assert out.returncode == 0
    assert json.loads(out.stdout.strip().splitlines()[-1])["ok"] is True

    out = _run(
        ["vacuum-lake", "--path", path, "--keep-versions", "1",
         "--grace-seconds", "0"]
    )
    assert out.returncode == 0
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(rep["removed_dirs"]) == 2

    # break integrity → exit 1
    import shutil as _shutil

    live = lake.current_manifest()["partitions"]["data_source=chase"][0]
    _shutil.rmtree(os.path.join(path, live))
    out = _run(["fsck-lake", "--path", path])
    assert out.returncode == 1


def test_cli_optimize_layout(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    dst = os.path.join(tmp_path, "dst")
    spark.range(30_000).selectExpr(
        "id", "id % 100 AS k"
    ).coalesce(1).write.parquet(src)

    out = _run(
        ["optimize-layout", src, dst, "--n-files", "4", "--sort-by", "k"]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["rows"] == 30_000
    assert rep["files"] == 4
    assert rep["sorted_by"] == "k"


def test_cli_profile_and_export(tmp_path):
    out = _run(
        ["profile", "/root/testdata/sf0.001/documents.parquet"]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["n_rows"] > 0 and rep["null_doc_id"] == 0

    dst = str(tmp_path / "shards")
    out = _run(
        [
            "export-corpus",
            "/root/testdata/sf0.001/documents.parquet",
            dst,
            "--shard-by",
            "doc_id",
            "--shards",
            "4",
        ]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["rows"] == json.loads(
        _run(["profile", dst]).stdout.strip().splitlines()[-1]
    )["n_rows"]


def test_cli_dataset_card():
    out = _run(
        ["dataset-card", "/root/testdata/sf0.001/documents.parquet"]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    card = json.loads(out.stdout.strip().splitlines()[-1])
    assert card["n_docs"] > 0
    assert card["total_tokens"] > 0
    assert 0.0 <= card["exact_dup_rate"] < 1.0
    assert set(card["mix"]) == {"lang", "source"}
    assert sum(card["mix"]["lang"].values()) == card["n_docs"]


def test_cli_validate_contract(tmp_path):
    """validate: quarantine stats + exit 0 on soft violations; exit 1
    when a fail-action expectation is violated; quarantined rows land
    in --quarantine-dir with their violation names."""
    contract = tmp_path / "contract.json"
    contract.write_text(
        json.dumps(
            [
                {
                    "name": "chars_positive",
                    "predicate": "n_chars > 0",
                    "action": "quarantine",
                },
                {
                    "name": "known_lang",
                    "predicate": "lang IN ('en','de','fr','es','it')",
                    "action": "quarantine",
                },
            ]
        )
    )
    qdir = str(tmp_path / "quarantine")
    out = _run(
        [
            "validate",
            "/root/testdata/sf0.001/documents.parquet",
            str(contract),
            "--quarantine-dir",
            qdir,
        ]
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["n_rows"] > 0 and rep["failed"] == []

    hard = tmp_path / "hard.json"
    hard.write_text(
        json.dumps(
            [
                {
                    "name": "no_src0",
                    "predicate": "source <> 'src0'",
                    "action": "fail",
                }
            ]
        )
    )
    out = _run(
        [
            "validate",
            "/root/testdata/sf0.001/documents.parquet",
            str(hard),
        ]
    )
    assert out.returncode == 1
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["failed"] == ["no_src0"]


def test_cli_run_pipeline(tmp_path):
    """run-pipeline: spec errors exit 2 pre-I/O; a good spec executes
    and reports rows written."""
    spec = tmp_path / "spec.json"
    out = str(tmp_path / "out.parquet")
    spec.write_text(
        json.dumps(
            {
                "source": {
                    "format": "parquet",
                    "path": "/root/testdata/sf0.001/documents.parquet",
                },
                "steps": [
                    {"op": "filter", "predicate": "n_chars > 0"},
                    {"op": "select", "columns": ["doc_id", "lang", "source"]},
                ],
                "sink": {"type": "parquet", "path": out},
            }
        )
    )
    res = _run(["run-pipeline", str(spec)])
    assert res.returncode == 0, res.stderr[-2000:]
    rep = json.loads(res.stdout.strip().splitlines()[-1])
    assert rep["rows_written"] > 0 and rep["sink_path"] == out

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"source": {"path": "x"}}))
    res = _run(["run-pipeline", str(bad)])
    assert res.returncode == 2


def test_cli_validate_aggregate_scope(tmp_path):
    """Aggregate-scope contract entries gate the exit code: a failing
    dataset-level check exits 1 with its name in 'failed'."""
    contract = tmp_path / "agg.json"
    contract.write_text(
        json.dumps(
            [
                {
                    "name": "enough_docs",
                    "scope": "aggregate",
                    "metric": "count(*)",
                    "predicate": "value >= 10",
                },
                {
                    "name": "impossible_volume",
                    "scope": "aggregate",
                    "metric": "sum(n_chars)",
                    "predicate": "value < 0",
                },
            ]
        )
    )
    out = _run(
        [
            "validate",
            "/root/testdata/sf0.001/documents.parquet",
            str(contract),
        ]
    )
    assert out.returncode == 1
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    agg = {s["expectation"]: s["passed"] for s in rep["aggregate_stats"]}
    assert agg == {"enough_docs": True, "impossible_volume": False}
    assert rep["failed"] == ["impossible_volume"]


def test_cli_tag_lake(spark, tmp_path):
    """tag-lake: create, list, and delete tags on a lake by path —
    no Spark session needed (tags are manifest metadata)."""
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    lake_path = str(tmp_path / "lake")
    lake = TransactionalLake(lake_path)
    df = spark.createDataFrame(
        [(1, "a", "chase")], "k BIGINT, v STRING, data_source STRING"
    )
    lake.merge(spark, df, ["k"])

    out = _run(["tag-lake", "release-1", "--path", lake_path])
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["tags"] == {"release-1": 1}

    out = _run(["tag-lake", "--path", lake_path, "--delete", "release-1"])
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["tags"] == {}


def test_cli_delete_from_lake(spark, tmp_path):
    """delete-from-lake applies a SQL predicate delete through the
    atomic commit protocol and reports rows_deleted + new version."""
    from babylon_data_loader_spark.operators.tx_lake import TransactionalLake

    path = str(tmp_path / "lake")
    lake = TransactionalLake(path)
    df = spark.createDataFrame(
        [(1, "a", "chase"), (2, "b", "chase"), (3, "c", "syn")],
        "k BIGINT, v STRING, data_source STRING",
    )
    lake.merge(spark, df, ["k"])

    out = _run(["delete-from-lake", "data_source = 'chase'", "--path", path])
    assert out.returncode == 0, out.stderr[-500:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["rows_deleted"] == 2
    assert stats["version"] == 2
    assert [r["k"] for r in lake.read(spark).collect()] == [3]


def test_cli_query_surface():
    """list-queries needs no Spark session; run-query and
    explain-query drive a registered query end-to-end against the
    sf0.001 testdata; unknown names exit 2."""
    out = _run(["list-queries", "--filter", "q_target_encode"])
    assert out.returncode == 0, out.stderr[-500:]
    rows = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    assert {"q_target_encode"} == {r["name"] for r in rows}
    assert rows[0]["oracle"] is True and rows[0]["doc"]

    out = _run(["run-query", "q_target_encode", "--limit", "2"])
    assert out.returncode == 0, out.stderr[-500:]
    data = [
        json.loads(ln)
        for ln in out.stdout.strip().splitlines()
        if ln.startswith("{")
    ]
    assert len(data) == 2
    assert {"o_orderpriority", "n", "target_mean", "target_enc"} == set(
        data[0]
    )

    out = _run(["explain-query", "q_target_encode"])
    assert out.returncode == 0, out.stderr[-500:]
    assert "== Physical Plan ==" in out.stdout
    assert "Scan parquet" in out.stdout

    out = _run(["run-query", "q_definitely_not_registered"])
    assert out.returncode == 2
