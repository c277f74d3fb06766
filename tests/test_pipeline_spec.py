"""pipeline_spec.py: spec validation is fail-fast and total; the
executed plan matches hand-written DataFrame code; expectations route
to quarantine; the lake_merge sink is a real dedup-upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from babylon_data_loader_spark.pipeline_spec import (
    PipelineSpecError,
    run_pipeline,
    validate_spec,
)


def _events_src(path: str) -> dict:
    return {"format": "parquet", "path": path}


@pytest.fixture()
def events_parquet(spark, tmp_path):
    p = str(tmp_path / "ev.parquet")
    rows = [
        (1, "click", 5.0, 10),
        (2, "view", -1.0, 10),
        (3, "click", 2.0, 20),
        (3, "click", 9.0, 20),  # dup id, higher value survives
        (4, "purchase", 7.0, None),
    ]
    spark.createDataFrame(
        rows, "event_id BIGINT, event_type STRING, value DOUBLE, user_id INT"
    ).write.mode("overwrite").parquet(p)
    return p


def test_validate_rejects_bad_specs(events_parquet):
    bad = [
        ({}, "missing 'source'"),
        ({"source": {"path": "x", "format": "avro"}}, "unknown source"),
        (
            {
                "source": {"path": "x"},
                "steps": [{"op": "explode"}],
                "sink": {"type": "parquet", "path": "y"},
            },
            "unknown op",
        ),
        (
            {
                "source": {"path": "x"},
                "steps": [{"op": "filter"}],
                "sink": {"type": "parquet", "path": "y"},
            },
            "filter needs",
        ),
        (
            {"source": {"path": "x"}, "sink": {"type": "kafka", "path": "y"}},
            "unknown sink",
        ),
        (
            {
                "source": {"path": "x"},
                "sink": {"type": "lake_merge", "path": "y"},
            },
            "needs 'key'",
        ),
    ]
    for spec, msg in bad:
        with pytest.raises(PipelineSpecError, match=msg):
            validate_spec(spec)


def test_pipeline_matches_handwritten_plan(spark, events_parquet, tmp_path):
    out = str(tmp_path / "out.parquet")
    spec = {
        "source": _events_src(events_parquet),
        "steps": [
            {"op": "filter", "predicate": "value > 0"},
            {"op": "with_column", "name": "v2", "expr": "value * 2"},
            {"op": "rename", "columns": {"event_type": "kind"}},
            {"op": "drop", "columns": ["user_id"]},
            {"op": "dedup", "keys": ["event_id"], "keep_max_by": "value"},
        ],
        "sink": {"type": "parquet", "path": out},
    }
    stats = run_pipeline(spark, spec)
    got = {
        (r["event_id"], r["kind"], r["value"], r["v2"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, "click", 5.0, 10.0),
        (3, "click", 9.0, 18.0),
        (4, "purchase", 7.0, 14.0),
    }
    assert stats["rows_written"] == 3


def test_pipeline_expectations_quarantine(spark, events_parquet, tmp_path):
    out = str(tmp_path / "out.parquet")
    qdir = str(tmp_path / "quarantine")
    spec = {
        "source": _events_src(events_parquet),
        "steps": [
            {
                "op": "expectations",
                "contract": [
                    {"name": "value_pos", "predicate": "value > 0"},
                    {
                        "name": "has_user",
                        "predicate": "user_id IS NOT NULL",
                    },
                ],
                "quarantine_path": qdir,
            }
        ],
        "sink": {"type": "parquet", "path": out},
    }
    stats = run_pipeline(spark, spec)
    assert stats["rows_written"] == 3 and stats["quarantined"] == 2
    quar = {
        r["event_id"]: r["violations"]
        for r in spark.read.parquet(qdir).collect()
    }
    assert quar == {2: "value_pos", 4: "has_user"}


def test_pipeline_fail_action_aborts_before_sink(
    spark, events_parquet, tmp_path
):
    from babylon_data_loader_spark.operators.expectations import (
        FailedExpectationError,
    )

    out = tmp_path / "never.parquet"
    spec = {
        "source": _events_src(events_parquet),
        "steps": [
            {
                "op": "expectations",
                "contract": [
                    {
                        "name": "value_pos",
                        "predicate": "value > 0",
                        "action": "fail",
                    }
                ],
            }
        ],
        "sink": {"type": "parquet", "path": str(out)},
    }
    with pytest.raises(FailedExpectationError):
        run_pipeline(spark, spec)
    assert not out.exists()  # abort happened before the sink wrote


def test_pipeline_lake_merge_sink_is_upsert(spark, events_parquet, tmp_path):
    lake = str(tmp_path / "lake")
    spec = {
        "source": _events_src(events_parquet),
        "steps": [{"op": "filter", "predicate": "value > 0"}],
        "sink": {
            "type": "lake_merge",
            "path": lake,
            "key": ["event_id"],
            "partition_col": "event_type",
        },
    }
    stats = run_pipeline(spark, spec)
    assert stats["rows_written"] == 4  # 1, 3 (two rows same key), 4
    # idempotence: re-running the same spec converges to same state
    stats2 = run_pipeline(spark, spec)
    assert stats2["rows_written"] == stats["rows_written"]


def test_bare_string_key_is_wrapped_not_split(spark, events_parquet, tmp_path):
    """ADVICE r4 (low): a JSON string key ('event_id') must be treated
    as a one-column key, not split by list() into characters."""
    spec = {
        "source": _events_src(events_parquet),
        "steps": [],
        "sink": {
            "type": "lake_merge",
            "path": str(tmp_path / "lake"),
            "key": "event_id",  # bare string, not a list
            "partition_col": "event_type",
        },
    }
    validate_spec(spec)
    assert spec["sink"]["key"] == ["event_id"]  # normalized in place
    stats = run_pipeline(spark, spec)
    # merge keeps a batch's own rows (5, incl. the event_id=3 pair);
    # the point here is the key resolved as ONE column — a split key
    # ('e','v','e','n',...) would be an unresolved-column failure
    assert stats["rows_written"] == 5
    # re-running is an idempotent upsert, not an append
    assert run_pipeline(spark, spec)["rows_written"] == 5

    # non-string / empty keys are spec errors, not unresolved columns
    for bad_key in (123, [], ["ok", ""], [1, 2]):
        bad = {
            "source": _events_src(events_parquet),
            "sink": {
                "type": "lake_merge",
                "path": "y",
                "key": bad_key,
                "partition_col": "event_type",
            },
        }
        with pytest.raises(PipelineSpecError, match="needs 'key'"):
            validate_spec(bad)


def test_lake_merge_sink_respects_recorded_partition_col(
    spark, events_parquet, tmp_path
):
    """ADVICE r4 (low): the lake_merge sink must open() the lake and
    refuse a spec whose partition_col disagrees with the recorded one
    (the silent duplicate-key corruption mode)."""
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    path = str(tmp_path / "lake")
    spec = {
        "source": _events_src(events_parquet),
        "steps": [],
        "sink": {
            "type": "lake_merge",
            "path": path,
            "key": ["event_id"],
            "partition_col": "event_type",
        },
    }
    run_pipeline(spark, spec)
    TransactionalLake.open(
        path, partition_col="event_type"
    ).migrate_partitioning(spark, "user_id")

    with pytest.raises(ValueError, match="records partition_col"):
        run_pipeline(spark, spec)

    spec["sink"]["partition_col"] = "user_id"
    stats = run_pipeline(spark, spec)  # agrees with recorded: fine
    assert stats["rows_written"] == 5
