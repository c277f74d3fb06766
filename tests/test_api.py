"""apiClient-surface functions (SURVEY.md §2.4) + stats frame."""

from __future__ import annotations



def test_add_transaction_and_lookup(spark, tmp_path):
    from babylon_data_loader_spark.api import (
        add_transaction,
        get_transaction_by_id,
    )

    lake = str(tmp_path / "lake")
    txn = {
        "details": "DEBIT",
        "posting_date": "01/05/2024",
        "description": "api insert",
        "amount": -12.5,
        "category": "api",
        "type": "egress",
        "balance": 100.0,
        "check_or_slip_num": "",
        "data_source": "chase",
        "account_id": "1234",
    }
    txn_id = add_transaction(spark, lake, txn)
    assert len(txn_id) == 36  # uuid
    from babylon_data_loader_spark.sources.parquet_lake import (
        read_transactions,
    )

    stored = read_transactions(spark, lake)
    hit = get_transaction_by_id(stored, txn_id, "egress").collect()
    assert len(hit) == 1
    assert hit[0]["amount"] == -12.5
    miss = get_transaction_by_id(stored, txn_id, "ingress").collect()
    assert miss == []


def test_get_transaction_history(spark):
    from babylon_data_loader_spark.api import get_transaction_history
    from babylon_data_loader_spark.schemas import events_with_time, load_table

    ev = events_with_time(
        load_table(spark, "/root/testdata/sf0.001", "events")
    ).withColumnRenamed("event_type", "type")
    out = get_transaction_history(
        ev, "purchase", 1704844800, 1705708800
    )
    rows = out.collect()
    assert rows
    assert all(r["type"] == "purchase" for r in rows)
    assert all(
        1704844800_000000 <= r["ts_us"] <= 1705708800_000000 for r in rows
    )


def test_do_echo(spark):
    from babylon_data_loader_spark.api import do_echo

    assert do_echo(spark, "hello") == "hello"


def test_stats_frame(spark):
    from babylon_data_loader_spark.ingest.pipeline import IngestResult

    r = IngestResult(
        total_files=3,
        processed_files=1,
        failed_files=2,
        records_uploaded=10,
        failures={"a.txt": "not a csv file", "b.csv": "no valid transactions"},
    )
    row = r.to_frame(spark).collect()[0]
    assert row["total_files"] == 3
    assert row["failures"]["a.txt"] == "not a csv file"
    assert len(row["failures"]) == 2

    empty = IngestResult().to_frame(spark).collect()[0]
    assert empty["failures"] == {}


def test_lake_partition_pruning(spark, tmp_path):
    """Reading one data_source must prune to that partition — the
    physical analog of the reference's per-source collections."""
    from babylon_data_loader_spark.sources.parquet_lake import (
        read_transactions,
    )

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("a", 1.0, "chase"), ("b", 2.0, "synthetic")],
        ["details", "amount", "data_source"],
    )
    df.write.partitionBy("data_source").parquet(lake)
    pruned = read_transactions(spark, lake, data_source="chase")
    assert [r["details"] for r in pruned.collect()] == ["a"]
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert part_line and "data_source" in part_line[0]


def test_api_error_contract():
    """Status→error mapping parity with apiClient.go (round-1 VERDICT
    missing #3): echo's 400/500 special case vs the >=400 rule of the
    history endpoints, and AddTransaction's 201 success code."""
    import pytest

    from babylon_data_loader_spark.api import (
        BabylonAPIError,
        BodyUnmarshallError,
        UnexpectedStatusCodeError,
        classify_response,
    )

    ok = {"value": "hi"}
    assert classify_response("echo", 200, ok) is ok
    # echo: 400/500 surface the server message...
    with pytest.raises(BabylonAPIError, match="boom"):
        classify_response("echo", 400, {"message": "boom"})
    with pytest.raises(BabylonAPIError, match="boom"):
        classify_response("echo", 500, {"message": "boom"})
    # ...but 404 (>=400!) is NOT special-cased for echo (.go:161-168)
    with pytest.raises(UnexpectedStatusCodeError) as e404:
        classify_response("echo", 404, {"message": "ignored"})
    assert e404.value.status_code == 404
    # history endpoints: every >=400 is a domain error
    with pytest.raises(BabylonAPIError, match="nope"):
        classify_response("get_transaction", 404, {"message": "nope"})
    with pytest.raises(BabylonAPIError):
        classify_response("get_history", 503, {"message": "down"})
    with pytest.raises(UnexpectedStatusCodeError):
        classify_response("get_history", 302, {})
    # add_transaction succeeds on 201, not 200 (.go:282-301)
    created = {"transactionId": "x"}
    assert classify_response("add_transaction", 201, created) is created
    with pytest.raises(BabylonAPIError, match="bad txn"):
        classify_response("add_transaction", 400, {"message": "bad txn"})
    with pytest.raises(UnexpectedStatusCodeError):
        classify_response("add_transaction", 200, created)
    # malformed error body = unmarshall failure, not a silent pass
    with pytest.raises(BodyUnmarshallError):
        classify_response("get_transaction", 400, None)
