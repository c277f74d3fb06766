"""Edge tests for the wave-5 queries on hand-built fixtures: SCD2 run
collapse and tie ordering, fuzzy-join blocking boundaries, the
data-quality suite on a deliberately broken table, NTILE remainder
distribution, and OOV against a python reference of the vocab rule."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F


def _write(spark, tmp_path, table: str, pdf: pd.DataFrame, schema=None):
    df = (
        spark.createDataFrame(pdf, schema)
        if schema
        else spark.createDataFrame(pdf)
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + f"/{table}.parquet")


def test_scd2_collapses_runs_and_closes_intervals(spark, tmp_path):
    """User 0: view,view,click,view → 3 versions; every interval's
    eff_to equals the next version's eff_from; the last is open."""
    from babylon_data_loader_spark.queries.round4e import q_scd2_dimension

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 0, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 0, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 0, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(hours=3), 0, "view", 1.0, "{}"),
        # user 7 is filtered out of the declared result (id % 50 != 0)
        (5, t0, 7, "view", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    _write(spark, tmp_path, "events", pdf)
    out = q_scd2_dimension.__wrapped__(spark, str(tmp_path)).collect()
    assert [(r["user_id"], r["version"], r["event_type"]) for r in out] == [
        (0, 1, "view"),
        (0, 2, "click"),
        (0, 3, "view"),
    ]
    assert out[0]["eff_to_us"] == out[1]["eff_from_us"]
    assert out[1]["eff_to_us"] == out[2]["eff_from_us"]
    assert out[2]["eff_to_us"] is None


def test_scd2_equal_timestamps_ordered_by_event_id(spark, tmp_path):
    """Two events at the SAME timestamp: event_id breaks the tie, so
    the run sequence is deterministic (click@id1 before view@id2)."""
    from babylon_data_loader_spark.queries.round4e import q_scd2_dimension

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 0, "click", 1.0, "{}"),
        (2, t0, 0, "view", 1.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    _write(spark, tmp_path, "events", pdf)
    out = q_scd2_dimension.__wrapped__(spark, str(tmp_path)).collect()
    assert [(r["version"], r["event_type"]) for r in out] == [
        (1, "click"),
        (2, "view"),
    ]


def test_fuzzy_join_respects_blocks_and_distance_band(spark, tmp_path):
    """'old ring'~'cold ring' (d=1) pairs; 'old king' (other block)
    never pairs with 'old ring' despite d=1; identical names (d=0)
    are excluded; record counts aggregate per name."""
    from babylon_data_loader_spark.queries.round4e import q_fuzzy_join

    names = ["old ring", "old ring", "cold ring", "old king", "zzz ring"]
    pdf = pd.DataFrame(
        {
            "p_partkey": range(len(names)),
            "p_name": names,
            "p_brand": ["B"] * len(names),
            "p_type": ["T"] * len(names),
            "p_size": [1] * len(names),
            "p_retailprice": [1.0] * len(names),
        }
    )
    _write(spark, tmp_path, "part", pdf)
    out = q_fuzzy_join.__wrapped__(spark, str(tmp_path)).collect()
    assert [(r["name_a"], r["name_b"], r["edit_dist"], r["n_a"], r["n_b"])
            for r in out] == [("cold ring", "old ring", 1, 1, 2)]


def test_data_quality_flags_every_broken_constraint(spark, tmp_path):
    """A table violating all five constraints at once: each row of the
    suite reports the exact violation fraction and passed=False."""
    from babylon_data_loader_spark.queries.round4e import q_data_quality

    t0 = dt.datetime(2024, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 1, 2, 3],  # dup key
            "o_custkey": pd.array([10, 10, 99, None], dtype="Int64"),
            "o_orderstatus": ["F", "O", "X", "F"],  # X not accepted
            "o_totalprice": [5.0, -1.0, 5.0, 5.0],  # one negative
            "o_orderdate": [t0] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [10],
            "c_name": ["c"],
            "c_nationkey": [0],
            "c_acctbal": [0.0],
            "c_mktsegment": ["m"],
        }
    )
    _write(spark, tmp_path, "orders", orders)
    _write(spark, tmp_path, "customer", customer)
    out = {
        r["constraint_name"]: (r["metric"], r["passed"])
        for r in q_data_quality.__wrapped__(spark, str(tmp_path)).collect()
    }
    assert out["completeness_custkey"] == (0.75, False)
    assert out["uniqueness_orderkey"] == (0.75, False)
    assert out["range_totalprice_nonneg"] == (0.75, False)
    assert out["accepted_values_status"] == (0.75, False)
    # one orphan (99) + one NULL custkey (anti-join keeps NULL too):
    # 1 - 2/4 = 0.5
    assert out["referential_custkey"] == (0.5, False)


def test_equal_freq_binning_remainder_distribution(spark, tmp_path):
    """25 rows into 10 bins: the first 5 bins take 3 rows, the rest 2
    (SQL NTILE remainder rule); bin ranges are non-overlapping and
    ordered."""
    from babylon_data_loader_spark.queries.round4e import (
        q_equal_freq_binning,
    )

    t0 = dt.datetime(2024, 1, 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": range(25),
            "o_custkey": [1] * 25,
            "o_orderstatus": ["F"] * 25,
            "o_totalprice": [float(100 - i) for i in range(25)],
            "o_orderdate": [t0] * 25,
            "o_orderpriority": ["1-URGENT"] * 25,
        }
    )
    _write(spark, tmp_path, "orders", orders)
    out = q_equal_freq_binning.__wrapped__(spark, str(tmp_path)).collect()
    assert [r["n"] for r in out] == [3, 3, 3, 3, 3, 2, 2, 2, 2, 2]
    for prev, cur in zip(out, out[1:]):
        assert prev["hi"] < cur["lo"]


def test_oov_rate_matches_python_reference(spark, tmp_path):
    """Corpus with >100 distinct tokens: per-doc OOV must match a
    python re-implementation of the exact vocab rule (count desc,
    token asc, top 100)."""
    from collections import Counter

    from babylon_data_loader_spark.queries.round4e import q_oov_rate

    docs = []
    for i in range(30):
        toks = [f"tok{j:03d}" for j in range(i, i + 80)] + ["common"] * 5
        docs.append((i, " ".join(toks)))
    pdf = pd.DataFrame(
        {
            "doc_id": [d[0] for d in docs],
            "text": [d[1] for d in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(d[1]) for d in docs],
        }
    )
    _write(spark, tmp_path, "documents", pdf)

    counts = Counter()
    for _i, text in docs:
        counts.update(text.split())
    assert len(counts) > 100
    vocab = {
        t
        for t, _c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :100
        ]
    }
    out = q_oov_rate.__wrapped__(spark, str(tmp_path)).collect()
    for r in out:
        toks = dict(docs)[r["doc_id"]].split()
        expected_oov = sum(1 for t in toks if t not in vocab)
        assert (r["n_tokens"], r["n_oov"]) == (len(toks), expected_oov)


# expectations operator -------------------------------------------------------


def _exp_fixture(spark):
    rows = [
        (1, 10.0, "F"),
        (2, -5.0, "F"),   # violates price
        (3, 10.0, "X"),   # violates status
        (4, -1.0, "X"),   # violates both
        (5, None, "F"),   # NULL predicate result -> violation
    ]
    return spark.createDataFrame(rows, "id BIGINT, price DOUBLE, status STRING")


def test_expectations_routing_and_stats(spark):
    from babylon_data_loader_spark.operators.expectations import (
        Expectation,
        apply_expectations,
    )

    res = apply_expectations(
        _exp_fixture(spark),
        [
            Expectation("price_ok", "price >= 0", "quarantine"),
            Expectation("status_ok", "status IN ('F','O')", "quarantine"),
        ],
    )
    assert {r["id"] for r in res.passed.collect()} == {1}
    quar = {r["id"]: sorted(r["violations"]) for r in res.quarantined.collect()}
    # row 4 fails both but appears ONCE, with both names
    assert quar == {
        2: ["price_ok"],
        3: ["status_ok"],
        4: ["price_ok", "status_ok"],
        5: ["price_ok"],
    }
    stats = {
        r["expectation"]: (r["action"], r["n_violations"])
        for r in res.stats.collect()
    }
    assert stats == {
        "price_ok": ("quarantine", 3),
        "status_ok": ("quarantine", 2),
    }


def test_expectations_drop_action_removes_silently(spark):
    from babylon_data_loader_spark.operators.expectations import (
        Expectation,
        apply_expectations,
    )

    res = apply_expectations(
        _exp_fixture(spark),
        [Expectation("price_ok", "price >= 0", "drop")],
    )
    assert {r["id"] for r in res.passed.collect()} == {1, 3}
    assert res.quarantined.count() == 0  # drop != quarantine


def test_expectations_fail_action_aborts(spark):
    import pytest

    from babylon_data_loader_spark.operators.expectations import (
        Expectation,
        FailedExpectationError,
        enforce,
    )

    with pytest.raises(FailedExpectationError, match="price_ok"):
        enforce(
            spark,
            _exp_fixture(spark),
            [Expectation("price_ok", "price >= 0", "fail")],
        )
    # no violations -> no raise, stats materialized
    res = enforce(
        spark,
        _exp_fixture(spark).filter("id = 1"),
        [Expectation("price_ok", "price >= 0", "fail")],
    )
    assert res.passed.count() == 1
    assert res.stats.count() == 0


def test_expectations_validate_inputs(spark):
    import pytest

    from babylon_data_loader_spark.operators.expectations import (
        Expectation,
        apply_expectations,
    )

    with pytest.raises(ValueError, match="unknown action"):
        apply_expectations(
            _exp_fixture(spark), [Expectation("x", "true", "explode")]
        )
    with pytest.raises(ValueError, match="duplicate"):
        apply_expectations(
            _exp_fixture(spark),
            [Expectation("x", "true"), Expectation("x", "false")],
        )


# stream-stream left outer join boundary --------------------------------------


def test_stream_left_outer_boundary(spark, tmp_path):
    """Pins the watermark-eviction boundary of the left-outer
    stream-stream join: with within=10min and delay=10min over
    time-ordered files whose final watermark lands at minute 50, the
    unmatched click at minute 0 (window end 10 < 50) IS emitted with
    NULL, the unmatched click at minute 40 (window end 50 == 50, the
    exact boundary) is WITHHELD — strict < — and the click at 55 is
    withheld. Matched pairs emit regardless."""
    import datetime as dt
    import os
    import shutil

    from babylon_data_loader_spark.streaming.joins import (
        attribute_purchases,
    )

    t0 = dt.datetime(2024, 1, 1)

    def m(mins):
        return t0 + dt.timedelta(minutes=mins)

    files = [
        [(1, m(0), 1, "click"), (2, m(5), 2, "click"),
         (3, m(8), 2, "purchase"), (4, m(0), 5, "purchase")],
        [(5, m(40), 3, "click"), (6, m(45), 8, "purchase")],
        [(7, m(55), 4, "click"), (8, m(60), 9, "click"),
         (9, m(61), 9, "purchase")],
    ]
    schema = (
        "event_id BIGINT, ts_ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(files, 1):
        p = os.path.join(src, f"{i:03d}.parquet")
        tmp = p + ".tmpdir"
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), p)
        shutil.rmtree(tmp)
        os.utime(p, (1_000_000_000 + i, 1_000_000_000 + i))

    sch = spark.read.parquet(src).schema

    def side(t):
        s = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return s.filter(F.col("event_type") == t)

    out = attribute_purchases(
        side("click"),
        side("purchase"),
        within="10 minutes",
        watermark="10 minutes",
        how="left",
    )
    sink = str(tmp_path / "sink")
    (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(1, None), (2, 3), (8, 9)}


def test_aggregate_expectations_one_pass(spark):
    """Dataset-level checks: all metrics in one agg; NULL metric
    (avg of empty set) fails its check."""
    from babylon_data_loader_spark.operators.expectations import (
        AggExpectation,
        check_aggregates,
    )

    df = _exp_fixture(spark)
    got = {
        r["expectation"]: (r["value"], r["passed"])
        for r in check_aggregates(
            spark,
            df,
            [
                AggExpectation("enough_rows", "count(*)", "value >= 3"),
                AggExpectation(
                    "avg_price_band",
                    "avg(price)",
                    "value BETWEEN -10 AND 10",
                ),
                AggExpectation(
                    "max_price_cap", "max(price)", "value <= 5"
                ),
                AggExpectation(
                    "avg_of_nothing",
                    "avg(CASE WHEN id > 99 THEN price END)",
                    "value > 0",
                ),
            ],
        ).collect()
    }
    assert got["enough_rows"] == (5.0, True)
    assert got["avg_price_band"] == (3.5, True)  # (10-5+10-1)/4
    assert got["max_price_cap"] == (10.0, False)
    assert got["avg_of_nothing"] == (None, False)


def test_aggregate_expectations_reject_duplicate_names(spark):
    import pytest

    from babylon_data_loader_spark.operators.expectations import (
        AggExpectation,
        check_aggregates,
    )

    with pytest.raises(ValueError, match="duplicate"):
        check_aggregates(
            spark,
            _exp_fixture(spark),
            [
                AggExpectation("x", "count(*)", "value > 0"),
                AggExpectation("x", "max(price)", "value > 0"),
            ],
        )
