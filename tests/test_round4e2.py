"""Edge tests for the behavioral/IR/stat queries on hand-built
fixtures: sequence-order determinism, Markov counts, Gini extremes,
first-seen cumulative uniqueness, and phrase adjacency."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    pdf = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path) + "/events.parquet"
    )


def test_sequence_pattern_order_and_ties(spark, tmp_path):
    """User 1: view,click,view,purchase matches v[^p]*vp; user 2's
    purchase-before-view does not; equal timestamps order by
    event_id (3 before 4)."""
    from babylon_data_loader_spark.queries.round4f import (
        q_sequence_pattern,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=2), 1, "purchase", 1.0, "{}"),
        (5, t0, 2, "purchase", 1.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_sequence_pattern.__wrapped__(spark, str(tmp_path)).collect()[0]
    assert (out["n_users"], out["n_matching"], out["total_events"]) == (
        2,
        1,
        6,
    )


def test_markov_transition_counts(spark, tmp_path):
    """view->view twice, view->purchase once for user 1; user 2
    contributes view->click; probabilities are per-from-type."""
    from babylon_data_loader_spark.queries.round4f import (
        q_markov_transitions,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "view", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 1, "purchase", 1.0, "{}"),
        (5, t0, 2, "view", 1.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "click", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        (r["from_type"], r["to_type"]): (r["c"], r["p"])
        for r in q_markov_transitions.__wrapped__(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        ("view", "view"): (2, 0.5),
        ("view", "purchase"): (1, 0.25),
        ("view", "click"): (1, 0.25),
    }


def test_gini_extremes(spark, tmp_path):
    """Equal spend across n customers → Gini 0; total concentration
    in one customer → (n−1)/n."""
    from babylon_data_loader_spark.queries.round4f import q_gini

    t0 = dt.datetime(2024, 1, 1)

    def orders(prices):
        return pd.DataFrame(
            {
                "o_orderkey": range(len(prices)),
                "o_custkey": range(len(prices)),
                "o_orderstatus": ["F"] * len(prices),
                "o_totalprice": prices,
                "o_orderdate": [t0] * len(prices),
                "o_orderpriority": ["1-URGENT"] * len(prices),
            }
        )

    spark.createDataFrame(orders([10.0, 10.0, 10.0, 10.0])).write.mode(
        "overwrite"
    ).parquet(str(tmp_path) + "/orders.parquet")
    out = q_gini.__wrapped__(spark, str(tmp_path)).collect()[0]
    assert out["gini"] == 0.0

    spark.createDataFrame(orders([0.0, 0.0, 0.0, 100.0])).write.mode(
        "overwrite"
    ).parquet(str(tmp_path) + "/orders.parquet")
    out = q_gini.__wrapped__(spark, str(tmp_path)).collect()[0]
    assert out["gini"] == 0.75  # (n-1)/n with n=4


def test_cumulative_uniques_first_seen_only(spark, tmp_path):
    """A user active on three days counts once, on their first day."""
    from babylon_data_loader_spark.queries.round4f import (
        q_cumulative_uniques,
    )

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, d0, 1, "view", 1.0, "{}"),
        (2, d0 + dt.timedelta(days=1), 1, "view", 1.0, "{}"),
        (3, d0 + dt.timedelta(days=2), 1, "view", 1.0, "{}"),
        (4, d0 + dt.timedelta(days=1), 2, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_cumulative_uniques.__wrapped__(spark, str(tmp_path)).collect()
    assert [
        (r["new_users"], r["cumulative_users"]) for r in out
    ] == [(1, 1), (1, 2)]


def test_phrase_search_adjacency(spark, tmp_path):
    """'data table data table' → 2 hits; reversed order no hit; the
    phrase spanning a doc boundary never matches."""
    from babylon_data_loader_spark.queries.round4f import q_phrase_search

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "data table data table",
                "table data table data",
                "data x table",
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [21, 21, 12],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path) + "/documents.parquet"
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in q_phrase_search.__wrapped__(spark, str(tmp_path)).collect()
    }
    assert out == {1: 2, 2: 1}


def test_changepoint_detects_level_shift(spark, tmp_path):
    """10 days at 2 events/day then 10 days at 8/day: the scaled
    CUSUM peaks exactly at the last low day."""
    from babylon_data_loader_spark.queries.round4f import q_changepoint

    d0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(20):
        per_day = 2 if day < 10 else 8
        for k in range(per_day):
            eid += 1
            rows.append(
                (eid, d0 + dt.timedelta(days=day, minutes=k), 1,
                 "view", 1.0, "{}")
            )
    _write_events(spark, tmp_path, rows)
    out = q_changepoint.__wrapped__(spark, str(tmp_path)).collect()[0]
    day0 = int(
        (d0 - dt.datetime(1970, 1, 1)).total_seconds() // 86400
    )
    assert out["changepoint_day"] == day0 + 9  # last low day


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A strictly periodic view->click->view->click stream has
    H(next|current) = 0 — every transition is certain."""
    from babylon_data_loader_spark.queries.round4f import q_entropy_rate

    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, d0 + dt.timedelta(minutes=i), 1,
         "view" if i % 2 == 0 else "click", 1.0, "{}")
        for i in range(40)
    ]
    _write_events(spark, tmp_path, rows)
    out = q_entropy_rate.__wrapped__(spark, str(tmp_path)).collect()[0]
    assert out["n_transitions"] == 39
    assert out["entropy_rate_nats"] == 0.0


def test_abc_classification_concentrated_spend(spark, tmp_path):
    """One whale at 80 and four minnows at 5: the whale alone covers
    exactly 80% (class A), the next two reach 95% (class B), the rest
    C."""
    from babylon_data_loader_spark.queries.round4f import (
        q_abc_classification,
    )

    t0 = dt.datetime(2024, 1, 1)
    prices = [80.0, 5.0, 5.0, 5.0, 5.0]
    orders = pd.DataFrame(
        {
            "o_orderkey": range(5),
            "o_custkey": range(5),
            "o_orderstatus": ["F"] * 5,
            "o_totalprice": prices,
            "o_orderdate": [t0] * 5,
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        str(tmp_path) + "/orders.parquet"
    )
    out = {
        r["klass"]: (r["n_customers"], r["revenue"])
        for r in q_abc_classification.__wrapped__(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {"A": (1, 80.0), "B": (3, 15.0), "C": (1, 5.0)}


def test_readability_hand_computed(spark, tmp_path):
    """'the cat sat. the dog ran.' → 6 words, 6 vowel groups, 3
    sentence units (2 enders + 1): flesch matches the formula by
    hand."""
    from babylon_data_loader_spark.queries.round4f import q_readability

    text = "the cat sat. the dog ran."
    pdf = pd.DataFrame(
        {
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(text)],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path) + "/documents.parquet"
    )
    out = q_readability.__wrapped__(spark, str(tmp_path)).collect()[0]
    assert (out["n_words"], out["n_syll"], out["n_sents"]) == (6, 6, 3)
    expected = round(206.835 - 1.015 * (6 / 3) - 84.6 * (6 / 6), 6)
    assert out["flesch"] == expected


def test_stream_left_join_crash_resume_exactness(spark, tmp_path):
    """Kill the left-outer join stream mid-drain, restart from the
    same checkpoint: the final sink equals the uninterrupted result —
    checkpointed source offsets + join state make the drain
    crash-resumable without duplicates or losses."""
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
         (3, m(8), 2, "purchase")],
        [(4, m(40), 3, "click"), (5, m(45), 8, "purchase")],
        [(6, m(55), 4, "click"), (7, m(60), 9, "click"),
         (8, m(61), 9, "purchase")],
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

    def run(sink, ckpt, interrupt: bool):
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
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if interrupt:
            # stop as soon as the first batch lands (or immediately)
            q.awaitTermination(5)
            q.stop()
            q.awaitTermination()
        else:
            q.awaitTermination()

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    run(sink, ckpt, interrupt=True)   # partial drain
    run(sink, ckpt, interrupt=False)  # resume to completion
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.read.parquet(sink).collect()
    }
    assert got == {(1, None), (2, 3), (7, 8)}
