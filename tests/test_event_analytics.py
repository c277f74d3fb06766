"""Edge-case tests for the wave-4 event analytics: ordered-funnel
progression rules and the gap-fill zero/missing distinction — the
semantics the oracles check statistically, pinned here on hand-built
fixtures where every row's fate is known."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, event_type, hour_offset) at hour granularity."""
    base = 1_700_000_000_000_000
    pdf = pd.DataFrame(
        [
            (i, u, t, base + h * 3_600_000_000)
            for i, (u, t, h) in enumerate(rows)
        ],
        columns=["event_id", "user_id", "event_type", "ts_us"],
    )
    return (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        .withColumn("value", F.lit(1.0))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def _funnel(spark, rows, tmp_path):
    from babylon_data_loader_spark.queries.round4d import q_event_funnel

    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    return q_event_funnel.__wrapped__(spark, path).collect()[0]


def test_funnel_orders_matter(spark, tmp_path):
    rows = [
        # user 1: view -> click -> purchase, each 1h apart: converts
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        # user 2: purchase BEFORE click: reaches click, not purchase
        (2, "view", 0), (2, "purchase", 1), (2, "click", 2),
        # user 3: click before any view: views, never clicks-in-order
        (3, "click", 0), (3, "view", 1),
        # user 4: click 30h after first view: outside the 24h window
        (4, "view", 0), (4, "click", 30),
    ]
    got = _funnel(spark, rows, tmp_path)
    assert (got["n_view"], got["n_click"], got["n_purchase"]) == (4, 2, 1)


def test_funnel_window_binds_to_first_view(spark, tmp_path):
    # second view at h=10 does NOT reopen the window: click at h=30
    # is 30h after the FIRST view -> no click stage
    rows = [(1, "view", 0), (1, "view", 10), (1, "click", 30)]
    got = _funnel(spark, rows, tmp_path)
    assert (got["n_view"], got["n_click"], got["n_purchase"]) == (1, 0, 0)


def test_gap_fill_zero_vs_missing(spark, tmp_path):
    from babylon_data_loader_spark.queries.round4d import q_gap_fill

    rows = [(1, "view", 0), (1, "view", 3), (2, "click", 1)]
    path = str(tmp_path / "ev")
    _events(spark, rows).write.mode("overwrite").parquet(
        path + "/events.parquet"
    )
    out = q_gap_fill.__wrapped__(spark, path).collect()
    # spine spans hours 0..3 x {view, click} = 8 rows, dense
    assert len(out) == 8
    by = {(r["hour"] % 100, r["event_type"]): r["n"] for r in out}
    hours = sorted({h for h, _ in by})
    h0 = hours[0]
    assert by[(h0, "view")] == 1 and by[(h0 + 3, "view")] == 1
    assert by[(h0 + 1, "view")] == 0  # explicit zero, not missing
    assert by[(h0 + 1, "click")] == 1
    assert sum(by.values()) == 3
