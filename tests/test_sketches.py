"""Sketch operators: approximate answers must sit within their
advertised error of the exact answers (which the oracle-checked exact
queries already pin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from babylon_data_loader_spark.schemas import load_table

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    from babylon_data_loader_spark.queries.wave3 import q_sketch_distinct

    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_sketch_distinct(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        rel = abs(approx[et] - n) / n
        assert rel < 0.05, f"{et}: approx {approx[et]} vs exact {n}"


def test_quantile_sketch_brackets_exact(spark):
    """The query emits one SCALAR row per (event_type, p) — the shape
    the driver's pandas canonicalization can sort (the r4 harness
    crash was an array column here)."""
    from babylon_data_loader_spark.queries.wave3 import q_sketch_quantiles

    out = q_sketch_quantiles(spark, SF).collect()
    rows: dict = {}
    for r in out:
        rows.setdefault(r["event_type"], {})[r["p"]] = r["quantile"]
    ev = load_table(spark, SF, "events")
    for et, qs in rows.items():
        assert sorted(qs) == [0.5, 0.95, 0.99]
        p50, p95, p99 = qs[0.5], qs[0.95], qs[0.99]
        assert p50 <= p95 <= p99  # monotone
        vals = ev.filter(F.col("event_type") == et).select("value")
        n = vals.count()
        # exact rank of the approx p50 must be near the true median
        rank = vals.filter(F.col("value") <= p50).count()
        assert abs(rank / n - 0.5) < 0.02, f"{et}: p50 rank {rank/n}"
