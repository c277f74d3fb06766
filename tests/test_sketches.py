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


def test_kmv_distinct_paths_and_group_limit(spark):
    """r12: the oracle-checkable KMV sketch. At sf0.01 every group
    has 150 distinct users > k=64, so the (k-1)·M/R estimation path
    fires and must land within the 3σ bound; a sub-k planted frame
    must return the exact count; and the bottom-k window must carry
    WindowGroupLimit in the physical plan (per-partition pre-pruning
    — the fixed-size-sketch property, not a full group sort)."""
    import babylon_data_loader_spark.queries as Q

    Q.load_all()
    fn = Q.QUERIES["q_kmv_distinct"].__wrapped__
    out = fn(spark, SF)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan
    rows = {r["event_type"]: r for r in out.collect()}
    assert len(rows) == 5
    for et, r in rows.items():
        assert r["n_exact"] == 150
        assert r["kth_hash"] > 0  # estimation path fired
        assert r["est_distinct"] != 150.0 or r["rel_err"] == 0.0
        assert r["rel_err"] <= 0.4, (et, r["rel_err"])

    # planted sub-k group: the sketch holds everything -> exact
    import os

    sf = os.path.join(
        str(spark.conf.get("spark.sql.warehouse.dir")).removeprefix(
            "file:"
        ),
        "_kmv_fixture",
    )
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, 1000 + i % 7, "tiny", float(i)) for i in range(40)],
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
    ).withColumn(
        "ts", F.timestamp_micros(F.lit(1700000000000000) + F.col("event_id"))
    ).write.mode("overwrite").parquet(
        os.path.join(sf, "events.parquet")
    )
    tiny = {r["event_type"]: r for r in fn(spark, sf).collect()}
    assert tiny["tiny"]["n_exact"] == 7
    assert tiny["tiny"]["est_distinct"] == 7.0
    assert tiny["tiny"]["rel_err"] == 0.0
