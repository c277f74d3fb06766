"""Round-4 declared queries: Delta-log interop, sketch-accelerated
joins, survivorship dedup, and a driver-visible ANN recall report.

Each query follows the exact-match discipline of queries/__init__.py:
aliases identical across engines, cross-row float sums through
DECIMAL, timestamps as epoch-microsecond BIGINTs.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import event_ts_us, load_table


def _work_dir(spark: SparkSession, prefix: str) -> str:
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    return os.path.join(wh, f"{prefix}_{uuid.uuid4().hex[:12]}")


# Delta-log export bridge ----------------------------------------------------------

_DELTA_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(20,2))) AS DOUBLE) AS total
FROM events
WHERE event_id IS NOT NULL AND event_type IS NOT NULL
  AND value IS NOT NULL
GROUP BY event_type
"""


@query("q_delta_export", oracle=_DELTA_ORACLE)
def q_delta_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interop bridge end to end: load events into the transactional
    lake (one merge commit, hive-partitioned by event_type), export
    the lake's current version as an OPEN Delta Lake transaction log
    (operators/delta_export.py — `add` actions point at the lake's
    immutable files, nothing is copied), then read the table back
    through an independent log-walking reader that trusts ONLY the
    Delta log, and aggregate. The oracle recomputes the aggregate from
    the source table — a mismatch anywhere in merge → manifest →
    export → log-walk surfaces as a value diff. Mirrors the
    reference's any-client-readable storage contract
    (/root/reference/storage/mongo.go:14-16)."""
    from babylon_data_loader_spark.operators.delta_export import (
        export_delta_log,
        read_delta_export,
    )
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.filter(
        F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    ).select("event_id", "event_type", "value")

    work = _work_dir(spark, "delta_export")
    try:
        lake = TransactionalLake(
            os.path.join(work, "lake"), partition_col="event_type"
        )
        lake.merge(spark, base, key=["event_id"])
        summary = export_delta_log(
            spark, lake, os.path.join(work, "delta")
        )
        assert summary["n_files"] > 0
        back = read_delta_export(spark, os.path.join(work, "delta"))
        out = (
            back.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(20,2)"))
                .cast("double")
                .alias("total"),
            )
            .collect()
        )
        return spark.createDataFrame(
            out, schema="event_type string, n bigint, total double"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# Bloom-sketch join acceleration ---------------------------------------------------

_BLOOM_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(25,4))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderpriority
"""


@query("q_approx_join_sketch", oracle=_BLOOM_ORACLE)
def q_approx_join_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join pre-filtered through a Bloom sketch
    (operators/sketch_join.py): the small (filtered orders) side
    builds a fixed-size bitmap over its join key, the fact scan drops
    rows failing the bit test BEFORE any join machinery (pure
    element_at+getbit built-ins, whole-stage codegen), and the real
    join then removes the sketch's false positives — so the result is
    EXACT and the plain-SQL oracle holds. At 100 TB this is the
    semi-join-reduction pattern (Spark's internal InjectRuntimeFilter
    made an explicit operator): the bitmap is a few hundred KB riding
    in the plan, while only rows surviving the prefilter pay the
    shuffle/join."""
    from babylon_data_loader_spark.operators.sketch_join import (
        bloom_prefilter,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    prefiltered = bloom_prefilter(
        lineitem, urgent, big_key="l_orderkey", small_key="o_orderkey"
    )
    return (
        prefiltered.join(
            F.broadcast(
                urgent.select("o_orderkey", "o_orderpriority")
            ),
            prefiltered.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(25,4)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# Survivorship dedup ---------------------------------------------------------------

_SURVIVOR_ORACLE = """
SELECT user_id, event_type, event_id AS surviving_id, value,
       n_candidates
FROM (
  SELECT user_id, event_type, event_id, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type
           ORDER BY epoch_us(ts) DESC, event_id DESC
         ) AS rn,
         CAST(COUNT(*) OVER (
           PARTITION BY user_id, event_type
         ) AS BIGINT) AS n_candidates
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    AND ts IS NOT NULL
)
WHERE rn = 1
"""


@query("q_dedup_survivorship", oracle=_SURVIVOR_ORACLE)
def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge: one golden record per (user_id, event_type)
    — the LATEST event wins (event-time, event_id tiebreak), and the
    survivor carries how many candidate rows it beat. The reference's
    dedup-upsert keeps max-by-non-key-fields per 5-key group
    (/root/reference/datalake/datalake.go MERGE semantics); this is
    the same rule as a single partial-aggregating groupBy —
    max(struct(ts, id, payload)) — NOT a window sort: at 100 TB the
    agg combines map-side and shuffles one row per group, where a
    ROW_NUMBER window shuffles every row and sorts each partition."""
    events = load_table(spark, sf_dir, "events")
    clean = events.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    ts_us = event_ts_us(clean)
    winner = F.max(
        F.struct(
            ts_us.alias("ts_us"),
            F.col("event_id").alias("event_id"),
            F.col("value").alias("value"),
        )
    ).alias("w")
    return (
        clean.groupBy("user_id", "event_type")
        .agg(winner, F.count(F.lit(1)).alias("n_candidates"))
        .select(
            "user_id",
            "event_type",
            F.col("w.event_id").alias("surviving_id"),
            F.col("w.value").alias("value"),
            "n_candidates",
        )
    )


# ANN recall report ----------------------------------------------------------------


@query("q_knn_recall_guard")  # rows-only: recall of non-SQL-expressible
# index structures; every row is additionally ASSERTED in-query
def q_knn_recall_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible approximation-quality report: recall@10 vs
    brute-force cosine for the two store-backed FLOAT ANN production
    paths (operators/similarity.py sign-LSH multi-probe over its
    bucket-partitioned index; operators/pq.py PQ/ADC re-rank over its
    code store), asserted in-query against the bounds the unit tests
    establish — so a recall regression fails the driver's run loudly
    instead of shipping plausible-but-wrong neighbors. Since r12 the
    q_knn_* lanes pin DETERMINISTIC integer twins to DuckDB oracles
    (operators/det_ann.py); this guard is where the float paths —
    seeded-numpy hyperplanes and float codebooks, inherently not
    SQL-reproducible — keep their declared, store-lifecycle-
    exercising coverage. Deterministic: indexes, probes and tiebreaks
    are all content-addressed and ordered."""
    from babylon_data_loader_spark.operators.similarity import (
        knn_bruteforce,
        knn_lsh,
    )
    from babylon_data_loader_spark.queries.vectors import (
        _float_pq_store_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        r["vec_id"]
        for r in knn_bruteforce(emb, query_vec_id=0, k=10).collect()
    }
    rows = []
    for method, out, bound in (
        ("lsh", knn_lsh(emb, query_vec_id=0, k=10, n_planes=8), 0.3),
        ("pq", _float_pq_store_topk(spark, emb), 0.3),
    ):
        got = {
            r["vec_id"] for r in out.select("vec_id").collect()
        }
        recall = len(exact & got) / 10.0
        assert recall >= bound, f"{method} recall {recall} < {bound}"
        rows.append((method, 10, recall, bound))
    return spark.createDataFrame(
        rows, schema="method string, k int, recall double, bound double"
    )
