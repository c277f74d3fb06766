"""Round-12 queries: the two seams r11's VERDICT asked for.

- ``q_merge_divergent_stress``: the HARD concurrent-MERGE case
  (SURVEY §7 hard-part 3, r11 VERDICT ask #4). r11's
  ``q_merge_concurrent_stress`` raced two writers whose overlapping
  keys carried IDENTICAL rows (idempotent at-least-once
  re-delivery); here the overlap rows DIVERGE — each writer claims a
  different value for the same key — and the final state is still
  interleaving-independent because the merge runs in
  RESOLVE-BY-TOTAL-ORDER mode (``merge_upsert(order_cols=...)``,
  operators/tx_lake.py): the survivor among {stored, batch} rows per
  key is the max under the q_dedup_key total order, making every
  commit commutative and idempotent. The DuckDB oracle computes the
  order-max outcome from the events table alone; a pytest
  additionally permutes commit interleavings and pins byte-equal
  final states (tests/test_round12.py).
- ``q_admission_gate``: the COMPOSED production admission pipeline
  (r11 VERDICT ask #6): incremental decontamination → owner-keep
  substring strip → token-budget admit, run as ONE query over the
  same at-rest stores the three standalone seams use. An arriving
  batch (doc_id%23==0) is (1) dropped outright when it shares any
  4-gram with the eval suite's at-rest gram index, (2) stripped of
  every >=16-token span the corpus already owns plus batch-internal
  duplicate spans, then (3) admitted greedily per source under a
  token budget in doc_id order. Each stage is the ORACLE-GREEN
  operator from r10/r11; the composition is what a production gate
  actually runs between arrival and commit.

Scale notes: the divergent merge rewrites only touched partitions
per commit and its same-key resolution shuffles the touched
partitions plus the batch — the merge_upsert envelope unchanged; the
admission gate's three stages are each one bounded probe of an
at-rest index (eval grams broadcast-with-guard; corpus window hashes
semi-joined at (id,pos,hash) width; the budget scan is one window
over the surviving batch docs) — the corpus is never rescanned.

Reference analogue: mongo_repository.go:44-57 upsert semantics (the
unordered-bulk nondeterminism this merge mode removes) + the
incremental-ingest contract (datalake/client.go:45-76).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.round11 import _BASE_CTE
from babylon_data_loader_spark.schemas import event_ts_us, load_table

# ---------------------------------------------------------------------------
# q_merge_divergent_stress
# ---------------------------------------------------------------------------

#: writer A updates user_id%10 0-4 (event_id+1M, value+1000); writer
#: B updates 3-7 (event_id+2M, value+2000). Keys 3-4 receive BOTH —
#: divergent rows — and the resolve order (event_id DESC first) makes
#: B the deterministic winner regardless of commit interleaving.
_DIV_CASE = """
      CASE WHEN user_id % 10 BETWEEN 3 AND 7 THEN {b}
           WHEN user_id % 10 <= 2 THEN {a}
           ELSE {base} END
"""


@query(
    "q_merge_divergent_stress",
    oracle=_BASE_CTE
    + f"""
    , final AS (
      SELECT user_id, event_type,
             {_DIV_CASE.format(
                 b='event_id + 2000000',
                 a='event_id + 1000000',
                 base='event_id',
             )} AS event_id,
             ts_us,
             {_DIV_CASE.format(
                 b='value + 2000.0',
                 a='value + 1000.0',
                 base='value',
             )} AS value
      FROM base
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN event_id >= 1000000
                          AND event_id < 2000000
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_won_a,
           CAST(SUM(CASE WHEN event_id >= 2000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_won_b,
           CAST(SUM(CAST(value AS DECIMAL(25, 6))) AS DOUBLE)
             AS sum_value
    FROM final GROUP BY event_type ORDER BY event_type
    """,
)
def q_merge_divergent_stress(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MERGE under concurrent writers whose overlapping keys carry
    DIFFERENT values: writer A claims event_id+1M / value+1000 for
    user_id%10 0-4, writer B claims +2M / +2000 for 3-7; both split
    their updates into three racing commits. The lake merges in
    resolve-by-total-order mode (order_cols = event_id, ts_us, value
    — the q_dedup_key discipline), so the key's survivor is the
    ORDER-MAX of every row ever delivered, not the last commit: keys
    3-4 deterministically keep B's row whichever thread lands last,
    and the oracle computes that outcome from the events table alone.
    In-query raises pin the transactional invariants the oracle
    cannot see: exactly 7 committed versions, no leftover claim
    files, key-count conservation."""
    import os
    import shutil
    import threading
    import uuid

    from babylon_data_loader_spark.operators.index_store import (
        warehouse_dir,
    )
    from babylon_data_loader_spark.operators.merge import merge_upsert
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    ev = load_table(spark, sf_dir, "events")
    base = (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            event_ts_us(ev).alias("ts_us"),
            "value",
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "event_type").orderBy(
                    F.col("ts_us").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    key = ["user_id", "event_type"]
    order_cols = ["event_id", "ts_us", "value"]
    path = os.path.join(
        warehouse_dir(spark),
        f"_merge_divergent_{uuid.uuid4().hex[:12]}",
    )

    def claim(bump_id: int, bump_val: float) -> DataFrame:
        return base.select(
            "user_id",
            "event_type",
            (F.col("event_id") + F.lit(bump_id)).alias("event_id"),
            "ts_us",
            (F.col("value") + F.lit(bump_val)).alias("value"),
        )

    try:
        merge_upsert(
            spark,
            path,
            base,
            key=key,
            partition_col="event_type",
            order_cols=order_cols,
        )
        errors: list[BaseException] = []

        def writer(lo: int, hi: int, upd: DataFrame) -> None:
            try:
                for chunk in range(3):
                    batch = upd.where(
                        (F.col("user_id") % 10 >= lo)
                        & (F.col("user_id") % 10 <= hi)
                        & (F.col("user_id") % 3 == chunk)
                    )
                    merge_upsert(
                        spark,
                        path,
                        batch,
                        key=key,
                        partition_col="event_type",
                        order_cols=order_cols,
                    )
            except BaseException as exc:  # surfaced after join
                errors.append(exc)

        ta = threading.Thread(
            target=writer, args=(0, 4, claim(1000000, 1000.0))
        )
        tb = threading.Thread(
            target=writer, args=(3, 7, claim(2000000, 2000.0))
        )
        ta.start()
        tb.start()
        ta.join()
        tb.join()
        if errors:
            raise errors[0]
        lake = TransactionalLake.open(
            path, partition_col="event_type"
        )
        version = lake.current_manifest()["version"]
        if version != 7:
            raise AssertionError(
                f"expected 7 committed versions (1 seed + 6 merges), "
                f"manifest points at v{version}"
            )
        leftover = [
            f
            for f in os.listdir(os.path.join(path, "_manifest"))
            if f.startswith("v8")
        ]
        if leftover:
            raise AssertionError(
                f"uncommitted claim files left behind: {leftover}"
            )
        state = lake.read(spark)
        n_keys = state.select(*key).distinct().count()
        n_base = base.select(*key).distinct().count()
        if n_keys != n_base:
            raise AssertionError(
                f"upserts changed the key population: "
                f"{n_base} -> {n_keys}"
            )
        out = (
            state.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(
                    F.when(
                        (F.col("event_id") >= 1000000)
                        & (F.col("event_id") < 2000000),
                        F.lit(1),
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_won_a"),
                F.sum(
                    F.when(
                        F.col("event_id") >= 2000000, F.lit(1)
                    ).otherwise(F.lit(0))
                )
                .cast("long")
                .alias("n_won_b"),
                F.sum(F.col("value").cast("decimal(25,6)"))
                .cast("double")
                .alias("sum_value"),
            )
            .orderBy("event_type")
        )
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)
