"""The plan-audit gates (scripts/audit_plans.py) wired into pytest so
a new scale anti-pattern cannot merge even if the script is forgotten
(r5 VERDICT ask #7). Includes deliberately-regressed negative fixtures
— a build that reintroduces a global window or an unpruned few-group
window must fail this module."""

from __future__ import annotations

import importlib.util
import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

_SPEC = importlib.util.spec_from_file_location(
    "audit_plans",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "audit_plans.py"),
)
AP = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(AP)


def _base(spark):
    return spark.range(400).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("grp"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        (F.col("id") * 7 % 101).alias("v"),
    )


def test_negative_global_window_flagged(spark):
    """A Window with no partition spec (single-task sort of the whole
    input) must be flagged for a non-allowlisted query name."""
    df = _base(spark).withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id"))
    )
    plan = AP.explain_formatted(df)
    findings = AP.audit_plan("q_not_allowlisted", plan)
    assert any("global window" in f for f in findings), findings
    # the distributed two-pass replacement must NOT be flagged
    from babylon_data_loader_spark.operators.rank import (
        with_global_row_number,
    )

    good = with_global_row_number(
        _base(spark), [F.col("v").asc(), F.col("id").asc()], "rn"
    )
    assert AP.audit_plan("q_not_allowlisted", AP.explain_formatted(good)) == []


def test_negative_few_group_window_flagged(spark):
    """A Window partitioned only by a low-cardinality dimension column
    (each group sorted in one task) must be flagged."""
    df = _base(spark).withColumn(
        "s",
        F.sum("v").over(Window.partitionBy("event_type").orderBy("v", "id")),
    )
    findings = AP.audit_plan(
        "q_not_allowlisted", AP.explain_formatted(df)
    )
    assert any("few-group" in f for f in findings), findings


def test_wgl_masking_pinned(spark):
    """r5 ADVICE: one rank-limit-pruned top-k window (WindowGroupLimit)
    in the plan must NOT mask a DIFFERENT unpruned few-group window —
    the suppression is per partition spec, not whole-plan."""
    base = _base(spark)
    topk = (
        base.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("grp").orderBy("v", "id")),
        )
        .where(F.col("rn") <= 3)
        .select(F.col("v").alias("x"))
    )
    fewg = base.withColumn(
        "s",
        F.sum("v").over(Window.partitionBy("event_type").orderBy("v", "id")),
    ).select(F.col("s").alias("x"))
    plan = AP.explain_formatted(topk.unionAll(fewg))
    assert "WindowGroupLimit" in plan, plan  # fixture sanity
    findings = AP.audit_plan("q_not_allowlisted", plan)
    assert any("few-group" in f for f in findings), findings
    # and the pruned top-k alone stays clean
    plan_topk = AP.explain_formatted(topk)
    assert "WindowGroupLimit" in plan_topk, plan_topk
    assert AP.audit_plan("q_not_allowlisted", plan_topk) == []


def test_negative_cartesian_and_row_udf_flagged(spark):
    df = _base(spark)
    # small build sides plan as BroadcastNestedLoopJoin, big ones as
    # CartesianProduct — the audit flags both for a non-allowlisted name
    cart = df.crossJoin(df.selectExpr("id AS id2", "v AS v2"))
    findings = AP.audit_plan(
        "q_not_allowlisted", AP.explain_formatted(cart)
    )
    assert any(
        "Cartesian" in f or "NestedLoop" in f for f in findings
    ), findings

    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType(), useArrow=False)
    findings = AP.audit_plan(
        "q_not_allowlisted",
        AP.explain_formatted(df.select(slow("v").alias("w"))),
    )
    assert any("row-at-a-time" in f for f in findings), findings


def test_headline_plans_clean(spark):
    """Every bench headline query's physical plan passes the audit at
    sf0.001 — the merge gate the standalone script provides, enforced
    from the suite."""
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    queries = entrymod.queries()
    sf_dir = "/root/testdata/sf0.001"
    findings = []
    for name in HEADLINE:
        plan = AP.explain_formatted(queries[name](spark, sf_dir))
        findings.extend(AP.audit_plan(name, plan))
    assert findings == []


def test_bnlj_build_rows_measures_broadcast_side(spark):
    """The runtime BNLJ bound check must report the actual broadcast
    build-side row count: a 1-row scalar crossJoin measures 1; a plan
    with no BNLJ measures nothing."""
    big = spark.range(100).toDF("id")
    one = spark.range(49, 50).selectExpr("id as threshold")
    df = big.crossJoin(F.broadcast(one)).where("id > threshold")
    rows = AP.bnlj_build_rows(df)
    assert rows == [1], rows
    plain = big.selectExpr("sum(id) as s")
    assert AP.bnlj_build_rows(plain) == []
