"""Round-12 semantics pins: resolve-by-total-order MERGE must be
commit-interleaving-independent under DIVERGENT concurrent values
(the hard case r11's identical-overlap stress deliberately avoided),
and the composed admission gate must equal its three stages run
separately."""

from __future__ import annotations

import itertools
import os

import pytest

import babylon_data_loader_spark.queries as Q


@pytest.fixture(scope="module", autouse=True)
def _load():
    Q.load_all()


def _final_state(spark, tmp_path, name, commits, order_cols):
    """Apply ``commits`` (list of row-lists) serially into a fresh
    lake and return the sorted final rows."""
    from babylon_data_loader_spark.operators.merge import merge_upsert

    schema = "k BIGINT, part STRING, v BIGINT, payload STRING"
    path = os.path.join(str(tmp_path), name)
    for rows in commits:
        merge_upsert(
            spark,
            path,
            spark.createDataFrame(rows, schema),
            key=["k", "part"],
            partition_col="part",
            order_cols=order_cols,
        )
    from babylon_data_loader_spark.operators.tx_lake import (
        TransactionalLake,
    )

    lake = TransactionalLake.open(path, partition_col="part")
    return sorted(
        (r.k, r.part, r.v, r.payload)
        for r in lake.read(spark).collect()
    )


def test_merge_divergent_interleavings_converge(spark, tmp_path):
    # base seeds 4 keys; writer A claims v=10 for k1-k3, writer B
    # claims v=20 for k2-k4 — k2/k3 DIVERGE. Every interleaving of
    # the four writer commits (base always first) must land the
    # identical order-max state.
    base = [
        (1, "p", 1, "base1"),
        (2, "p", 2, "base2"),
        (3, "q", 3, "base3"),
        (4, "q", 4, "base4"),
    ]
    a1 = [(1, "p", 10, "a"), (2, "p", 10, "a")]
    a2 = [(3, "q", 10, "a")]
    b1 = [(2, "p", 20, "b"), (3, "q", 20, "b")]
    b2 = [(4, "q", 20, "b")]
    want = [
        (1, "p", 10, "a"),
        (2, "p", 20, "b"),
        (3, "q", 20, "b"),
        (4, "q", 20, "b"),
    ]
    states = []
    for i, perm in enumerate(
        itertools.permutations([a1, a2, b1, b2])
    ):
        got = _final_state(
            spark,
            tmp_path,
            f"lake_{i}",
            [base, *perm],
            order_cols=["v"],
        )
        states.append(got)
    assert all(s == want for s in states), states[:2]


def test_merge_order_resolve_beats_last_commit(spark, tmp_path):
    # The stored high-order row must survive a LATER lower-order
    # commit — the exact opposite of last-write-wins default mode.
    high_then_low = _final_state(
        spark,
        tmp_path,
        "lake_hl",
        [[(1, "p", 20, "high")], [(1, "p", 5, "low")]],
        order_cols=["v"],
    )
    assert high_then_low == [(1, "p", 20, "high")]
    # default mode: last commit wins (unchanged legacy behavior)
    default = _final_state(
        spark,
        tmp_path,
        "lake_default",
        [[(1, "p", 20, "high")], [(1, "p", 5, "low")]],
        order_cols=None,
    )
    assert default == [(1, "p", 5, "low")]


def test_merge_order_resolve_idempotent_redelivery(spark, tmp_path):
    # Re-delivering the same commit twice must be a no-op under
    # resolve-by-order (commutative AND idempotent).
    once = _final_state(
        spark,
        tmp_path,
        "lake_once",
        [[(1, "p", 7, "x")], [(1, "p", 9, "y")]],
        order_cols=["v"],
    )
    twice = _final_state(
        spark,
        tmp_path,
        "lake_twice",
        [[(1, "p", 7, "x")], [(1, "p", 9, "y")], [(1, "p", 9, "y")]],
        order_cols=["v"],
    )
    assert once == twice == [(1, "p", 9, "y")]


def _write_docs(spark, tmp_path, docs, name="sf"):
    schema = (
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT"
    )
    sf = os.path.join(str(tmp_path), name)
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in docs], schema
    ).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def test_admission_gate_all_three_gates_fire(spark, tmp_path):
    """Planted composition pin: one batch doc dropped by the decon
    gate, one stripped of a corpus-owned span, one stripped of a
    batch-internal duplicate span (owner keeps), one rejected by the
    per-source token budget."""
    span_c = " ".join(f"c{i}" for i in range(16))   # corpus-owned
    span_b = " ".join(f"b{i}" for i in range(16))   # batch-internal
    docs = [
        # corpus: eval doc (id 3: %3==0, %23!=0) with a marked 4-gram
        (3, "e1 e2 e3 e4 e5 e6", "s9"),
        # corpus non-eval: owns span_c (id 1: %3!=0)
        (1, span_c, "s9"),
        # batch (%23==0):
        (0, "e1 e2 e3 e4 z1 z2 z3", "s1"),              # contaminated
        (23, span_c + " u1 u2 u3 u4", "s1"),            # corpus strip
        (46, span_b + " v1 v2 v3 v4", "s1"),            # owner copy
        (92, span_b + " w1 w2 w3 w4", "s1"),            # loses span_b
        (69, " ".join(f"k{i}" for i in range(70)), "s2"),  # > budget
    ]
    sf = _write_docs(spark, tmp_path, docs)
    rows = [
        tuple(r)
        for r in Q.QUERIES["q_admission_gate"](spark, sf).collect()
    ]
    assert rows == [
        ("s1", 23, 4, 4, 28, 5, 1),
        ("s1", 46, 20, 24, 28, 5, 1),
        ("s1", 92, 4, 28, 28, 5, 1),
    ]
