"""queries/round6c.py edge semantics beyond the DuckDB oracle harness:
split leakage must count exactly the near-dup pairs whose members hash
into different splits (and nothing else), and duplication weights must
sum to exactly 1 per cluster (the invariant that makes them a
drop-nothing alternative to hard dedup).

Planted ids use the real md5('split:'+id) assignment (precomputed
below): 0-5 are train, 10/21/27 are test, 31/46 are val.
"""

from __future__ import annotations

import os

import pytest

import babylon_data_loader_spark.queries as Q

A = "the quick brown fox jumps over the lazy dog again today friends"
B = "completely different content about distributed query engines ok"
C = "a third unrelated text regarding transactional lake snapshots"


@pytest.fixture(scope="module", autouse=True)
def _load():
    Q.load_all()


def _write_docs(spark, tmp_path, rows):
    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [
            (i, t, "en", "src", len(t))
            for i, t in rows
        ],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_split_leakage_counts_only_cross_split_pairs(spark, tmp_path):
    # dup pair crossing train(0)/test(10); dup pair inside train(1,2);
    # dup pair crossing train(3)/val(31); singleton test(21)
    sf = _write_docs(
        spark,
        tmp_path,
        [(0, A), (10, A), (1, B), (2, B), (3, C), (31, C), (21, "xyz")],
    )
    rows = {
        (r["split_a"], r["split_b"]): r["leaked_pairs"]
        for r in Q.QUERIES["q_split_leakage"](spark, sf).collect()
    }
    assert rows == {("test", "train"): 1, ("train", "val"): 1}


def test_dup_weight_sums_to_one_per_cluster(spark, tmp_path):
    # chain 0~1~2 (identical text -> one 3-cluster) + pair (3,10) +
    # singleton 21
    sf = _write_docs(
        spark,
        tmp_path,
        [(0, A), (1, A), (2, A), (3, B), (10, B), (21, C)],
    )
    out = Q.QUERIES["q_dup_weight"](spark, sf).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc[0]["cluster_id"] == 0 and by_doc[2]["cluster_id"] == 0
    assert by_doc[0]["cluster_size"] == 3
    assert by_doc[3]["cluster_id"] == 3 and by_doc[10]["cluster_size"] == 2
    assert by_doc[21]["cluster_size"] == 1
    assert by_doc[21]["weight"] == 1.0
    # the invariant: total weight per cluster is exactly 1
    totals = {}
    for r in out:
        totals[r["cluster_id"]] = totals.get(r["cluster_id"], 0.0) + r["weight"]
    for cid, tot in totals.items():
        assert tot == pytest.approx(1.0, abs=1e-8), (cid, tot)
