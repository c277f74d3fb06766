"""Planted-fixture semantics for the round-11 queries: the
incremental owner-keep strip's two ownership rules (corpus owns
known spans; batch-internal dups keep the minimal occurrence) and
the concurrent MERGE stress's transactional invariants —
independently of the DuckDB oracle comparison."""

from __future__ import annotations

import hashlib
import os

import pytest

import babylon_data_loader_spark.queries as Q

DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, "
    "n_chars BIGINT"
)


@pytest.fixture(scope="module", autouse=True)
def _load():
    Q.load_all()


def _write(spark, tmp_path, docs):
    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs], DOC_SCHEMA
    ).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


_SPAN20 = " ".join(f"w{i}" for i in range(20))
_OTHER20 = " ".join(f"u{i}" for i in range(20))


def test_incremental_strip_corpus_owns_known_spans(spark, tmp_path):
    # doc_id%23==0 is the batch; everything else is corpus. Batch doc
    # 0 repeats the corpus doc's text -> fully stripped; batch doc 23
    # is fresh -> survives untouched. The corpus doc itself is NOT in
    # the output (the incremental strip never touches stored docs).
    docs = [
        (0, _SPAN20, "en", "s1"),     # batch, duplicates corpus
        (1, _SPAN20, "en", "s2"),     # corpus owner
        (23, _OTHER20, "en", "s3"),   # batch, fresh
    ]
    sf = _write(spark, tmp_path, docs)
    out = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_incremental_strip_owner"](
            spark, sf
        ).collect()
    }
    assert set(out) == {0, 23}
    assert out[0]["n_after"] == 0 and out[0]["digest"] is None
    assert out[23]["n_after"] == 20
    assert (
        out[23]["digest"]
        == hashlib.md5(_OTHER20.encode()).hexdigest()
    )


def test_incremental_strip_batch_internal_owner(spark, tmp_path):
    # the duplicated span exists ONLY inside the batch: minimal
    # doc_id owns it and survives; the later batch copy is stripped.
    docs = [
        (0, _SPAN20, "en", "s1"),    # batch owner (min doc_id)
        (1, _OTHER20, "en", "s2"),   # corpus, unrelated
        (46, _SPAN20, "en", "s3"),   # batch loser
    ]
    sf = _write(spark, tmp_path, docs)
    out = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_incremental_strip_owner"](
            spark, sf
        ).collect()
    }
    assert set(out) == {0, 46}
    assert out[0]["n_after"] == 20  # owner copy survives
    assert out[46]["n_after"] == 0


def test_merge_concurrent_stress_invariants(spark):
    # runs the real two-writer race against sf0.001; the query
    # RAISES internally unless exactly 7 versions committed, no
    # claim files leak, and the key population is conserved — here
    # we additionally pin that updates actually landed.
    out = Q.QUERIES["q_merge_concurrent_stress"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    assert sum(r["n_updated"] for r in out) > 0
    assert all(r["n_rows"] >= r["n_users"] for r in out)
