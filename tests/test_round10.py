"""Planted-fixture semantics for the round-10 queries: owner
survival under the production ExactSubstr strip policy, the
strip<->budget consistency of the end-to-end composition, and the
incremental batch probe's hit accounting — independently of the
DuckDB oracle comparison that tests/test_oracle.py runs."""

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


def test_strip_owner_keeps_exactly_one_copy(spark, tmp_path):
    # three identical 20-token docs: the minimal doc_id OWNS every
    # duplicated window and survives untouched; the other two copies
    # are fully stripped. The both-copies preview would strip all
    # three.
    docs = [
        (0, _SPAN20, "en", "s1"),
        (1, _SPAN20, "en", "s2"),
        (2, _SPAN20, "en", "s3"),
    ]
    sf = _write(spark, tmp_path, docs)
    own = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip_owner"](
            spark, sf
        ).collect()
    }
    assert own[0]["n_after"] == 20  # the owner copy SURVIVES
    assert (
        own[0]["digest"]
        == hashlib.md5(_SPAN20.encode()).hexdigest()
    )
    assert own[1]["n_after"] == 0 and own[1]["digest"] is None
    assert own[2]["n_after"] == 0 and own[2]["digest"] is None
    # the preview strips every copy, owner included
    both = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip"](spark, sf).collect()
    }
    assert all(both[i]["n_after"] == 0 for i in range(3))


def test_strip_owner_within_doc_repeat(spark, tmp_path):
    # one doc repeating a 16-gram around a unique middle: the FIRST
    # occurrence (smaller pos) owns the hash, the second is stripped.
    rep = " ".join(f"r{i}" for i in range(16))
    mid = " ".join(f"m{i}" for i in range(16))
    text = f"{rep} {mid} {rep}"
    sf = _write(spark, tmp_path, [(0, text, "en", "s1")])
    row = Q.QUERIES["q_substring_strip_owner"](spark, sf).collect()[0]
    assert row["n_before"] == 48
    assert row["n_after"] == 32
    assert (
        row["digest"]
        == hashlib.md5(f"{rep} {mid}".encode()).hexdigest()
    )


def test_strip_owner_cross_span_overlap_semantics(spark, tmp_path):
    # the documented token-level caveat: ownership is per window
    # hash, removal is the per-doc UNION of loser extents — so a kept
    # owner span loses tokens where a DIFFERENT hash's loser extent
    # overlaps it. doc 1 owns H1 (window at pos 0, re-shared by
    # doc 2) but is the LOSER of H2 (doc 0's whole text, reappearing
    # at doc 1 pos 10): stripping [10,25] cuts the owner span's tail.
    a = [f"a{i}" for i in range(10)]
    m = [f"m{i}" for i in range(16)]
    u = [f"u{i}" for i in range(10)]
    docs = [
        (0, " ".join(m), "en", "s0"),
        (1, " ".join(a + m), "en", "s1"),
        (2, " ".join(a + m[:6] + u), "en", "s2"),
    ]
    sf = _write(spark, tmp_path, docs)
    own = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip_owner"](
            spark, sf
        ).collect()
    }
    assert own[0]["n_after"] == 16  # H2's owner copy, untouched
    # doc 1: loser extent [10,25] removed; tokens 10-15 were ALSO
    # part of doc 1's owned H1 span [0,15] — they go anyway
    assert own[1]["n_after"] == 10
    assert (
        own[1]["digest"]
        == hashlib.md5(" ".join(a).encode()).hexdigest()
    )
    # doc 2: loser of H1 -> [0,15] removed, unique suffix kept
    assert own[2]["n_after"] == 10
    assert (
        own[2]["digest"]
        == hashlib.md5(" ".join(u).encode()).hexdigest()
    )


def test_e2e_budget_matches_strip_owner_removal(spark, tmp_path):
    # stripped_tokens per source must equal what strip_owner actually
    # deletes (the interval-union of loser extents), and the
    # both-copies adjusted budget must never retain MORE than the
    # owner-keep one.
    docs = [
        (0, _SPAN20 + " a1 a2 a3 a4", "en", "s1"),
        (1, _SPAN20 + " b1 b2 b3 b4", "en", "s2"),
        (2, " ".join(f"u{i}" for i in range(40)), "en", "s3"),
        (3, "tiny sub sixteen token doc", "en", "s3"),
    ]
    sf = _write(spark, tmp_path, docs)
    strip = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip_owner"](
            spark, sf
        ).collect()
    }
    removed_by_src = {
        "s1": strip[0]["n_before"] - strip[0]["n_after"],
        "s2": strip[1]["n_before"] - strip[1]["n_after"],
        "s3": strip[2]["n_before"] - strip[2]["n_after"],
    }
    e2e = {
        r["source"]: r
        for r in Q.QUERIES["q_dedup_budget_e2e"](spark, sf).collect()
    }
    for s in ("s1", "s2", "s3"):
        assert e2e[s]["stripped_tokens"] == removed_by_src[s]
    # doc 0 owns the shared span: s1 loses nothing, s2 loses 20
    assert e2e["s1"]["stripped_tokens"] == 0
    assert e2e["s2"]["stripped_tokens"] == 20
    # sub-16-token doc 3's 5 tokens still count toward s3's mass
    assert e2e["s3"]["n_tokens"] == 45
    assert e2e["s3"]["effective_tokens"] == 45
    adj = {
        r["source"]: r
        for r in Q.QUERIES["q_dedup_adjusted_budget"](
            spark, sf
        ).collect()
    }
    for s in ("s1", "s2", "s3"):
        assert (
            e2e[s]["effective_tokens"] >= adj[s]["effective_tokens"]
        )
    # budget arithmetic: effective (24, 4, 45), budget 73,
    # cap = 2*73 div 5 = 29, allocations min(cap, 4*eff)
    assert e2e["s1"]["source_cap"] == 29
    assert e2e["s1"]["allocated"] == 29  # 4*24 = 96, capped
    assert e2e["s2"]["allocated"] == 16  # 4*4, uncapped
    assert e2e["s3"]["allocated"] == 29  # 4*45 = 180, capped


def test_incremental_probe_hits_and_flags(spark, tmp_path):
    # batch = doc_ids divisible by 23: doc 23 is an exact 20-token
    # copy of corpus doc 5 (all 5 windows hit -> flagged), doc 46 is
    # 16 unique tokens (1 window, 0 hits), doc 0 is a sub-16 doc
    # whose fallback window matches nothing.
    docs = [
        (0, "short unique batch doc", "en", "s0"),
        (5, _SPAN20, "en", "s1"),
        (7, " ".join(f"c{i}" for i in range(20)), "en", "s1"),
        (23, _SPAN20, "en", "s2"),
        (46, " ".join(f"n{i}" for i in range(16)), "en", "s3"),
    ]
    sf = _write(spark, tmp_path, docs)
    rows = {
        r["source"]: r
        for r in Q.QUERIES["q_incremental_substring"](
            spark, sf
        ).collect()
    }
    assert set(rows) == {"s0", "s2", "s3"}  # batch sources only
    assert rows["s2"]["n_windows"] == 5
    assert rows["s2"]["n_hit_windows"] == 5
    assert rows["s2"]["hit_rate"] == pytest.approx(1.0)
    assert rows["s2"]["n_docs_flagged"] == 1
    assert rows["s3"]["n_windows"] == 1
    assert rows["s3"]["n_hit_windows"] == 0
    assert rows["s3"]["n_docs_flagged"] == 0
    assert rows["s0"]["n_hit_windows"] == 0
    # the streaming twin (stream-static join, several micro-batches)
    # must produce EXACTLY the batch probe's rows — micro-batch
    # boundaries cannot leak into the result
    stream_rows = sorted(
        (
            tuple(r)
            for r in Q.QUERIES["q_stream_incremental_dedup"](
                spark, sf
            ).collect()
        )
    )
    batch_rows = sorted(
        (
            tuple(r)
            for r in Q.QUERIES["q_incremental_substring"](
                spark, sf
            ).collect()
        )
    )
    assert stream_rows == batch_rows
