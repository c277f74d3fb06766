"""Planted-fixture semantics for the round-9 queries: hand-computable
inputs pin the substring-dedup window arithmetic (stride-1 16-token
hashing, whole-doc fallback), provenance breadth, the cross-lingual
split's loser convention, and the language budget's integer
arithmetic — independently of the DuckDB oracle comparison that
tests/test_oracle.py runs."""

from __future__ import annotations

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


_SPAN = " ".join(f"w{i}" for i in range(16))  # the shared 16-gram


def test_substring_dedup_window_arithmetic(spark, tmp_path):
    # docs 0 and 1 share exactly ONE 16-token span then diverge:
    # each has 20 tokens -> 5 windows, of which only the window at
    # position 1 (the span itself) repeats corpus-wide. doc 2 is all
    # unique: 18 tokens -> 3 windows, none duplicated.
    docs = [
        (0, _SPAN + " a1 a2 a3 a4", "en", "s1"),
        (1, _SPAN + " b1 b2 b3 b4", "en", "s2"),
        (2, " ".join(f"u{i}" for i in range(18)), "en", "s3"),
    ]
    sf = _write(spark, tmp_path, docs)
    rows = {
        r["source"]: r
        for r in Q.QUERIES["q_substring_dedup"](spark, sf).collect()
    }
    assert rows["s1"]["n_windows"] == 5
    assert rows["s1"]["n_dup_windows"] == 1
    assert rows["s1"]["dup_rate"] == pytest.approx(0.2)
    assert rows["s2"]["n_dup_windows"] == 1
    assert rows["s3"]["n_windows"] == 3
    assert rows["s3"]["n_dup_windows"] == 0


def test_substring_short_doc_fallback_and_span_docs(spark, tmp_path):
    # sub-16-token twins dedup via the whole-doc fallback window and
    # rank FIRST in the span worklist (frac 1.0, doc_id tiebreak)
    docs = [
        (0, "tiny shared document body", "en", "s1"),
        (1, "tiny shared document body", "en", "s2"),
        (2, _SPAN + " x1 x2 x3 x4", "en", "s1"),
        (3, _SPAN + " y1 y2 y3 y4", "en", "s2"),
    ]
    sf = _write(spark, tmp_path, docs)
    out = Q.QUERIES["q_dup_span_docs"](spark, sf).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3]
    assert out[0]["dup_frac"] == pytest.approx(1.0)
    assert out[1]["n_windows"] == 1  # fallback: one whole-doc window
    assert out[2]["dup_frac"] == pytest.approx(0.2)


def test_substring_provenance_breadth(spark, tmp_path):
    # one span shared ACROSS sources (breadth 2) and one span
    # repeated twice WITHIN a single doc (breadth 1)
    rep = " ".join(f"r{i}" for i in range(16))
    docs = [
        (0, _SPAN + " a1 a2 a3 a4", "en", "s1"),
        (1, _SPAN + " b1 b2 b3 b4", "en", "s2"),
        # rep twice separated by 16 unique tokens: the two rep
        # windows are the only repeated hashes in this doc
        (
            2,
            rep + " " + " ".join(f"m{i}" for i in range(16)) + " " + rep,
            "en",
            "s3",
        ),
    ]
    sf = _write(spark, tmp_path, docs)
    rows = {
        r["n_sources"]: r
        for r in Q.QUERIES["q_substring_provenance"](
            spark, sf
        ).collect()
    }
    assert rows[2]["n_windows"] == 1  # the cross-source span
    assert rows[2]["n_occurrences"] == 2
    assert rows[1]["n_windows"] == 1  # the within-doc repeat
    assert rows[1]["n_occurrences"] == 2


def test_dup_span_islands_merge_and_coverage(spark, tmp_path):
    # docs 0 and 1 share a 20-token span then diverge (4 unique
    # tokens each): windows at positions 0..4 are duplicated, the
    # island merges them into ONE maximal 20-token span. doc 2 is a
    # 10-token exact twin of doc 3 — substring-visible via the
    # fallback window but EXCLUDED from span metrics (< 16 tokens).
    span20 = " ".join(f"w{i}" for i in range(20))
    tiny = "tiny twin body of ten whitespace tokens exactly here now"
    docs = [
        (0, span20 + " a1 a2 a3 a4", "s1", "s1"),
        (1, span20 + " b1 b2 b3 b4", "s1", "s2"),
        (2, tiny, "en", "s3"),
        (3, tiny, "en", "s3"),
    ]
    sf = _write(spark, tmp_path, [(i, t, "en", s) for i, t, _, s in docs])
    lengths = {
        r["span_len"]: r
        for r in Q.QUERIES["q_dup_span_lengths"](spark, sf).collect()
    }
    assert set(lengths) == {20}
    assert lengths[20]["n_spans"] == 2
    assert lengths[20]["n_docs"] == 2
    cov = {
        r["source"]: r
        for r in Q.QUERIES["q_dup_span_coverage"](spark, sf).collect()
    }
    # 20 of 24 tokens covered in each long doc; the tiny twins are
    # absent from the coverage universe entirely
    assert cov["s1"]["total_tokens"] == 24
    assert cov["s1"]["covered_tokens"] == 20
    assert cov["s1"]["coverage"] == pytest.approx(20 / 24)
    assert cov["s2"]["covered_tokens"] == 20
    assert "s3" not in cov


def test_coverage_interval_union_no_double_count(spark, tmp_path):
    # THE r9-advice planted case: dup windows at positions 0 and 10
    # ONLY. Doc 0 is a0..a25 (26 tokens, windows 0..10); doc 1 is
    # a0..a15 + sep + a10..a25, so exactly doc-0 windows 0 and 10
    # repeat. Their token extents [0,15] and [10,25] OVERLAP: the
    # interval union is 26 tokens — per-island summing would claim
    # 32 and put coverage above 1.0.
    a = [f"a{i}" for i in range(26)]
    docs = [
        (0, " ".join(a), "en", "s1"),
        (1, " ".join(a[0:16] + ["sep"] + a[10:26]), "en", "s2"),
    ]
    sf = _write(spark, tmp_path, docs)
    cov = {
        r["source"]: r
        for r in Q.QUERIES["q_dup_span_coverage"](spark, sf).collect()
    }
    assert cov["s1"]["total_tokens"] == 26
    assert cov["s1"]["covered_tokens"] == 26  # union, not 32
    assert cov["s1"]["coverage"] == pytest.approx(1.0)
    # doc 1: dup windows at 0 and 17 -> extents [0,15] and [17,32]
    # are disjoint -> 32 of 33 covered (only "sep" survives)
    assert cov["s2"]["total_tokens"] == 33
    assert cov["s2"]["covered_tokens"] == 32
    # coverage == strip removal, per construction
    strip = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip"](spark, sf).collect()
    }
    assert strip[0]["n_before"] - strip[0]["n_after"] == 26
    assert strip[0]["digest"] is None  # fully stripped
    assert strip[1]["n_before"] - strip[1]["n_after"] == 32
    # dedup-adjusted budget: effective = nt - union-covered >= 0
    bud = {
        r["source"]: r
        for r in Q.QUERIES["q_dedup_adjusted_budget"](
            spark, sf
        ).collect()
    }
    assert bud["s1"]["effective_tokens"] == 0
    assert bud["s2"]["effective_tokens"] == 1


def test_substring_strip_and_adjusted_budget(spark, tmp_path):
    # docs 0/1 share a 20-token span (covered 20 of 24); doc 2 is 40
    # unique tokens. Strip keeps exactly the unique suffixes; the
    # dedup-adjusted budget allocates from effective masses:
    # eff = (4, 4, 40), budget 48, cap = 2*48 div 5 = 19,
    # s1 alloc = min(19, 16) = 16 (UNcapped), s3 = min(19, 160) = 19.
    span20 = " ".join(f"w{i}" for i in range(20))
    docs = [
        (0, span20 + " a1 a2 a3 a4", "en", "s1"),
        (1, span20 + " b1 b2 b3 b4", "en", "s2"),
        (2, " ".join(f"u{i}" for i in range(40)), "en", "s3"),
    ]
    sf = _write(spark, tmp_path, docs)
    strip = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip"](spark, sf).collect()
    }
    import hashlib

    assert strip[0]["n_before"] == 24 and strip[0]["n_after"] == 4
    assert (
        strip[0]["digest"]
        == hashlib.md5(b"a1 a2 a3 a4").hexdigest()
    )
    assert strip[2]["n_after"] == 40  # untouched

    bud = {
        r["source"]: r
        for r in Q.QUERIES["q_dedup_adjusted_budget"](
            spark, sf
        ).collect()
    }
    assert bud["s1"]["covered_tokens"] == 20
    assert bud["s1"]["effective_tokens"] == 4
    assert bud["s1"]["source_cap"] == 19
    assert bud["s1"]["allocated"] == 16
    assert bud["s3"]["allocated"] == 19


def test_strip_fully_duplicated_doc_has_null_digest(spark, tmp_path):
    twin = " ".join(f"t{i}" for i in range(16))
    docs = [(0, twin, "en", "s1"), (1, twin, "en", "s2")]
    sf = _write(spark, tmp_path, docs)
    rows = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_substring_strip"](spark, sf).collect()
    }
    assert rows[0]["n_after"] == 0
    assert rows[0]["digest"] is None


_DUP = "the quick brown fox jumps over the lazy dog tonight"


def test_lang_split_loser_convention(spark, tmp_path):
    # (0 en, 1 de) exact near-dup pair across languages: the loser is
    # doc 1 (greater id), so de loses its 10 tokens and en keeps all
    docs = [
        (0, _DUP, "en", "s1"),
        (1, _DUP, "de", "s2"),
        (2, "completely different content about engines", "en", "s1"),
    ]
    sf = _write(spark, tmp_path, docs)
    rows = {
        r["lang"]: r
        for r in Q.QUERIES["q_lang_split"](spark, sf).collect()
    }
    assert rows["en"]["n_docs"] == 2
    assert rows["en"]["n_docs_lost"] == 0
    assert rows["en"]["tokens_retained"] == rows["en"]["n_tokens"]
    assert rows["de"]["n_docs_lost"] == 1
    assert rows["de"]["tokens_lost"] == 10
    assert rows["de"]["tokens_retained"] == 0


def test_lang_dup_matrix_direction(spark, tmp_path):
    docs = [
        (0, _DUP, "en", "s1"),
        (1, _DUP, "de", "s2"),
        (2, _DUP, "de", "s3"),
    ]
    sf = _write(spark, tmp_path, docs)
    rows = {
        (r["owner_lang"], r["loser_lang"]): r
        for r in Q.QUERIES["q_lang_dup_matrix"](spark, sf).collect()
    }
    # pairs: (0,1) en->de, (0,2) en->de, (1,2) de->de
    assert rows[("en", "de")]["n_pairs"] == 2
    assert rows[("en", "de")]["n_losers"] == 2
    assert rows[("de", "de")]["n_pairs"] == 1
    assert rows[("de", "de")]["n_losers"] == 1


def test_token_budget_by_lang_integer_arithmetic(spark, tmp_path):
    # en 90 tokens, de 10 -> total 100, cap = 2*100 div 5 = 40;
    # en: least(40, 360) = 40 (capped), de: least(40, 40) = 40
    # (exactly 4 epochs) -> both 40% of budget
    docs = [
        (0, " ".join(f"e{i}" for i in range(90)), "en", "s1"),
        (1, " ".join(f"d{i}" for i in range(10)), "de", "s2"),
    ]
    sf = _write(spark, tmp_path, docs)
    rows = {
        r["lang"]: r
        for r in Q.QUERIES["q_token_budget_by_lang"](
            spark, sf
        ).collect()
    }
    assert rows["en"]["lang_cap"] == 40
    assert rows["en"]["allocated"] == 40
    assert rows["en"]["budget_pct"] == 40
    assert rows["de"]["allocated"] == 40
    assert rows["de"]["n_tokens"] == 10


def test_merge_token_extents_matches_bruteforce_union(spark):
    """Randomized pin of the interval-union merge (r9 advice fix):
    for 40 seeded-random island sets (disjoint, gap>=1 window runs —
    exactly what gaps-and-islands emits), the merged-interval sum
    hi-lo+16 must equal the brute-force size of the union of token
    extents [lo, hi+15]. All cases ride ONE DataFrame/job."""
    import random

    from pyspark.sql import functions as F

    from babylon_data_loader_spark.queries.round9 import (
        merge_token_extents,
    )

    rng = random.Random(4217)
    rows, want = [], {}
    for doc in range(40):
        pos, islands = 0, []
        for _ in range(rng.randint(1, 8)):
            pos += rng.randint(1, 30)  # gap >= 1 window position
            lo = pos
            hi = lo + rng.randint(0, 25)
            islands.append((lo, hi))
            pos = hi + 1
        covered = set()
        for lo, hi in islands:
            covered.update(range(lo, hi + 16))
        want[doc] = len(covered)
        rows += [(doc, lo, hi) for lo, hi in islands]
    isl = spark.createDataFrame(
        rows, "doc_id BIGINT, lo BIGINT, hi BIGINT"
    )
    got = {
        r["doc_id"]: r["covered"]
        for r in merge_token_extents(isl)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("hi") - F.col("lo") + F.lit(16)).alias(
                "covered"
            )
        )
        .collect()
    }
    assert got == want
