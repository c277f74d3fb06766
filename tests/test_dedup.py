"""Dedup operator family: exact, MinHash/LSH, Jaccard verify."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "THE  quick   brown fox jumps over the lazy dog  "),  # exact dup (normalized)
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different text about spark engines and data"),
        (5, "another unrelated document with its own words entirely"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_dedup_exact(spark, docs):
    from babylon_data_loader_spark.operators.dedup import dedup_exact

    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [1, 3, 4, 5]  # 2 collapses into 1


def test_lsh_candidates_find_near_dup(spark, docs):
    from babylon_data_loader_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sig = minhash_signatures(docs)
    pairs = {
        (r["doc_a"], r["doc_b"]) for r in lsh_candidate_pairs(sig).collect()
    }
    assert (1, 2) in pairs  # exact dups always share all bands
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup shares ≥1 band


def test_jaccard_verify_scores(spark, docs):
    from babylon_data_loader_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify(docs, pairs, threshold=0.0).collect()
    }
    # doc2 lower-cases/tokenizes to doc1's exact shingle set → 1.0
    assert verified[(1, 2)] == pytest.approx(1.0)
    # doc3 differs in the final token: 6 of 7 shingles shared → 6/8
    assert verified[(1, 3)] == pytest.approx(0.75)


def test_dedup_near_pipeline(spark, docs):
    from babylon_data_loader_spark.operators.dedup import dedup_near

    kept = sorted(r["doc_id"] for r in dedup_near(docs, threshold=0.8).collect())
    # 2 (jaccard 1.0 to 1) dropped; 3 (0.75 < 0.8) kept
    assert kept == [1, 3, 4, 5]
    strict = sorted(
        r["doc_id"] for r in dedup_near(docs, threshold=0.6).collect()
    )
    assert strict == [1, 4, 5]  # 0.75 ≥ 0.6 ⇒ 3 dropped too


def test_stored_verified_pairs_forwards_id_col_and_bands(spark, tmp_path):
    """Non-default id_col/n_bands must reach candidate generation:
    before the r7 fix, an 8-band build scanned only b0..b3 and a
    renamed id column crashed resolution."""
    import os

    A = "the quick brown fox jumps over the lazy dog again"
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf)
    spark.createDataFrame(
        [(1, A), (2, A), (3, "totally unrelated text content here")],
        "id BIGINT, text STRING",
    ).write.parquet(os.path.join(sf, "docs.parquet"))
    docs = spark.read.parquet(os.path.join(sf, "docs.parquet"))
    pairs = stored_verified_pairs(
        docs, id_col="id", n_bands=8
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}
    assert pairs[0]["jaccard"] == 1.0
