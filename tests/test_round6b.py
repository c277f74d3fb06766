"""queries/round6b.py edge semantics beyond the DuckDB oracle harness:
the m-estimate must actually shrink small categories toward the global
mean, quantile normalization must hit its [0, 1] endpoints, class
rebalancing must return exactly min-class-count rows per class, decay
weights must be the documented powers of two, and chi-squared must
rank a perfectly class-exclusive term first."""

from __future__ import annotations

import os
from datetime import datetime

import pytest

import babylon_data_loader_spark.queries as Q


@pytest.fixture(scope="module", autouse=True)
def _load():
    Q.load_all()


def _write_docs(spark, tmp_path, rows):
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        rows,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def test_target_encode_shrinks_small_category(spark, tmp_path):
    """n=1 category: enc = (v + 10*gmean)/11 — far from its own mean,
    close to global; big category stays near its own mean."""
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    rows = [("BIG", 100.0)] * 10 + [("RARE", 0.0)]
    spark.createDataFrame(
        rows, "o_orderpriority STRING, o_totalprice DOUBLE"
    ).write.parquet(os.path.join(sf, "orders.parquet"))
    out = {
        r["o_orderpriority"]: r
        for r in Q.QUERIES["q_target_encode"](spark, sf).collect()
    }
    gmean = 1000.0 / 11
    assert out["RARE"]["target_mean"] == 0.0
    assert out["RARE"]["target_enc"] == pytest.approx(
        (0.0 + 10 * gmean) / 11, abs=1e-9
    )
    assert out["BIG"]["target_enc"] == pytest.approx(
        (1000.0 + 10 * gmean) / 20, abs=1e-9
    )
    # shrinkage direction: both encodings sit between their own mean
    # and the global mean
    assert 0.0 < out["RARE"]["target_enc"] < gmean
    assert gmean < out["BIG"]["target_enc"] < 100.0


def test_quantile_normalize_endpoints(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a", "en", "web", 10),
            (2, "b", "en", "web", 20),
            (3, "c", "en", "web", 30),
            (4, "d", "en", "lone", 99),
        ],
    )
    out = {
        r["doc_id"]: r["qn"]
        for r in Q.QUERIES["q_quantile_normalize"](spark, sf).collect()
    }
    assert out[1] == 0.0
    assert out[2] == 0.5
    assert out[3] == 1.0
    assert out[4] == 0.5  # single-row group pins to the midpoint


def test_class_rebalance_exact_min_count(spark, tmp_path):
    sf = _write_docs(
        spark,
        tmp_path,
        [(i, "t", "en", "web", 1) for i in range(5)]
        + [(10 + i, "t", "fr", "web", 1) for i in range(2)],
    )
    rows = Q.QUERIES["q_class_rebalance"](spark, sf).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 2, "fr": 2}
    assert all(r["rn"] <= 2 for r in rows)


def test_decay_weighted_powers_of_two(spark, tmp_path):
    """ages 0d / 7d / 700d → weights 64 / 32 / 1 (capped); value 1.00
    → 100 cents each → score_x6400 = 100*(64+32+1)."""
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    ref = datetime(2024, 1, 1)
    rows = [
        (1, datetime(2024, 1, 1), 1.0),
        (1, datetime(2023, 12, 25), 1.0),   # 7 days → k=1
        (1, datetime(2022, 2, 1), 1.0),     # 700 days → k capped at 6
    ]
    spark.createDataFrame(
        rows, "user_id BIGINT, ts TIMESTAMP, value DOUBLE"
    ).write.parquet(os.path.join(sf, "events.parquet"))
    [r] = Q.QUERIES["q_decay_weighted"](spark, sf).collect()
    assert r["user_id"] == 1 and r["n"] == 3
    assert r["score_x6400"] == 100 * (64 + 32 + 1)
    assert r["decay_score"] == pytest.approx(9700 / 6400.0, abs=1e-9)
    assert ref  # silence unused (documents the reference date)


def test_chi2_exclusive_term_ranks_first(spark, tmp_path):
    """'aa' only in en (6/6 docs), 'bb' in every doc: bb is excluded
    by the tf < N zero-margin guard and aa tops en with the
    hand-computed chi2 = N = 12 (perfect association on a balanced
    2x2 table)."""
    sf = _write_docs(
        spark,
        tmp_path,
        [(i, "aa bb", "en", "web", 5) for i in range(6)]
        + [(10 + i, "cc bb", "fr", "web", 5) for i in range(6)],
    )
    rows = Q.QUERIES["q_chi2_terms"](spark, sf).collect()
    terms = {(r["lang"], r["term"]): r for r in rows}
    assert ("en", "bb") not in terms and ("fr", "bb") not in terms
    assert terms[("en", "aa")]["chi_rank"] == 1
    assert terms[("en", "aa")]["chi2"] == pytest.approx(12.0, abs=1e-9)
    assert terms[("fr", "cc")]["chi_rank"] == 1
