"""queries/round7.py semantic edges beyond the DuckDB oracle harness:
planted corpora with hand-computable answers for the corpus-engineering
wave — head-coverage cutoffs land on the exact integer-crossmul
boundary, boilerplate shingles are counted only above the 25% df bar,
log2 buckets split at powers of two, each normalization stage collapses
exactly the planted dupes, the bigram LM reproduces hand-computed
add-one NLLs, RRF rewards presence in both rank lists, source overlap
is exact Jaccard of shingle sets, and the threshold sweep is monotone
over the verified-pairs store.
"""

from __future__ import annotations

import math
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


def _write_docs(spark, tmp_path, rows, with_nchars=False):
    """rows: (doc_id, text[, source[, n_chars]]) tuples."""
    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf, exist_ok=True)
    full = []
    for r in rows:
        doc_id, text = r[0], r[1]
        source = r[2] if len(r) > 2 else "src"
        n_chars = r[3] if len(r) > 3 else len(text)
        full.append((doc_id, text, "en", source, n_chars))
    spark.createDataFrame(full, DOC_SCHEMA).write.mode(
        "overwrite"
    ).parquet(os.path.join(sf, "documents.parquet"))
    return sf


def test_vocab_coverage_integer_cutoffs(spark, tmp_path):
    # freqs: a=4 b=2 c=1 d=1, total=8. 50% needs cum*100 >= 50*8=400:
    # a alone (cum 400) EXACTLY meets it — the boundary case a float
    # ratio could miss. 90% needs 720: only d (cum 800) crosses.
    sf = _write_docs(spark, tmp_path, [(0, "a a a a b b"), (1, "c d")])
    out = {
        r["level"]: (r["n_terms"], r["cum_tokens"], r["total_tokens"])
        for r in Q.QUERIES["q_vocab_coverage"](spark, sf).collect()
    }
    assert out[50] == (1, 4, 8)
    assert out[90] == (4, 8, 8)
    assert out[99] == (4, 8, 8)


def test_boilerplate_ngrams_df_bar(spark, tmp_path):
    # 4 docs -> boilerplate bar is df*4 > 4, i.e. df >= 2. The chrome
    # shingle "nav home page" is in docs 0+1 (df 2 -> boiler); every
    # other shingle is unique (df 1 -> not).
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "nav home page alpha beta", "s1"),
            (1, "nav home page gamma delta", "s1"),
            (2, "epsilon zeta eta", "s2"),
            (3, "theta iota kappa", "s2"),
        ],
    )
    out = {
        r["source"]: r for r in
        Q.QUERIES["q_boilerplate_ngrams"](spark, sf).collect()
    }
    # doc 0/1 shingles: 3 each ("nav home page", "home page alpha",
    # "page alpha beta" / ...), exactly 1 boiler each.
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["n_ngrams"] == 6
    assert out["s1"]["n_boiler"] == 2
    assert out["s1"]["boiler_rate"] == pytest.approx(2 / 6)
    assert out["s2"]["n_boiler"] == 0
    assert out["s2"]["boiler_rate"] == 0.0


def test_length_histogram_power_of_two_buckets(spark, tmp_path):
    # bit-length buckets: 1->1, 3->2, 4->3, 7->3, 8->4 (the 4/7/8
    # triple brackets both sides of the 2^2 and 2^3 boundaries).
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "x", "s", 1),
            (1, "x", "s", 3),
            (2, "x", "s", 4),
            (3, "x", "s", 7),
            (4, "x", "s", 8),
        ],
    )
    out = {
        r["len_bucket"]: (r["n_docs"], r["total_chars"])
        for r in Q.QUERIES["q_length_histogram"](spark, sf).collect()
    }
    assert out == {1: (1, 1), 2: (1, 3), 3: (2, 11), 4: (1, 8)}


def test_normalization_impact_stagewise(spark, tmp_path):
    # 4 texts, each normalization stage collapses exactly one more:
    # lower folds "A b" onto "a b"; trim+lower additionally folds the
    # padded " a b " (but NOT the double-space "a  b");
    # whitespace-collapse folds all four into one.
    sf = _write_docs(
        spark,
        tmp_path,
        [(0, "a b"), (1, "A b"), (2, "a  b"), (3, " a b ")],
    )
    out = {
        r["stage"]: (r["n_distinct"], r["n_collapsed"])
        for r in
        Q.QUERIES["q_normalization_impact"](spark, sf).collect()
    }
    assert out["a_raw"] == (4, 0)
    assert out["b_lower"] == (3, 1)
    assert out["c_trim_lower"] == (2, 2)
    assert out["d_ws_collapse"] == (1, 3)


def test_bigram_nll_add_one_smoothing(spark, tmp_path):
    # corpus bigrams: (a,b)x3, (b,a)x1; c1: a=3, b=1; V=2.
    # P(b|a) = (3+1)/(3+2) = 0.8; P(a|b) = (1+1)/(1+2) = 2/3.
    sf = _write_docs(spark, tmp_path, [(0, "a b a b"), (1, "a b")])
    out = {
        r["doc_id"]: r
        for r in Q.QUERIES["q_bigram_nll"](spark, sf).collect()
    }
    nll_ab = -math.log(0.8)
    nll_ba = -math.log(2 / 3)
    assert out[0]["n_bigrams"] == 3
    assert out[0]["avg_nll"] == pytest.approx(
        (2 * nll_ab + nll_ba) / 3, abs=1e-9
    )
    assert out[1]["n_bigrams"] == 1
    assert out[1]["avg_nll"] == pytest.approx(nll_ab, abs=1e-9)


def test_rrf_fusion_rewards_both_lists(spark, tmp_path):
    # doc 1: vector rank 1 but zero lexical overlap; doc 2: vector
    # rank 2 AND lexical rank 1 -> RRF must put 2 first
    # (1/62 + 1/61 > 1/61).
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma"),
            (1, "delta epsilon zeta"),
            (2, "alpha beta gamma"),
            (3, "eta theta iota"),
        ],
    )
    vecs = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.999, 0.0447, 0.0], 0),
        (2, [0.995, 0.0999, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 1),
    ]
    spark.createDataFrame(
        vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.mode("overwrite").parquet(
        os.path.join(sf, "embeddings.parquet")
    )
    rows = Q.QUERIES["q_rrf_fusion"](spark, sf).collect()
    assert rows[0]["doc_id"] == 2
    assert rows[0]["rv"] == 2 and rows[0]["rl"] == 1
    e12 = 10**12
    assert rows[0]["score_e12"] == e12 // 62 + e12 // 61
    by_doc = {r["doc_id"]: r for r in rows}
    # doc 1 is vector-only: null lexical rank, score from one list
    assert by_doc[1]["rl"] is None
    assert by_doc[1]["score_e12"] == e12 // 61


def test_source_overlap_exact_jaccard(spark, tmp_path):
    # s1 and s2 share ALL shingles (identical text) -> jaccard 1.0;
    # s3 is disjoint -> no (s1,s3)/(s2,s3) rows at all.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "one two three four", "s1"),
            (1, "one two three four", "s2"),
            (2, "five six seven eight", "s3"),
        ],
    )
    rows = Q.QUERIES["q_source_overlap"](spark, sf).collect()
    pairs = {(r["source_a"], r["source_b"]): r for r in rows}
    assert set(pairs) == {("s1", "s2")}
    assert pairs[("s1", "s2")]["n_common"] == 2
    assert pairs[("s1", "s2")]["jaccard"] == 1.0


def test_dedup_threshold_sweep_monotone(spark, tmp_path):
    # identical pair (0,1): jaccard 1.0 survives every threshold;
    # (2,3) share 2 of 4 shingles -> jaccard 1/3 < 0.5, never stored.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "the quick brown fox jumps"),
            (1, "the quick brown fox jumps"),
            (2, "aa bb cc dd ee"),
            (3, "aa bb cc xx yy"),
        ],
    )
    out = {
        r["t"]: (r["threshold"], r["n_pairs"])
        for r in
        Q.QUERIES["q_dedup_threshold_sweep"](spark, sf).collect()
    }
    assert out == {
        5: (0.5, 1),
        6: (0.6, 1),
        7: (0.7, 1),
        8: (0.8, 1),
    }
