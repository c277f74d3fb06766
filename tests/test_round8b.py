"""Planted-fixture semantics for the round-8 query waves: hand-
computable inputs pin each query's contract (ownership direction,
coverage arithmetic, burstiness values, epoch allocation, decile
labeling, propagation majority) independently of the DuckDB oracle
comparison that tests/test_oracle.py already runs."""

from __future__ import annotations

import os

import pytest

import babylon_data_loader_spark.queries as Q

DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, "
    "n_chars BIGINT"
)
EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


@pytest.fixture(scope="module", autouse=True)
def _load():
    Q.load_all()


def _write(spark, tmp_path, docs=None, embs=None):
    """docs rows: (doc_id, text, lang, source)."""
    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf, exist_ok=True)
    if docs is not None:
        spark.createDataFrame(
            [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
            DOC_SCHEMA,
        ).write.mode("overwrite").parquet(
            os.path.join(sf, "documents.parquet")
        )
    if embs is not None:
        spark.createDataFrame(embs, EMB_SCHEMA).write.mode(
            "overwrite"
        ).parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


_DUP_A = "the quick brown fox jumps over the lazy dog tonight"
_DUP_B = "completely different content about query engines and lakes"


def test_cross_lingual_dup_buckets(spark, tmp_path):
    # (0 en, 1 de) duplicate -> cross-language bucket (de, en);
    # (2 en, 3 en) duplicate -> same-language bucket (en, en)
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, _DUP_A, "en", "s"),
            (1, _DUP_A, "de", "s"),
            (2, _DUP_B, "en", "s"),
            (3, _DUP_B, "en", "s"),
        ],
    )
    rows = {
        (r["lang_lo"], r["lang_hi"]): r["n_pairs"]
        for r in Q.QUERIES["q_cross_lingual_dup"](spark, sf).collect()
    }
    assert rows == {("de", "en"): 1, ("en", "en"): 1}


def test_source_dedup_matrix_direction(spark, tmp_path):
    # pair (0, 1): smaller id 0 belongs to "early" -> early owns,
    # "late" copies; pair (2, 3) is within-source.
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, _DUP_A, "en", "early"),
            (1, _DUP_A, "en", "late"),
            (2, _DUP_B, "en", "late"),
            (3, _DUP_B, "en", "late"),
        ],
    )
    rows = {
        (r["owner_source"], r["copier_source"]): r["n_pairs"]
        for r in Q.QUERIES["q_source_dedup_matrix"](
            spark, sf
        ).collect()
    }
    assert rows == {("early", "late"): 1, ("late", "late"): 1}


def test_burstiness_values(spark, tmp_path):
    # "x" appears 3x in each of 5 docs: cf=15, df=5, burstiness 3.0;
    # "y" once per doc: cf=5, df=5, burstiness 1.0. df >= 5 passes
    # both; ranked x first (e6 key 3,000,000 > 1,000,000).
    sf = _write(
        spark,
        tmp_path,
        docs=[(i, "x x x y", "en", "s") for i in range(5)],
    )
    rows = Q.QUERIES["q_burstiness"](spark, sf).collect()
    assert [(r["term"], r["cf"], r["df"], r["burstiness"]) for r in rows] == [
        ("x", 15, 5, 3.0),
        ("y", 5, 5, 1.0),
    ]


def test_heldout_coverage_hand_computed(spark, tmp_path):
    # A: "a b", B: "b c". Unigram "b" occurs in both (covered token in
    # each, 1 of 2); "a"/"c" are source-exclusive. Each source's
    # single bigram is exclusive -> bigram coverage 0.
    sf = _write(
        spark,
        tmp_path,
        docs=[(0, "a b", "en", "A"), (1, "b c", "en", "B")],
    )
    rows = {
        r["source"]: r
        for r in Q.QUERIES["q_heldout_coverage"](spark, sf).collect()
    }
    for s in ("A", "B"):
        assert rows[s]["n_tokens"] == 2
        assert rows[s]["covered_tokens"] == 1
        assert rows[s]["unigram_coverage"] == 0.5
        assert rows[s]["n_bigrams"] == 1
        assert rows[s]["covered_bigrams"] == 0
        assert rows[s]["bigram_coverage"] == 0.0


def test_heldout_coverage_one_token_docs(spark, tmp_path):
    """Sub-2-token docs must contribute NO bigrams (regression: an
    unguarded sequence(2, size) DESCENDS for size < 2, evaluating an
    out-of-range element — an ANSI crash or phantom bigrams). Source
    C is all one-token docs, so it has no bigram row at all and drops
    from the inner-joined output, exactly like the oracle."""
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, "a b", "en", "A"),
            (1, "b c", "en", "B"),
            (2, "a", "en", "C"),
            (3, "b", "en", "C"),
        ],
    )
    rows = {
        r["source"]: r
        for r in Q.QUERIES["q_heldout_coverage"](spark, sf).collect()
    }
    assert set(rows) == {"A", "B"}
    assert rows["A"]["n_bigrams"] == 1
    assert rows["B"]["n_bigrams"] == 1
    # C's one-token docs still count in A/B's unigram totals: "a" and
    # "b" now occur outside A, so both of A's tokens are covered
    assert rows["A"]["covered_tokens"] == 2


def test_epoch_allocation_hand_computed(spark, tmp_path):
    # A: 10 tokens, B: 2 tokens. total=12, budget=2*12=24, 2 sources
    # -> fair_share=12. A: alloc=min(12, 40)=12, epochs=1200//10=120%.
    # B: alloc=min(12, 8)=8 (4-epoch cap), epochs=800//2=400%.
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, " ".join(f"w{i}" for i in range(10)), "en", "A"),
            (1, "u v", "en", "B"),
        ],
    )
    rows = {
        r["source"]: r
        for r in Q.QUERIES["q_epoch_allocation"](spark, sf).collect()
    }
    assert rows["A"]["n_tokens"] == 10
    assert rows["A"]["fair_share"] == 12
    assert rows["A"]["allocated"] == 12
    assert rows["A"]["epochs_pct"] == 120
    assert rows["B"]["n_tokens"] == 2
    assert rows["B"]["allocated"] == 8
    assert rows["B"]["epochs_pct"] == 400


def test_prefix_dedup_groups(spark, tmp_path):
    prefix = "one two three four five six seven eight"
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, prefix + " tail alpha", "en", "A"),
            (1, prefix + " tail beta gamma", "en", "B"),
            (2, "totally different opening words here", "en", "A"),
        ],
    )
    rows = Q.QUERIES["q_prefix_dedup"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2
    assert r["n_sources"] == 2
    assert r["owner_doc_id"] == 0


def test_quality_calibration_deciles(spark, tmp_path):
    # distinct ratios 1.0 / 0.75 / 0.5 / 0.25 over 4-token docs;
    # n_tot=4 -> deciles (rn-1)*10 div 4 = 0, 2, 5, 7 with one doc
    # each; labels follow quality halves.
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, "a b c d", "en", "s"),
            (1, "a a b c", "en", "s"),
            (2, "a a b b", "en", "s"),
            (3, "a a a a", "en", "s"),
        ],
        embs=[
            (0, [1.0, 0.0], 7),
            (1, [1.0, 0.0], 7),
            (2, [0.0, 1.0], 9),
            (3, [0.0, 1.0], 9),
        ],
    )
    rows = [
        (r["decile"], r["n"], r["top_label"], r["top_share"])
        for r in Q.QUERIES["q_quality_calibration"](
            spark, sf
        ).collect()
    ]
    assert rows == [
        (0, 1, 7, 1.0),
        (2, 1, 7, 1.0),
        (5, 1, 9, 1.0),
        (7, 1, 9, 1.0),
    ]


def test_label_propagation_majority_relabels(spark, tmp_path):
    # triangle of duplicates 0-1-2 with labels 1, 2, 2: node 0 sees
    # votes {self:1, n1:2, n2:2} -> adopts 2; stable by round 2.
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, _DUP_A, "en", "s"),
            (1, _DUP_A, "en", "s"),
            (2, _DUP_A, "en", "s"),
        ],
        embs=[
            (0, [1.0, 0.0], 1),
            (1, [1.0, 0.0], 2),
            (2, [0.0, 1.0], 2),
        ],
    )
    rows = [
        (r["label"], r["n_nodes"], r["n_relabelled"])
        for r in Q.QUERIES["q_label_propagation"](
            spark, sf
        ).collect()
    ]
    assert rows == [(2, 3, 1)]


def test_ngram_diversity_template_collapse(spark, tmp_path):
    # 5 identical docs: unigram diversity 2/10; the single repeated
    # bigram gives 1/5; trigram hits the short-doc fallback (2 tokens
    # < 3 -> whole-doc shingle), also 1/5.
    sf = _write(
        spark,
        tmp_path,
        docs=[(i, "a b", "en", "s") for i in range(5)],
    )
    rows = {
        r["n"]: (r["total_ngrams"], r["distinct_ngrams"])
        for r in Q.QUERIES["q_ngram_diversity"](spark, sf).collect()
    }
    assert rows == {1: (10, 2), 2: (5, 1), 3: (5, 1)}
