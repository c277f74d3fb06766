"""queries/round7c.py semantic edges: fertility counts punctuation
and digit runs as extra pieces (and whitespace as none), the
confusion audit buckets planted same-/cross-label dup pairs exactly,
and cohesion is 1.0 for parallel members, lower for a spread label,
with the centroid computed per label.
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
EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


@pytest.fixture(scope="module", autouse=True)
def _load():
    Q.load_all()


def _write(spark, tmp_path, docs=None, embs=None):
    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf, exist_ok=True)
    if docs is not None:
        spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, t, s in docs], DOC_SCHEMA
        ).write.mode("overwrite").parquet(
            os.path.join(sf, "documents.parquet")
        )
    if embs is not None:
        spark.createDataFrame(embs, EMB_SCHEMA).write.mode(
            "overwrite"
        ).parquet(os.path.join(sf, "embeddings.parquet"))
    return sf


def test_fertility_counts_pieces_not_whitespace(spark, tmp_path):
    # "ab cd" -> 2 pieces / 2 words (fertility 1); "ab-cd x9!" ->
    # pieces: ab, -, cd, x, 9, ! = 6; words: 2 -> fertility 3
    sf = _write(
        spark,
        tmp_path,
        docs=[(0, "ab cd", "plain"), (1, "ab-cd x9!", "marked")],
    )
    out = {
        r["source"]: r
        for r in
        Q.QUERIES["q_tokenizer_fertility"](spark, sf).collect()
    }
    assert out["plain"]["total_pieces"] == 2
    assert out["plain"]["total_words"] == 2
    assert out["plain"]["fertility"] == 1.0
    assert out["marked"]["total_pieces"] == 6
    assert out["marked"]["total_words"] == 2
    assert out["marked"]["fertility"] == 3.0


def test_pair_label_confusion_buckets(spark, tmp_path):
    text_a = "the quick brown fox jumps over the lazy dog"
    text_b = "completely different content about query engines here"
    # dup pair (0,1): labels 2,2 -> same; dup pair (2,3): labels
    # 1,3 -> cross (bucketed as least/greatest = (1,3))
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, text_a, "s"),
            (1, text_a, "s"),
            (2, text_b, "s"),
            (3, text_b, "s"),
        ],
        embs=[
            (0, [1.0, 0.0], 2),
            (1, [0.9, 0.1], 2),
            (2, [0.0, 1.0], 1),
            (3, [0.1, 0.9], 3),
        ],
    )
    out = {
        (r["label_a"], r["label_b"]): (r["n_pairs"], r["n_same"])
        for r in
        Q.QUERIES["q_pair_label_confusion"](spark, sf).collect()
    }
    assert out == {(2, 2): (1, 1), (1, 3): (1, 0)}


def test_label_cohesion_parallel_vs_spread(spark, tmp_path):
    # label 0: two identical unit vectors -> centroid == members,
    # cohesion exactly 1.0. label 1: two orthogonal unit vectors ->
    # centroid at 45 degrees, each member's cosine = cos(45) ~ 0.7071.
    sf = _write(
        spark,
        tmp_path,
        embs=[
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 1),
            (3, [0.0, 1.0], 1),
        ],
    )
    out = {
        r["label"]: r
        for r in Q.QUERIES["q_label_cohesion"](spark, sf).collect()
    }
    assert out[0]["n"] == 2
    assert out[0]["mean_cohesion"] == pytest.approx(1.0, abs=1e-8)
    assert out[1]["n"] == 2
    assert out[1]["mean_cohesion"] == pytest.approx(
        math.cos(math.pi / 4), abs=1e-6
    )


def test_dedup_savings_drops_non_representatives(spark, tmp_path):
    # cluster {0,1,2} (4 tokens each): keeps 0, drops 1+2 -> saves 8
    # of 12 tokens in s1; singleton 3 (6 tokens) saves nothing in s2
    trio = "one two three four"
    solo = "alpha beta gamma delta epsilon zeta"
    sf = _write(
        spark,
        tmp_path,
        docs=[
            (0, trio, "s1"),
            (1, trio, "s1"),
            (2, trio, "s1"),
            (3, solo, "s2"),
        ],
    )
    out = {
        r["source"]: r
        for r in Q.QUERIES["q_dedup_savings"](spark, sf).collect()
    }
    assert out["s1"]["n_docs"] == 3
    assert out["s1"]["n_dropped"] == 2
    assert out["s1"]["total_tokens"] == 12
    assert out["s1"]["saved_tokens"] == 8
    assert out["s1"]["saved_rate"] == pytest.approx(8 / 12)
    assert out["s2"]["n_dropped"] == 0
    assert out["s2"]["saved_tokens"] == 0
    assert out["s2"]["saved_rate"] == 0.0
