"""queries/round6.py edge semantics beyond the DuckDB oracle harness:
the re-ranker must actually REORDER retrieval output, budget
boundaries must be integer-exact, and winsorization bounds must be the
hand-computed order statistics."""

from __future__ import annotations

import os

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


def test_rerank_reorders_retrieval(spark, tmp_path):
    """A candidate with slightly lower cosine but full lexical overlap
    with the query document must outrank a higher-cosine candidate
    with zero overlap — proof the second stage is not a no-op."""
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    # query 0 || near-parallel 1 (no shared tokens) and slightly less
    # parallel 2 (identical text)
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.999, 0.0447, 0.0, 0.0], 0),   # cos ~0.999
        (2, [0.995, 0.0999, 0.0, 0.0], 0),   # cos ~0.995
        (3, [0.0, 1.0, 0.0, 0.0], 1),
    ]
    spark.createDataFrame(
        vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))
    docs = [
        (0, "alpha beta gamma", "en", "web", 0),
        (1, "delta epsilon zeta", "en", "web", 0),
        (2, "alpha beta gamma", "en", "web", 0),
        (3, "eta theta iota", "en", "web", 0),
    ]
    spark.createDataFrame(
        docs,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    ).write.parquet(os.path.join(sf, "documents.parquet"))

    out = {
        (r["query_id"], r["rank"]): r
        for r in Q.QUERIES["q_rerank_candidates"](spark, sf).collect()
    }
    first = out[(0, 1)]
    second = out[(0, 2)]
    assert first["cand_id"] == 2          # re-ranked up by jaccard=1
    assert first["lexical_jaccard"] == 1.0
    assert second["cand_id"] == 1
    assert second["lexical_jaccard"] == 0.0
    assert first["sim"] < second["sim"]   # retrieval alone had 1 first


def test_token_budget_boundary_and_quality_order(spark, tmp_path):
    """Integer budget test cum*2 <= total: the doc that lands exactly
    on 50% is kept, the next is cut; the repetitive doc is selected
    LAST despite being first by doc_id."""
    rows = [
        # 4 tokens each; total 16 tokens -> budget = cum*2 <= 16
        (1, "spam spam spam spam", "a", "en", 0),      # ratio 0.25
        (2, "one two three four", "a", "en", 0),       # ratio 1.0
        (3, "five six seven eight", "a", "en", 0),     # ratio 1.0
        (4, "nine ten nine ten", "a", "en", 0),        # ratio 0.5
    ]
    sf = _write_docs(
        spark,
        tmp_path,
        [(d, t, lg, s, n) for d, t, s, lg, n in rows],
    )
    got = Q.QUERIES["q_token_budget_sample"](spark, sf).collect()
    # order: doc 2 (cum 4), doc 3 (cum 8 == exactly half) kept;
    # doc 4 (cum 12) and doc 1 cut
    assert [(r["doc_id"], r["cum_tokens"]) for r in got] == [
        (2, 4),
        (3, 8),
    ]


def test_source_budget_is_per_source(spark, tmp_path):
    """Each source spends its own 30%: a small clean source keeps its
    best doc even though a big source dominates the corpus."""
    rows = []
    # big source: 10 docs x 10 tokens (distinct) = 100 tokens; 30% =
    # 30 -> top 3 docs (cum 10,20,30 <= 30)
    for i in range(10):
        toks = " ".join(f"w{i}_{j}" for j in range(10))
        rows.append((i, toks, "en", "big", 0))
    # small source: 2 docs x 5 tokens = 10 tokens; 30% = 3 -> cum 5*10
    # = 50 > 30 -> NO doc fits (5*10 <= 3*10 false)
    rows.append((100, "a b c d e", "en", "small", 0))
    rows.append((101, "f g h i j", "en", "small", 0))
    sf = _write_docs(spark, tmp_path, rows)
    got = Q.QUERIES["q_source_token_budget"](spark, sf).collect()
    by_source = {}
    for r in got:
        by_source.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_source.get("big", [])) == 3
    assert "small" not in by_source  # 1 doc already exceeds its 30%


def test_winsorize_hand_computed(spark, tmp_path):
    """user with n=20 values 1..20: lo rank = ceil(0.05*20)=1 -> 1,
    hi rank = ceil(0.95*20)=19 -> 19; 20 clips to 19."""
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    rows = [(i, 7, "view", float(i)) for i in range(1, 21)]
    spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
    ).write.parquet(os.path.join(sf, "events.parquet"))
    got = {
        r["event_id"]: r["clipped"]
        for r in Q.QUERIES["q_winsorize"](spark, sf).collect()
    }
    assert got[1] == 1.0     # at lo bound, unchanged
    assert got[19] == 19.0
    assert got[20] == 19.0   # clipped to p95
    assert got[10] == 10.0


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    """Planted pool: candidate 2 is a near-duplicate of the first pick
    (sim ~1.0) and 3 sits on the OTHER side of the query (negative
    off-axis component -> sim to the first pick only ~0.79 despite
    rel 0.94). Plain top-2 would take {1,2}; MMR step 2 must flip to
    3 (0.7*0.94 - 0.3*0.79 = 0.42 beats 0.7*0.95 - 0.3*1.0 = 0.365),
    and the twin only enters at step 3 once the penalty is paid."""
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),            # query
        (1, [0.95, 0.312, 0.0, 0.0], 0),          # rel ~0.950, pick 1
        (2, [0.95, 0.310, 0.01, 0.0], 0),         # rel ~0.950, dup of 1
        (3, [0.94, -0.341, 0.0, 0.0], 1),         # rel ~0.940, sim(3,1)~0.79
        (4, [0.5, 0.0, 0.0, 0.866], 1),           # rel 0.5, filler
    ]
    spark.createDataFrame(
        vecs, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))
    got = {
        r["step"]: r
        for r in Q.QUERIES["q_mmr_diversify"](spark, sf).collect()
    }
    # 2 edges out 1 at step 1 (marginally smaller norm -> higher
    # cosine); what matters: its TWIN is deferred past the diverse 3
    assert got[1]["vec_id"] == 2
    assert got[2]["vec_id"] == 3   # diversification flips the twin out
    assert got[3]["vec_id"] == 1   # twin admitted only after 3
    assert got[2]["max_sim_selected"] is not None
    assert got[3]["max_sim_selected"] > 0.99
