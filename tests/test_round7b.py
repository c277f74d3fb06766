"""queries/round7b.py semantic edges beyond the oracle harness: the
90-day lateness boundary is strict (exactly 90 days is NOT late), the
Q16 blocklist anti-join removes excluded suppliers from the distinct
count, chunk dedup counts exactly the cross-document repeated 32-token
chunks, novelty attributes each shingle to its minimum doc_id, and the
cluster histogram reflects planted component sizes exactly.
"""

from __future__ import annotations

import datetime as dt
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


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, source) tuples."""
    sf = os.path.join(str(tmp_path), "sf")
    os.makedirs(sf, exist_ok=True)
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows], DOC_SCHEMA
    ).write.mode("overwrite").parquet(
        os.path.join(sf, "documents.parquet")
    )
    return sf


def test_tpch_q12_strict_90_day_boundary(spark, tmp_path):
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    base = dt.datetime(2020, 1, 1)
    spark.createDataFrame(
        [
            (1, base, "1-URGENT"),
            (2, base, "5-LOW"),
            (3, base, "2-HIGH"),
        ],
        "o_orderkey BIGINT, o_orderdate TIMESTAMP_NTZ, "
        "o_orderpriority STRING",
    ).write.parquet(os.path.join(sf, "orders.parquet"))
    spark.createDataFrame(
        [
            # exactly 90 days: NOT late (strict >)
            (1, "O", base + dt.timedelta(days=90)),
            # 91 days: late, high priority
            (1, "O", base + dt.timedelta(days=91)),
            # 100 days: late, low priority
            (2, "O", base + dt.timedelta(days=100)),
            # 89 days: not late
            (3, "F", base + dt.timedelta(days=89)),
            # late, high, other status bucket
            (3, "F", base + dt.timedelta(days=365)),
        ],
        "l_orderkey BIGINT, l_linestatus STRING, "
        "l_shipdate TIMESTAMP_NTZ",
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))
    out = {
        r["l_linestatus"]: (r["high_line_count"], r["low_line_count"])
        for r in Q.QUERIES["q_tpch_q12"](spark, sf).collect()
    }
    assert out == {"O": (1, 1), "F": (1, 0)}


def test_tpch_q16_blocklist_and_distinct(spark, tmp_path):
    sf = os.path.join(tmp_path, "sf")
    os.makedirs(sf)
    # catalog: part 1 offered by suppliers 10, 11, 12 (12 excluded:
    # balance < 1000) and by 10 TWICE (distinct must collapse);
    # part 2 only by excluded supplier 12 -> drops out entirely
    spark.createDataFrame(
        [(1, 10), (1, 10), (1, 11), (1, 12), (2, 12)],
        "l_partkey BIGINT, l_suppkey BIGINT",
    ).write.parquet(os.path.join(sf, "lineitem.parquet"))
    spark.createDataFrame(
        [
            (1, "Brand#11", "ECONOMY", 49),
            (2, "Brand#12", "PROMO", 14),
            (3, "Brand#45", "LARGE", 49),   # excluded brand
            (4, "Brand#13", "MEDIUM", 50),  # size not in the IN list
        ],
        "p_partkey BIGINT, p_brand STRING, p_type STRING, "
        "p_size INT",
    ).write.parquet(os.path.join(sf, "part.parquet"))
    spark.createDataFrame(
        [(10, 5000.0), (11, 1500.0), (12, 999.99)],
        "s_suppkey BIGINT, s_acctbal DOUBLE",
    ).write.parquet(os.path.join(sf, "supplier.parquet"))
    rows = Q.QUERIES["q_tpch_q16"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["p_brand"], r["p_type"], r["p_size"]) == (
        "Brand#11",
        "ECONOMY",
        49,
    )
    assert r["supplier_cnt"] == 2  # 10 and 11; 12 blocklisted


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_chunk_dedup_rate_counts_repeated_chunks(spark, tmp_path):
    a, b, c = _words("a", 32), _words("b", 32), _words("c", 32)
    # doc0 = A+B (source s1), doc1 = A+C (source s2): chunk A repeats
    # across documents, B and C are unique; doc2 is a short 5-token
    # doc (one sub-32 chunk, unique).
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, f"{a} {b}", "s1"),
            (1, f"{a} {c}", "s2"),
            (2, "tiny little five token doc", "s2"),
        ],
    )
    out = {
        r["source"]: r
        for r in Q.QUERIES["q_chunk_dedup_rate"](spark, sf).collect()
    }
    assert out["s1"]["n_chunks"] == 2
    assert out["s1"]["n_dup_chunks"] == 1
    assert out["s1"]["dup_rate"] == 0.5
    assert out["s2"]["n_chunks"] == 3
    assert out["s2"]["n_dup_chunks"] == 1
    assert out["s2"]["dup_rate"] == pytest.approx(1 / 3)


def test_ngram_novelty_min_id_attribution(spark, tmp_path):
    text = "alpha beta gamma delta epsilon"  # 3 shingles
    other = "one two three four five six"    # 4 shingles
    # doc0 owns all of `text`'s shingles; doc1 (same text, higher id)
    # owns none; doc2 unique -> owns all
    sf = _write_docs(
        spark,
        tmp_path,
        [(0, text, "s1"), (1, text, "s1"), (2, other, "s2")],
    )
    out = {
        r["source"]: r
        for r in Q.QUERIES["q_ngram_novelty"](spark, sf).collect()
    }
    assert out["s1"]["n_shingles"] == 6
    assert out["s1"]["n_novel"] == 3
    assert out["s1"]["novelty_rate"] == 0.5
    assert out["s2"]["n_novel"] == 4
    assert out["s2"]["novelty_rate"] == 1.0


def test_cluster_size_histogram_planted_components(spark, tmp_path):
    trio = "the quick brown fox jumps over the lazy dog"
    pair = "completely different content about query engines here"
    # component sizes: {0,1,2} -> 3, {3,4} -> 2, {5}, {6} -> 1 each
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, trio, "s"),
            (1, trio, "s"),
            (2, trio, "s"),
            (3, pair, "s"),
            (4, pair, "s"),
            (5, "unique text number five goes here", "s"),
            (6, "another unique text six words long", "s"),
        ],
    )
    out = {
        r["cluster_size"]: r["n_clusters"]
        for r in
        Q.QUERIES["q_cluster_size_histogram"](spark, sf).collect()
    }
    assert out == {1: 2, 2: 1, 3: 1}
