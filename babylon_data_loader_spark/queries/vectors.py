"""Similarity-search declared queries over `embeddings`
(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).

Brute-force cosine top-k is the exactness baseline (oracle-checked);
the LSH-bucketed variant in operators/similarity.py is the 100 TB
path (rows-only check — the bucketing is not reasonably
SQL-expressible).

Float discipline: similarity values are ROUNDED to 9 decimals in both
engines before ranking/output, and ranking tiebreaks on vec_id, so
sub-ulp fold differences cannot flip the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.vectors import cosine, l2_norm
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.schemas import load_table

# DuckDB twins: explicit double-cast element folds.
_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
)


def _norm_sql(tbl: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({tbl}.embedding, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    )


# Session-level memo for the recall guards' brute-force baseline: the
# five ANN queries each need exact top-k of the SAME anchor over the
# SAME table; keyed by content fingerprint so regenerated testdata can
# never serve a stale baseline (the q_knn_pq index-store discipline).
_EXACT_TOPK_MEMO: dict[tuple[str, int], frozenset] = {}


def _exact_topk_ids(emb: DataFrame, k: int) -> frozenset:
    from babylon_data_loader_spark.operators.index_store import (
        df_fingerprint,
    )
    from babylon_data_loader_spark.operators.similarity import (
        knn_bruteforce,
    )

    fp = df_fingerprint(emb)
    key = (fp, k)
    if fp is None or key not in _EXACT_TOPK_MEMO:
        ids = frozenset(
            r["vec_id"]
            for r in knn_bruteforce(emb, query_vec_id=0, k=k).collect()
        )
        if fp is None:
            return ids
        _EXACT_TOPK_MEMO[key] = ids
    return _EXACT_TOPK_MEMO[key]


def _assert_recall(
    emb: DataFrame, result: DataFrame, k: int, bound: float, method: str
) -> DataFrame:
    """In-query approximation-quality gate for the rows-only ANN
    queries: compare the approximate top-k against brute-force cosine
    on the SAME input and raise if recall@k falls below the bound the
    unit tests establish (tests/test_similarity.py). The driver's
    rows-only check then fails loudly on a recall regression instead
    of recording a green row for garbage neighbors — the
    `q_lake_skipping` assert-inside-the-query pattern. The brute-force
    baseline (a TakeOrdered scan, no shuffle) is memoized per dataset
    content fingerprint — five ANN queries share one baseline pass per
    session instead of five."""
    exact = _exact_topk_ids(emb, k)
    got = {r["vec_id"] for r in result.select("vec_id").collect()}
    recall = len(exact & got) / k
    if recall < bound:
        raise AssertionError(
            f"{method}: recall@{k} {recall:.2f} < required {bound}"
        )
    # The measured recall and its bound ride along as scalar columns,
    # so the driver's rows-only record WITNESSES the acceptance
    # criterion instead of just a row count (r4 VERDICT, stretch #8).
    return result.withColumn(
        "recall_at_k", F.lit(round(recall, 4))
    ).withColumn("recall_bound", F.lit(float(bound)))


@query(
    "q_knn_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0)
    SELECT a.vec_id, a.label,
           round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('q')}), 9)
             AS sim
    FROM embeddings a, q
    WHERE a.vec_id <> 0
    ORDER BY sim DESC, a.vec_id ASC
    LIMIT 10
    """,
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id 0. The one-row
    query vector is broadcast (literally: a 1-row crossJoin); the scan
    side never shuffles — top-k is a TakeOrdered. This is the correct
    baseline ANN answers are measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding")
    )
    sim = F.round(
        cosine(F.col("embedding"), F.col("q_embedding")), 9
    ).alias("sim")
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select("vec_id", "label", sim)
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


@query(
    "q_embedding_stats",
    oracle=f"""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(round({_norm_sql('embeddings')}, 9)) AS min_norm,
           MAX(round({_norm_sql('embeddings')}, 9)) AS max_norm
    FROM embeddings GROUP BY label
    """,
)
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats over the vector column (min/max are
    order-insensitive, so no decimal dance needed — just rounding)."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.round(l2_norm(F.col("embedding")), 9)
    return (
        emb.select("label", nrm.alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


@query(
    "q_embedding_dup_pairs",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 5 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_DOT_SQL.replace('q.embedding', 'b.embedding')}
                 / ({_norm_sql('a')} * {_norm_sql('b')}), 9) AS sim
    FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
    WHERE round({_DOT_SQL.replace('q.embedding', 'b.embedding')}
                / ({_norm_sql('a')} * {_norm_sql('b')}), 9) >= 1.0
    """,
)
def q_embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via the SCALE path: banded sign-LSH
    (per-bucket joins, hot-bucket guard, no all-pairs anywhere — the
    plan contains no CartesianProduct, asserted in tests/test_plans.py).

    The testdata plants no true duplicates, so the query plants its
    own: every 5th vector is duplicated under vec_id+1000000. A planted
    pair has cosine exactly 1.0 ⇒ identical sign bits in every band ⇒
    LSH recall is provably 100% at the rounded-cosine-1.0 threshold,
    which is what lets the exact all-pairs oracle verify an
    approximate algorithm exactly. (The threshold is 1.0 after
    9-decimal rounding — only bit-identical vectors reach it, so the
    oracle can never contain a natural near-pair that banded LSH is
    merely LIKELY to recall.) (`q_embedding_dup_pairs_exact` keeps the all-pairs form
    as the small-N verification baseline.)

    The pair chain comes from the at-rest embedding-pair store
    (stored_embedding_pairs): bucketing + verification run once per
    dataset version and q_semantic_dedup reads the same parquet."""
    from babylon_data_loader_spark.operators.similarity import (
        stored_embedding_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    copies = emb.filter(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000000)
    )
    corpus = emb.unionByName(copies)
    return stored_embedding_pairs(corpus, threshold=1.0)


@query(
    "q_embedding_dup_pairs_exact",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_DOT_SQL.replace('q.embedding', 'b.embedding')}
                 / ({_norm_sql('a')} * {_norm_sql('b')}), 9) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round({_DOT_SQL.replace('q.embedding', 'b.embedding')}
                / ({_norm_sql('a')} * {_norm_sql('b')}), 9) >= 0.45
    """,
)
def q_embedding_dup_pairs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs embedding near-dup (threshold 0.45 — the tail
    of the random cosine distribution stands in for dups). O(N²) by
    construction: the verification baseline for small N, NOT the scale
    path — that is `q_embedding_dup_pairs` (banded sign-LSH)."""
    from babylon_data_loader_spark.operators.similarity import (
        embedding_dup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dup_pairs(emb, threshold=0.45, exact=True)


@query("q_knn_ivf")  # rows-only: k-means float averaging is not
# reproducible in SQL (order-dependent float sums); recall is tested
# against q_knn_cosine in tests/test_similarity.py
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec_id 0 via an IVF index
    (operators/ivf.py): deterministic k-means fit, cluster_id stamped
    on the table (partition-prunable at write time), exact cosine
    re-rank within the nprobe nearest lists."""
    from babylon_data_loader_spark.operators.ivf import (
        ivf_index,
        ivf_search,
        kmeans_fit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(emb, k=16, n_iters=2)
    indexed = ivf_index(emb, centroids)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    out = ivf_search(
        indexed.filter(F.col("vec_id") != 0),
        centroids,
        qvec,
        k=10,
        nprobe=4,
    )
    return _assert_recall(emb, out, k=10, bound=0.3, method="ivf")


@query("q_knn_lsh")  # rows-only: LSH bucketing is not SQL-expressible
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec_id 0 via random-hyperplane
    LSH over an AT-REST index (operators/similarity.py): the table is
    written once partitioned by sign bucket; the probe is a
    partition-pruned read of the Hamming-ball buckets, then exact
    cosine re-ranks — the search never scans the full table
    (plan-asserted in tests/test_similarity.py). The index store is
    keyed by the table's CONTENT fingerprint (operators/index_store.py)
    so the first call per dataset version builds it and every later
    call is pure probe cost — and regenerated testdata can never serve
    a stale index. Declared without an oracle (driver records
    rows-only), but recall@10 vs brute force is ASSERTED in-query.
    """
    from babylon_data_loader_spark.operators.similarity import knn_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_lsh(emb, query_vec_id=0, k=10, n_planes=8)
    return _assert_recall(emb, out, k=10, bound=0.3, method="lsh")


@query("q_knn_pq")  # rows-only: k-means codebooks are not
# SQL-expressible; recall vs q_knn_cosine is tested in
# tests/test_similarity.py
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec_id 0 via product
    quantization (operators/pq.py): per-subspace codebooks trained
    deterministically, vectors stored as m-byte codes (32× smaller
    than fp32 — at 100 TB the scan reads codes, not floats), ADC
    lookup-table distance, exact cosine re-rank of the top candidate
    pool only."""
    import os as _os

    from babylon_data_loader_spark.operators.index_store import (
        df_fingerprint,
        ensure_store_meta,
        lineage_files,
        store_path,
        sweep_stale,
        write_store_meta,
    )
    from babylon_data_loader_spark.operators.pq import (
        pq_encode,
        pq_fit,
        pq_search,
        read_pq_index,
        write_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # Train-once/search-many: the codes table is the at-rest index
    # (like the LSH/IVF stores), keyed by the table's CONTENT
    # fingerprint — NOT its path — so the driver regenerating testdata
    # in place gets a fresh index (stale path-keyed codes served old
    # vec_ids/codebooks against new vectors); old-fingerprint dirs are
    # swept. A real deployment rebuilds the index on ingest, not per
    # query.
    fp = df_fingerprint(emb)
    if fp is None:  # no file lineage: build in-session, skip the store
        books = pq_fit(emb, m=8, ksub=16, n_iters=2)
        codes = pq_encode(emb, books).select("vec_id", "label", "pq_code")
    else:
        index_path = store_path(spark, "pq_index", fp, "m8k16")
        sweep_stale(spark, "pq_index", "m8k16", keep=index_path)
        from babylon_data_loader_spark.operators.index_store import (
            ACCESS_LOG,
        )

        ACCESS_LOG.append(
            {
                "kind": "pq_index",
                "params": "m8k16",
                "hit": _os.path.exists(
                    _os.path.join(index_path, "_codebooks.json")
                ),
            }
        )
        if _os.path.exists(_os.path.join(index_path, "_codebooks.json")):
            # legacy stores predate the source-file sidecar; backfill
            # so the next sweep_stale doesn't evict this live index
            ensure_store_meta(index_path, emb)
            codes, books = read_pq_index(spark, index_path)
        else:
            books = pq_fit(emb, m=8, ksub=16, n_iters=2)
            write_pq_index(
                pq_encode(emb, books).select("vec_id", "label", "pq_code"),
                index_path,
                books,
            )
            write_store_meta(index_path, lineage_files(emb))
            codes, books = read_pq_index(spark, index_path)
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    out = pq_search(
        codes.filter(F.col("vec_id") != 0),
        books,
        qvec,
        k=10,
        rerank=emb.filter(F.col("vec_id") != 0),
    )
    return _assert_recall(emb, out, k=10, bound=0.3, method="pq")


@query(
    "q_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 5 = 0
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
      WHERE round({_DOT_SQL.replace('q.embedding', 'b.embedding')}
                  / ({_norm_sql('a')} * {_norm_sql('b')}), 9) >= 1.0
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL
      SELECT id_b AS a, id_a AS b FROM pairs
    ), walk AS (
      SELECT vec_id AS node, vec_id AS label FROM corpus
      UNION
      SELECT e.b AS node, w.label FROM walk w JOIN edges e ON e.a = w.node
    )
    SELECT node AS vec_id,
           CAST(MIN(label) AS BIGINT) AS cluster_id,
           MIN(label) = node AS kept
    FROM walk GROUP BY node
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-level) dedup end to end — the SemDeDup
    recipe as a composition of declared operators: banded sign-LSH
    candidate pairs (no all-pairs, hot-bucket-guarded) → connected
    components (min-label propagation) → keep one representative per
    cluster (the min vec_id). Planted duplicates (every 5th vector
    re-inserted under vec_id+1000000) make LSH recall provably 100%
    at the rounded-cosine-1.0 threshold (only bit-identical vectors
    reach it), so the exact all-pairs + RECURSIVE-CTE oracle checks
    the whole approximate pipeline exactly. Pairs come from the
    shared at-rest embedding-pair store (same parquet
    q_embedding_dup_pairs reads — built once per dataset version)."""
    from babylon_data_loader_spark.operators.graph import (
        connected_components,
    )
    from babylon_data_loader_spark.operators.similarity import (
        stored_embedding_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    copies = emb.filter(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1000000)
    )
    corpus = emb.unionByName(copies)
    pairs = stored_embedding_pairs(corpus, threshold=1.0)
    comp = connected_components(
        corpus.select(F.col("vec_id").alias("id")),
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
    )
    return comp.select(
        F.col("id").alias("vec_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
        (F.col("component") == F.col("id")).alias("kept"),
    )


@query("q_knn_ivfpq")  # rows-only: k-means + residual codebooks are
# not SQL-expressible; recall vs brute force tested in
# tests/test_similarity.py
def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 neighbors of vec_id 0 via IVF-PQ
    (operators/pq.py::ivfpq_build/ivfpq_search): coarse k-means lists
    prune candidates (the partition axis), PQ residual codes shrink
    the scanned bytes 32x (the I/O axis), per-cluster ADC ranks, and
    exact cosine re-ranks the candidate pool — the composed
    at-rest ANN layout for 100 TB embedding tables."""
    from babylon_data_loader_spark.operators.pq import (
        ivfpq_build,
        ivfpq_search,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    codes, centroids, books = ivfpq_build(
        emb, k_coarse=16, m=8, ksub=16, n_iters=2
    )
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    out = ivfpq_search(
        codes.filter(F.col("vec_id") != 0),
        centroids,
        books,
        qvec,
        k=10,
        nprobe=6,
        rerank=emb.filter(F.col("vec_id") != 0),
    )
    return _assert_recall(emb, out, k=10, bound=0.3, method="ivfpq")


@query(
    "q_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT embedding, label FROM embeddings WHERE vec_id = 0)
    SELECT a.vec_id, a.label,
           round({_DOT_SQL} / ({_norm_sql('a')} * {_norm_sql('q')}), 9)
             AS sim
    FROM embeddings a, q
    WHERE a.vec_id <> 0 AND a.label <> q.label
    ORDER BY sim DESC, a.vec_id ASC
    LIMIT 5
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: the 5 nearest
    neighbors of the anchor whose LABEL DIFFERS — the pairs that teach
    an embedding model the most. Same zero-shuffle shape as
    q_knn_cosine (broadcast 1-row anchor, scan-side similarity +
    label filter, TakeOrdered); at 100 TB the per-anchor mining fans
    out as a broadcast batch of anchors, exactly like q_knn_batch."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchor = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"),
        F.col("label").alias("q_label"),
    )
    sim = F.round(
        cosine(F.col("embedding"), F.col("q_embedding")), 9
    ).alias("sim")
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(anchor))
        .filter(F.col("label") != F.col("q_label"))
        .select("vec_id", "label", sim)
        .orderBy(F.col("sim").desc(), F.col("vec_id").asc())
        .limit(5)
    )
