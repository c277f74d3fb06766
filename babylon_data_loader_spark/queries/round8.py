"""Round-8 registry growth: embedding-space clustering and the
corpus-engineering queries that ride on it, plus prefix boilerplate,
epoch budgeting, and n-gram diversity.

- ``q_kmeans_assign``: nearest-centroid assignment over a fixed
  deterministic codebook (operators/kmeans.py) — per-cluster sizes
  and inertia, exact-oracled.
- ``q_cluster_reps``: cluster-balanced (diversity) sampling — the
  closest member per cluster, the coreset-selection step SemDeDup-
  style pipelines run after clustering.
- ``q_kmeans_refine``: 3 Lloyd iterations, rows-only self-certifying
  (RAISES unless inertia is non-increasing — the Lloyd invariant).
- ``q_label_propagation``: 2 synchronous rounds of majority-label
  propagation over the verified near-dup graph (shared at-rest pair
  store) — the weak-supervision label-cleanup step.
- ``q_epoch_allocation``: data-constrained multi-epoch budgeting —
  every source gets up to 4 epochs of its own tokens, capped by a
  fair share of a 2x-corpus token budget. Pure integer arithmetic.
- ``q_ngram_diversity``: distinct/total n-gram ratios (n = 1, 2, 3)
  per source — the Self-BLEU-style template-collapse signal.
- ``q_embedding_outliers``: top-20 vectors farthest from the global
  centroid — embedding-space anomaly triage.
- ``q_prefix_dedup``: shared-prefix (first-8-token) boilerplate
  groups — crawl header/footer detection by md5 group keys.

Scale notes: the codebook collapses to one broadcast collect_list row
(k x dim); assignment is a per-row array_min over a scored copy of
that array — no per-vector shuffle, only the O(k)-row codebook
exchange; centroid updates are one
map-combinable grouped average; label propagation shuffles bare
(id, label) pairs over the at-rest pair store; everything else is
single-aggregate scans. Numerics follow the cross-engine rules:
distances are rounded-9 doubles ranked via e9-quantized BIGINT keys
with id tiebreaks; cross-row sums go through DECIMAL on rounded
grids; integer budgets use `div`/`//` floor division on positives.

Reference analogue: none (the reference is a CSV->Mongo ETL loader,
SURVEY.md §3); these extend the LLM-pipeline track the survey's §2
marks as the engine's growth surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.cache import persist_tracked
from babylon_data_loader_spark.functions.text import shingles, tokens
from babylon_data_loader_spark.queries import query
from babylon_data_loader_spark.queries.round7 import _PAIRS_WITH_J_CTE
from babylon_data_loader_spark.schemas import load_table

_TOK = r"regexp_split_to_array(trim(lower(text)), '\s+')"

#: squared L2 between embeddings row `e` and centroid row `c` —
#: list_sum matches the Spark-side sequential left fold
#: (functions/vectors.py::squared_l2) exactly.
_SQ_L2 = (
    "list_sum(list_transform(generate_series(1, len(e.embedding)), "
    "i -> (CAST(e.embedding[i] AS DOUBLE) "
    "- CAST(c.embedding[i] AS DOUBLE)) "
    "* (CAST(e.embedding[i] AS DOUBLE) "
    "- CAST(c.embedding[i] AS DOUBLE))))"
)

_ASSIGN_CTE = f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, c.cid, round({_SQ_L2}, 9) AS dist
      FROM embeddings e, cents c
    ), best AS (
      SELECT vec_id, cid, dist
      FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY vec_id
        ORDER BY CAST(round(dist * 1000000000) AS BIGINT) ASC,
                 cid ASC) = 1
    )"""


def _fixed_centroids(emb: DataFrame) -> DataFrame:
    """The deterministic k=8 codebook both exact k-means queries
    share: the 8 smallest-id vectors, cid = vec_id."""
    return emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("centroid"),
    )


@query(
    "q_kmeans_assign",
    oracle=_ASSIGN_CTE
    + """
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(dist AS DECIMAL(28,12))) AS DOUBLE)
             AS total_dist,
           CAST(SUM(CAST(dist AS DECIMAL(28,12))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_dist
    FROM best GROUP BY cid ORDER BY cid
    """,
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the k-means E-step) over a fixed
    deterministic codebook — per-cluster membership counts and
    inertia, the partition SemDeDup / IVF training reads first.
    Assignment is operators/kmeans.py::assign_clusters: the k x dim
    codebook broadcasts as ONE collect_list row, distances are
    rounded-9 doubles minimized on their e9 BIGINT quantization with
    a smallest-cid tiebreak via per-row array_min — no per-vector
    shuffle, only the O(k)-row codebook exchange. Inertia follows the
    round-to-grid-then-DECIMAL rule, so every output value is
    bit-stable across engines and partitionings."""
    from babylon_data_loader_spark.operators.kmeans import (
        assign_clusters,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = assign_clusters(emb, _fixed_centroids(emb))
    total = F.sum(
        F.col("dist").cast("decimal(28,12)")
    ).cast("double")
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            total.alias("total_dist"),
            (total / F.count(F.lit(1)).cast("double")).alias(
                "mean_dist"
            ),
        )
        .orderBy("cid")
    )


@query(
    "q_cluster_reps",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT e.vec_id, c.cid, round({_SQ_L2}, 9) AS dist
      FROM embeddings e, cents c
      WHERE e.vec_id >= 8
    ), best AS (
      SELECT vec_id, cid, dist
      FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY vec_id
        ORDER BY CAST(round(dist * 1000000000) AS BIGINT) ASC,
                 cid ASC) = 1
    ), sizes AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n FROM best GROUP BY cid
    ), reps AS (
      SELECT cid, vec_id, dist
      FROM best
      QUALIFY row_number() OVER (
        PARTITION BY cid
        ORDER BY CAST(round(dist * 1000000000) AS BIGINT) ASC,
                 vec_id ASC) = 1
    )
    SELECT r.cid, r.vec_id AS rep_vec_id, r.dist AS rep_dist, s.n
    FROM reps r JOIN sizes s ON s.cid = r.cid
    ORDER BY r.cid
    """,
)
def q_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced (diversity) sampling: the member closest to
    each centroid — one representative per region of embedding space,
    the coreset-selection step after clustering. Codebook seed
    vectors are excluded from assignment (a seed's distance to its
    own centroid is 0, which would make every representative a seed);
    per-cluster argmin uses the same quantized-distance + smallest-id
    total order as assignment, and the k-group window is rank-limit
    pruned so no cluster ever serializes onto one task."""
    from babylon_data_loader_spark.operators.kmeans import (
        assign_clusters,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = persist_tracked(
        assign_clusters(
            emb.where(F.col("vec_id") >= 8), _fixed_centroids(emb)
        )
    )
    sizes = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("dist_e9").asc(), F.col("vec_id").asc()
    )
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(F.broadcast(sizes), "cid")
        .select(
            "cid",
            F.col("vec_id").alias("rep_vec_id"),
            F.col("dist").alias("rep_dist"),
            "n",
        )
        .orderBy("cid")
    )


# --- q_kmeans_refine: oracle-backed since r11 ------------------------------
# Through r10 this was rows-only ("iterative refinement is not
# SQL-expressible") — true for FLOAT Lloyd, whose grouped mean is
# fold-order-sensitive. r11 pins the trajectory to a DuckDB oracle by
# running Lloyd on the integer grid (operators/det_ann.py): vectors
# quantized to 1e6 BIGINTs, assignment by exact integer squared-L2
# with centroid-id tiebreaks, refined centroids as FLOOR-DIV means
# (sum // n), which lands them back on the grid so the next
# assignment is again exact. Quantized refinement keeps Lloyd's
# descent up to the floor perturbation: moving a centroid from the
# exact mean m to floor(m) raises its cluster SSE by n·Σ_d(m_d−c_d)²
# ≤ 64·n grid units, so inertia_{t+1} ≤ inertia_t + 64·N — the
# in-query raise enforces that PROVEN bound (the float operator keeps
# its strict-monotone check in operators/kmeans.py + tests).

_KMR_DIM = 64
_KMR_K = 8


def _kmeans_refine_oracle() -> str:
    from babylon_data_loader_spark.operators.det_ann import (
        sql_int_sq_dist,
        sql_quant,
    )

    def asg(src: str, cb: str) -> str:
        dist = sql_int_sq_dist("qv.q", "s.c", _KMR_DIM)
        return f"""(
      SELECT qv.vec_id, s.cid, {dist} AS dist
      FROM {src} qv CROSS JOIN {cb} s
      QUALIFY row_number() OVER (
        PARTITION BY qv.vec_id ORDER BY dist ASC, s.cid ASC) = 1
    )"""

    def refine(a: str) -> str:
        # DuckDB // TRUNCATES toward zero on negative dividends while
        # python // floors — the ((sd % n) + n) % n repair (the
        # tests/test_floor_buckets.py discipline) makes sd exactly
        # divisible so truncation equals flooring
        return f"""(
      SELECT cid,
             list((sd - ((sd % n) + n) % n) // n ORDER BY d) AS c
      FROM (
        SELECT a.cid, g.d, SUM(qv.q[g.d]) AS sd,
               COUNT(*) AS n
        FROM {a} a
        JOIN qv ON qv.vec_id = a.vec_id
        CROSS JOIN generate_series(1, {_KMR_DIM}) AS g(d)
        GROUP BY a.cid, g.d
      ) GROUP BY cid
    )"""

    return f"""
    WITH qv AS (
      SELECT vec_id, {sql_quant('embedding')} AS q FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {_KMR_K}
    ), a1 AS {asg('qv', 'c0')}
    , c1 AS {refine('a1')}
    , a2 AS {asg('qv', 'c1')}
    , c2 AS {refine('a2')}
    , a3 AS {asg('qv', 'c2')}
    , shift12 AS (
      SELECT CAST(SUM(CASE WHEN a1.cid <> a2.cid THEN 1 ELSE 0 END)
                  AS BIGINT) AS n
      FROM a1 JOIN a2 ON a2.vec_id = a1.vec_id
    ), shift23 AS (
      SELECT CAST(SUM(CASE WHEN a2.cid <> a3.cid THEN 1 ELSE 0 END)
                  AS BIGINT) AS n
      FROM a2 JOIN a3 ON a3.vec_id = a2.vec_id
    )
    SELECT 1 AS iter, CAST(SUM(dist) AS BIGINT) AS inertia,
           CAST(COUNT(*) AS BIGINT) AS n_shifted FROM a1
    UNION ALL
    SELECT 2, CAST(SUM(dist) AS BIGINT), (SELECT n FROM shift12)
    FROM a2
    UNION ALL
    SELECT 3, CAST(SUM(dist) AS BIGINT), (SELECT n FROM shift23)
    FROM a3
    ORDER BY iter
    """


@query("q_kmeans_refine", oracle=_kmeans_refine_oracle())
def q_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd iterations of distributed k-means on the integer grid
    (k=8, deterministic first-k-ids init): assignment broadcasts the
    literal codebook (zero per-vector shuffle, operators/kmeans.py
    shape) and the update is ONE map-combinable groupBy(cid) carrying
    64 per-dimension SUMs PLUS the per-cluster inertia part (no
    explode — partial aggregation keeps the shuffle at k·dim+2
    scalars), so each of the first two iterations is a single pass.
    Because the assignment is a pure function of (q, codebook), the
    shift counts do NOT need persisted per-iteration assignments: one
    FINAL pass recomputes all three (cid, dist) pairs per row and
    aggregates both shift counts and the last inertia together — 4
    jobs total over the vectors (init collect, 2 update passes, 1
    trajectory pass) instead of the former 8, which is also the
    fewer-full-scans shape that matters at 100 TB. The driver only
    ever holds k × dim centroid integers per iteration. Emits the
    (iter, inertia, n_shifted) trajectory; inertia is exact BIGINT in
    squared-grid units (per-cluster parts summed in Python — integer
    addition is fold-order-proof). RAISES if any iteration exceeds
    the proven quantized-descent bound inertia_prev + 64·N.

    The fit lives in the at-rest trained-model store
    (det_ann.int_lloyd_trajectory_store, r13 VERDICT ask #2): the
    full-corpus training passes run once per dataset version, and a
    warm run reads n_iters rows of model metadata — k-means training
    is index construction, so it amortizes exactly like the LSH
    signature and PQ code stores. The descent bound is re-checked on
    every read (stored or fresh), so a corrupted store still
    raises."""
    from babylon_data_loader_spark.operators.det_ann import (
        int_lloyd_trajectory_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = int_lloyd_trajectory_store(
        emb, "kmr", _KMR_K, 3, _KMR_DIM
    )
    hist = sorted(
        (int(r["iter"]), int(r["inertia"]), int(r["n_shifted"]))
        for r in model.select("iter", "inertia", "n_shifted").collect()
    )
    n_total = hist[0][2]  # iter 1: every vector newly assigned
    for prev, cur in zip(hist, hist[1:]):
        if cur[1] > prev[1] + 64 * n_total:
            raise AssertionError(
                "quantized Lloyd exceeded the floor-perturbation "
                f"descent bound: {hist}"
            )
    return spark.createDataFrame(
        hist, "iter BIGINT, inertia BIGINT, n_shifted BIGINT"
    )


@query(
    "q_label_propagation",
    oracle=_PAIRS_WITH_J_CTE
    + """
    , nodes AS (
      SELECT vec_id AS id, label FROM embeddings
    ), edges AS (
      SELECT p.doc_a AS src, p.doc_b AS dst FROM pairs p
      JOIN nodes na ON na.id = p.doc_a
      JOIN nodes nb ON nb.id = p.doc_b
      UNION ALL
      SELECT p.doc_b AS src, p.doc_a AS dst FROM pairs p
      JOIN nodes na ON na.id = p.doc_a
      JOIN nodes nb ON nb.id = p.doc_b
      UNION ALL
      SELECT id AS src, id AS dst FROM nodes
    ), r1 AS (
      SELECT id, label FROM (
        SELECT e.src AS id, n.label, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM edges e JOIN nodes n ON n.id = e.dst
        GROUP BY e.src, n.label
      ) QUALIFY row_number() OVER (
          PARTITION BY id ORDER BY cnt DESC, label ASC) = 1
    ), r2 AS (
      SELECT id, label FROM (
        SELECT e.src AS id, n.label, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM edges e JOIN r1 n ON n.id = e.dst
        GROUP BY e.src, n.label
      ) QUALIFY row_number() OVER (
          PARTITION BY id ORDER BY cnt DESC, label ASC) = 1
    )
    SELECT r2.label,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CASE WHEN r2.label <> n0.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_relabelled
    FROM r2 JOIN nodes n0 ON n0.id = r2.id
    GROUP BY r2.label
    ORDER BY r2.label
    """,
)
def q_label_propagation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two synchronous rounds of majority-label propagation over the
    verified near-dup graph: near-duplicate documents should agree on
    their label, so each node adopts the most common label among its
    dup-neighbors (self-loop included — a node's own label votes),
    ties toward the smallest label. The label-cleanup / weak-
    supervision step run before training on labeled corpora. Edges
    come from the shared at-rest pair store (both directions + self
    loops, bare id pairs); each round is one (id, label) count
    aggregate and a rank-limit-pruned argmax window per node — at
    100 TB the shuffle carries ids and small-int labels only."""
    from babylon_data_loader_spark.operators.dedup import (
        stored_verified_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    labels = persist_tracked(
        load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("id"), "label"
        )
    )
    pairs = stored_verified_pairs(docs).select("doc_a", "doc_b")
    # only pairs where BOTH endpoints carry a label participate
    labeled = (
        pairs.join(
            labels.select(F.col("id").alias("doc_a")),
            "doc_a",
            "left_semi",
        ).join(
            labels.select(F.col("id").alias("doc_b")),
            "doc_b",
            "left_semi",
        )
    )
    edges = persist_tracked(
        labeled.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        .unionByName(
            labeled.select(
                F.col("doc_b").alias("src"),
                F.col("doc_a").alias("dst"),
            )
        )
        .unionByName(
            labels.select(
                F.col("id").alias("src"), F.col("id").alias("dst")
            )
        )
    )

    def _propagate(lbl: DataFrame) -> DataFrame:
        cnt = (
            edges.join(
                lbl.select(
                    F.col("id").alias("dst"), F.col("label")
                ),
                "dst",
            )
            .select(F.col("src").alias("id"), "label")
            .groupBy("id", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("id").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        return (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", "label")
        )

    r2 = _propagate(_propagate(labels))
    return (
        r2.join(
            labels.select("id", F.col("label").alias("_l0")), "id"
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(
                F.when(F.col("label") != F.col("_l0"), 1).otherwise(0)
            ).alias("n_relabelled"),
        )
        .orderBy("label")
    )


@query(
    "q_epoch_allocation",
    oracle=f"""
    WITH per AS (
      SELECT source, CAST(SUM(len({_TOK})) AS BIGINT) AS nt
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(nt) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM per
    )
    SELECT p.source, p.nt AS n_tokens,
           CAST(2 * t.total // t.n_sources AS BIGINT) AS fair_share,
           CAST(LEAST(2 * t.total // t.n_sources, 4 * p.nt)
                AS BIGINT) AS allocated,
           CAST(LEAST(2 * t.total // t.n_sources, 4 * p.nt) * 100
                // p.nt AS BIGINT) AS epochs_pct
    FROM per p, tot t
    ORDER BY p.source
    """,
)
def q_epoch_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-constrained multi-epoch budgeting: a 2x-corpus token
    budget is split into fair per-source shares; each source
    contributes up to 4 epochs of its own tokens (repeating scarce
    high-value sources, capping abundant ones) — the mixture schedule
    a token-budgeted pretraining run derives before sampling.
    Everything is BIGINT floor arithmetic (`div` / `//` on
    positives), so no ratio can diverge between engines; epochs are
    reported as integer percent. One token-count aggregate plus one
    single-row broadcast — map-combinable end to end."""
    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select(
            "source",
            F.size(tokens(F.lower(F.col("text")))).cast("long").alias(
                "_t"
            ),
        )
        .groupBy("source")
        .agg(F.sum("_t").cast("long").alias("nt"))
    )
    per = persist_tracked(per)
    tot = per.agg(
        F.sum("nt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    share = F.expr("2 * total div n_sources")
    alloc = F.least(share, F.lit(4) * F.col("nt"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("nt").alias("n_tokens"),
            share.alias("fair_share"),
            alloc.alias("allocated"),
            F.expr(
                "least(2 * total div n_sources, 4 * nt) * 100 div nt"
            ).alias("epochs_pct"),
        )
        .orderBy("source")
    )


@query(
    "q_ngram_diversity",
    oracle=f"""
    WITH tokd AS (
      SELECT source, {_TOK} AS tok FROM documents
    ), grams AS (
      SELECT source, 1 AS n, unnest(tok) AS g FROM tokd
      UNION ALL
      SELECT source, 2 AS n,
             unnest(CASE WHEN len(tok) >= 2
               THEN list_transform(generate_series(1, len(tok) - 1),
                      j -> concat_ws(' ', tok[j], tok[j+1]))
               ELSE [array_to_string(tok, ' ')] END) AS g
      FROM tokd
      UNION ALL
      SELECT source, 3 AS n,
             unnest(CASE WHEN len(tok) >= 3
               THEN list_transform(generate_series(1, len(tok) - 2),
                      j -> concat_ws(' ', tok[j], tok[j+1], tok[j+2]))
               ELSE [array_to_string(tok, ' ')] END) AS g
      FROM tokd
    )
    SELECT source, CAST(n AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS total_ngrams,
           CAST(COUNT(DISTINCT g) AS BIGINT) AS distinct_ngrams,
           CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*) AS diversity
    FROM grams GROUP BY source, n ORDER BY source, n
    """,
)
def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct/total n-gram ratios per source for n = 1, 2, 3 — the
    Self-BLEU-style diversity signal: a source whose trigram
    diversity collapses relative to its unigram diversity is
    template-generated or heavily boilerplated. n-grams reuse the
    dedup family's shingle builder (functions/text.py::shingles,
    including its short-document fallback, mirrored in the oracle's
    CASE); the grouped distinct is exact (the same grouped-distinct
    aggregate q_source_overlap ships) and map-side-combines the total
    counts."""
    docs = load_table(spark, sf_dir, "documents")
    tokd = persist_tracked(
        docs.select(
            "source", tokens(F.lower(F.col("text"))).alias("tok")
        )
    )
    frames = [
        tokd.select(
            "source",
            F.lit(k).cast("long").alias("n"),
            F.explode(shingles(F.col("tok"), k)).alias("g"),
        )
        for k in (1, 2, 3)
    ]
    grams = frames[0].unionByName(frames[1]).unionByName(frames[2])
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.countDistinct("g").alias("distinct_ngrams"),
            (
                F.countDistinct("g").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("diversity"),
        )
        .orderBy("source", "n")
    )


@query(
    "q_embedding_outliers",
    oracle="""
    WITH dims AS (
      SELECT e.vec_id, u.d, CAST(e.embedding[u.d] AS DOUBLE) AS v
      FROM embeddings e,
           LATERAL (SELECT unnest(generate_series(1,
                      len(e.embedding))) AS d) u
    ), cent AS (
      SELECT d,
             CAST(SUM(CAST(round(v, 9) AS DECIMAL(28,12)))
                  AS DOUBLE) / COUNT(*) AS c
      FROM dims GROUP BY d
    ), per_vec AS (
      SELECT dm.vec_id,
             CAST(SUM(CAST(round((dm.v - ct.c) * (dm.v - ct.c), 12)
                           AS DECIMAL(28,12))) AS DOUBLE) AS dist
      FROM dims dm JOIN cent ct ON ct.d = dm.d
      GROUP BY dm.vec_id
    )
    SELECT e.vec_id, e.label, round(pv.dist, 9) AS dist
    FROM per_vec pv JOIN embeddings e ON e.vec_id = pv.vec_id
    ORDER BY CAST(round(pv.dist * 1000000000) AS BIGINT) DESC,
             e.vec_id ASC
    LIMIT 20
    """,
)
def q_embedding_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 vectors farthest from the global embedding centroid —
    the anomaly-triage list (mis-embedded, corrupt, or off-
    distribution documents) a curation pipeline reviews before
    training. The centroid is a per-dimension DECIMAL-exact mean
    (dim driver-scale rows, the codebook pattern shared with
    q_label_cohesion); squared distances sum rounded-12 products
    through DECIMAL so the ranking key is bit-stable; top-20 is a
    distributed TakeOrdered on the e9-quantized key with vec_id
    tiebreak, never a global window."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = persist_tracked(
        emb.select(
            "vec_id", F.posexplode("embedding").alias("d0", "v0")
        ).select(
            "vec_id",
            (F.col("d0") + 1).alias("d"),
            F.col("v0").cast("double").alias("v"),
        )
    )
    cent = dims.groupBy("d").agg(
        (
            F.sum(F.round(F.col("v"), 9).cast("decimal(28,12)"))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("c")
    )
    per_vec = (
        dims.join(F.broadcast(cent), "d")
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.round(
                    (F.col("v") - F.col("c"))
                    * (F.col("v") - F.col("c")),
                    12,
                ).cast("decimal(28,12)")
            )
            .cast("double")
            .alias("dist")
        )
    )
    return (
        per_vec.join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.round(F.col("dist"), 9).alias("dist"),
            F.round(F.col("dist") * F.lit(1000000000.0))
            .cast("bigint")
            .alias("_k"),
        )
        .orderBy(F.col("_k").desc(), F.col("vec_id").asc())
        .limit(20)
        .drop("_k")
    )


@query(
    "q_prefix_dedup",
    oracle=f"""
    WITH pfx AS (
      SELECT doc_id, source,
             md5(array_to_string(({_TOK})[1:8], ' ')) AS ph
      FROM documents
    )
    SELECT ph AS prefix_hash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS owner_doc_id
    FROM pfx
    GROUP BY ph
    HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, prefix_hash ASC
    LIMIT 20
    """,
)
def q_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix boilerplate groups: documents opening with the
    same first 8 tokens (crawl headers, license banners, template
    intros) grouped by a 16-byte md5 of the prefix — the
    prefix-duplicate signal that exact whole-text dedup misses and
    3-gram near-dup only catches diluted. One hash-keyed aggregate
    over (prefix_hash, source, doc_id); top-20 by group size with
    the hash itself as the total-order tiebreak."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    ph = F.md5(F.concat_ws(" ", F.slice(toks, 1, 8)))
    return (
        docs.select(
            "doc_id", "source", ph.alias("prefix_hash")
        )
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("owner_doc_id"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(
            F.col("n_docs").desc(), F.col("prefix_hash").asc()
        )
        .limit(20)
    )
