"""Distributed k-means (Lloyd) over embedding columns.

The clustering workhorse of LLM-corpus curation: SemDeDup-style
semantic grouping, cluster-balanced (diversity) sampling, and IVF
coarse quantizers all start from a k-means partition of the embedding
space. Everything here is DataFrame-native:

- **assign**: nearest-centroid by squared L2 — the k×dim codebook
  collapses to ONE broadcast row holding an array of (cid, centroid)
  structs, and each vector's argmin is an `F.aggregate` fold over
  that array: a zero-exchange projection, so assignment shuffles
  NOTHING — the property that matters when the codebook is an IVF
  coarse quantizer with thousands of centroids. (The r8 version
  ranked N×k scored rows through an id-partitioned window: an
  N×k-row shuffle.)
- **update**: new centroids are per-dimension means — posexplode to
  (cid, dim, value) and ONE map-combinable grouped average; k×dim
  result rows are codebook-scale (driver-safe metadata, the same
  materialization the IVF/PQ trainers use, operators/ivf.py).
- **iterate**: a driver loop over assign/update. Iteration count is
  a small constant (Lloyd converges fast and curation pipelines cap
  it); each iteration is two distributed jobs, so the driver never
  holds more than the k×dim codebook.

At 100 TB the vector table stays partitioned by id throughout; the
only data that ever reaches the driver is the codebook and the
per-iteration inertia scalar. Mini-batching (sampling a fraction per
update) drops in by filtering the assign input — the update algebra
is unchanged.

Determinism: centroid init is the k smallest-id vectors (not a random
sample), assignment ties break toward the smallest centroid id on an
integer-quantized distance key, and the update's mean and the
recorded inertia route their cross-row sums through DECIMAL on a
rounded grid (the repo's float-sum rule) — so a fixed input yields a
fixed clustering and a fixed trajectory on any partitioning and
executor count.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.vectors import squared_l2

#: codebooks up to this size embed as a literal array in the plan
#: (zero-exchange assignment); larger ones (IVF coarse quantizers)
#: fall back to a one-row collect_list broadcast so plan size stays
#: bounded. Tests monkeypatch this to exercise the fallback.
LITERAL_CODEBOOK_MAX = 1024


def assign_clusters(
    vecs: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cid_col: str = "cid",
    cent_col: str = "centroid",
) -> DataFrame:
    """(id, cid, dist): every vector labeled with its nearest centroid.

    ``dist`` is the squared L2 distance rounded to 9 dp; the argmin
    minimizes (dist_e9, cid) lexicographically — e9-quantized BIGINT
    key first, smallest-cid tiebreak — so the assignment is
    deterministic and engine-stable. The codebook collapses to ONE
    broadcast row holding an array of (cid, centroid) structs and the
    argmin is a per-row ``F.aggregate`` fold over that array: a pure
    projection, ZERO exchanges, no per-vector grouping — shuffle
    volume is independent of both N and k, which is what matters when
    the codebook is an IVF coarse quantizer with thousands of
    centroids. (The r8 version ranked N×k scored rows through an
    id-partitioned window: an N×k-row shuffle.) The fold's total
    order makes the result independent of the codebook array's
    collect order.

    Magnitude precondition: the e9 grid is exact only while dist·1e9
    stays within the double-integer range (2^53), i.e. squared
    distances below ~9.0e6 (‖x−c‖ below ~3000 — far above any
    normalized-embedding geometry). Larger distances would lose
    integrality and could flip the deterministic argmin, so the
    quantizer raises instead of silently degrading."""
    cid_dt = cents.schema[cid_col].dataType.simpleString()
    # The codebook is driver-held metadata by design (k×dim scalars —
    # the same materialization the IVF/PQ trainers make). Collecting
    # it lets the argmin run over a LITERAL array: no broadcast join
    # build job, no collect_list exchange — the assign plan is scan →
    # project. Codebooks past the literal-plan comfort zone (IVF
    # coarse quantizers with k in the thousands) fall back to a
    # one-row collect_list broadcast: still a zero-shuffle projection
    # per vector, plus one O(k)-row exchange to form the array.
    cb_rows = (
        cents.select(cid_col, cent_col)
        .limit(LITERAL_CODEBOOK_MAX + 1)
        .collect()
    )
    if 0 < len(cb_rows) <= LITERAL_CODEBOOK_MAX:
        codebook_col = F.array(
            *[
                F.struct(
                    F.lit(r[0]).cast(cid_dt).alias("cid"),
                    F.lit([float(x) for x in r[1]]).alias(
                        "centroid"
                    ),
                )
                for r in sorted(cb_rows, key=lambda r: r[0])
            ]
        )
        with_codebook = vecs.select(id_col, vec_col).withColumn(
            "_codebook", codebook_col
        )
    else:
        codebook = cents.agg(
            F.collect_list(
                F.struct(
                    F.col(cid_col).alias("cid"),
                    F.col(cent_col).alias("centroid"),
                )
            ).alias("_codebook")
        )
        with_codebook = vecs.select(id_col, vec_col).crossJoin(
            F.broadcast(codebook)
        )
    init = F.struct(
        F.lit(None).cast("bigint").alias("dist_e9"),
        F.lit(None).cast(cid_dt).alias("cid"),
        F.lit(None).cast("double").alias("dist"),
    )

    def _quantize(d):
        return F.when(
            d < F.lit(9.0e6),
            F.round(d * F.lit(1000000000.0)).cast("bigint"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "assign_clusters: squared distance exceeds "
                        "the exact e9 quantization grid (>= 9.0e6): "
                    ),
                    d.cast("string"),
                )
            ).cast("bigint")
        )

    def _step(acc, cent):
        d = F.round(
            squared_l2(F.col(vec_col), cent["centroid"]), 9
        )
        cand = F.struct(
            _quantize(d).alias("dist_e9"),
            cent["cid"].alias("cid"),
            d.alias("dist"),
        )
        better = (
            acc["dist_e9"].isNull()
            | (cand["dist_e9"] < acc["dist_e9"])
            | (
                (cand["dist_e9"] == acc["dist_e9"])
                & (cand["cid"] < acc["cid"])
            )
        )
        return F.when(better, cand).otherwise(acc)

    best = with_codebook.select(
        id_col,
        F.aggregate(F.col("_codebook"), init, _step).alias("_best"),
    )
    return best.select(
        id_col,
        F.col("_best")["cid"].alias(cid_col),
        F.col("_best")["dist"].alias("dist"),
        F.col("_best")["dist_e9"].alias("dist_e9"),
    )


def update_centroids(
    assigned: DataFrame,
    cid_col: str = "cid",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cid, centroid): per-dimension mean of each cluster's members —
    one posexplode + one grouped average (map-combinable), then the
    k×dim rows fold back into arrays. Emits only non-empty clusters
    (Lloyd's empty-cluster case keeps its previous centroid; callers
    that need that join this result against the old codebook)."""
    dims = assigned.select(
        cid_col, F.posexplode(vec_col).alias("d", "v")
    )
    # round-to-grid-then-DECIMAL (the repo's cross-row float-sum
    # rule): a plain double avg's summation order depends on the
    # partition layout, so iteration-2+ centroids — and therefore
    # assignments near a quantization boundary — could differ between
    # environments. The DECIMAL numerator makes the mean a function
    # of the data alone.
    cent = dims.groupBy(cid_col, "d").agg(
        (
            F.sum(
                F.round(F.col("v").cast("double"), 9).cast(
                    "decimal(28,12)"
                )
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("c")
    )
    return (
        cent.groupBy(cid_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("d", "c"))
            ).alias("_dc")
        )
        .select(
            cid_col,
            F.transform(F.col("_dc"), lambda s: s["c"]).alias(
                "centroid"
            ),
        )
    )


@dataclass
class KMeansResult:
    assignment: DataFrame  # (id, cid, dist, dist_e9)
    centroids: DataFrame  # (cid, centroid)
    history: list[dict]  # per-iteration {"iter", "inertia", "n_shifted"}


def kmeans(
    vecs: DataFrame,
    k: int = 8,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Fixed-iteration Lloyd k-means with deterministic first-k-ids
    init. Records inertia (sum of assigned squared distances) and the
    number of vectors that changed cluster per iteration; Lloyd
    guarantees inertia is non-increasing, which the self-certifying
    refine query asserts."""
    first_ids = [
        r[0]
        for r in vecs.select(id_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    ]
    cid_map = {v: i for i, v in enumerate(first_ids)}
    cents = (
        vecs.where(F.col(id_col).isin(first_ids))
        .select(
            F.col(id_col),
            F.col(vec_col).alias("centroid"),
        )
        .withColumn(
            "cid",
            F.element_at(
                F.create_map(
                    *[
                        F.lit(x)
                        for kv in cid_map.items()
                        for x in kv
                    ]
                ),
                F.col(id_col),
            ).cast("long"),
        )
        .select("cid", "centroid")
    )
    history: list[dict] = []
    prev = None
    assigned = None
    for it in range(n_iters):
        assigned = assign_clusters(
            vecs, cents, id_col, vec_col
        ).persist()
        # dist is already round-9, so the DECIMAL sum is exact and
        # the recorded inertia is partition-order-proof
        stats = assigned.agg(
            F.sum(F.col("dist").cast("decimal(28,12)"))
            .cast("double")
            .alias("inertia"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if prev is not None:
            n_shifted = (
                assigned.select(id_col, "cid")
                .join(
                    prev.select(
                        id_col, F.col("cid").alias("_prev_cid")
                    ),
                    id_col,
                )
                .where(F.col("cid") != F.col("_prev_cid"))
                .count()
            )
        else:
            n_shifted = int(stats["n"])
        history.append(
            {
                "iter": it,
                "inertia": float(stats["inertia"] or 0.0),
                "n_shifted": int(n_shifted),
            }
        )
        if prev is not None:
            prev.unpersist()
        prev = assigned
        if it < n_iters - 1:
            new_cents = update_centroids(
                assigned.join(
                    vecs.select(id_col, vec_col), id_col
                ),
                vec_col=vec_col,
            )
            # empty clusters keep their previous centroid
            cents = new_cents.unionByName(
                cents.join(
                    new_cents.select("cid"), "cid", "left_anti"
                )
            )
    assert assigned is not None  # n_iters >= 1
    return KMeansResult(
        assignment=assigned, centroids=cents, history=history
    )
