"""Similarity search over embedding columns.

Two strategies:
- :func:`knn_bruteforce` — exact cosine top-k. One scan, no shuffle,
  TakeOrdered(k). Right answer, O(N·d) work; the baseline.
- :func:`knn_lsh` — random-hyperplane LSH with multi-probe. Each
  vector gets a sign-bit bucket from `n_planes` deterministic
  hyperplanes; the query probes all buckets within Hamming distance
  `probe_hamming`, then exact cosine re-ranks the candidates. At
  100 TB: the bucket column is computed once at write time (cheap,
  scan-local), candidate selection is a pushed-down IN filter on a
  low-cardinality column (partition/bucket prunable), and the exact
  re-rank touches only candidates.

Hyperplane determinism: components are ±1 derived from md5 parities of
"plane:dim" — reproducible across runs/engines with no RNG state.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.vectors import cosine


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic ±1 hyperplane components."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) % 2 == 1 else -1.0)
    return out


def sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Bit-string bucket id: one sign bit per hyperplane."""
    bits = []
    for comps in planes:
        plane = F.array(*[F.lit(c) for c in comps])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _probe_buckets(bucket: str, hamming: int) -> list[str]:
    """All bucket ids within the given Hamming distance."""
    from itertools import combinations

    n = len(bucket)
    out = {bucket}
    for dist in range(1, hamming + 1):
        for flips in combinations(range(n), dist):
            b = list(bucket)
            for i in flips:
                b[i] = "1" if b[i] == "0" else "0"
            out.add("".join(b))
    return sorted(out)


def knn_bruteforce(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k (excluding the query itself)."""
    qvec = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_q")
    )
    sim = F.round(cosine(F.col(vec_col), F.col("_q")), 9).alias("sim")
    return (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qvec))
        .select(id_col, sim)
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold).

    exact=False (default, the scale path): banded sign-LSH
    (OR-of-ANDs) — `n_bands` independent buckets of `n_planes` sign
    bits each; vectors sharing ANY band bucket become candidates, and
    exact cosine verifies. Per-bucket joins, never all-pairs. A pair at
    angle θ is a candidate with probability 1 − (1 − p^r)^b where
    p = 1 − θ/π, r = n_planes, b = n_bands: ~99% at cosine 0.95 with
    the defaults, vanishing for unrelated vectors.

    exact=True: all-pairs self-join — O(N²), for oracle checks and
    small N only.
    """
    if exact:
        left = emb.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        right = emb.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        pairs = left.crossJoin(right).filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = _banded_candidates(
            emb,
            id_col,
            vec_col,
            n_bands=n_bands,
            n_planes=n_planes,
            max_bucket_size=max_bucket_size,
        )
    sim = F.round(cosine(F.col("va"), F.col("vb")), 9)
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _banded_candidates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    n_bands: int,
    n_planes: int,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Distinct candidate pairs sharing any of `n_bands` sign buckets
    (each from `n_planes` independent hyperplanes).

    Scale shape: buckets larger than `max_bucket_size` are dropped
    before the self-join (a degenerate bucket — many near-identical
    embeddings, exactly what a dup-heavy corpus produces — would go
    quadratic; its members are better handled by exact/content-hash
    dedup). The self-join and the pair-level dropDuplicates carry ONLY
    ids — embedding vectors are re-attached to the deduped narrow pair
    stream afterwards, so the wide payload never rides through the
    candidate shuffle.
    """
    dim = len(emb.select(vec_col).first()[0])
    band_cols = []
    for band in range(n_bands):
        planes = [
            _hyperplane(band * n_planes + p, dim) for p in range(n_planes)
        ]
        band_cols.append(
            F.struct(
                F.lit(band).alias("band_idx"),
                sign_bucket(F.col(vec_col), planes).alias("bucket"),
            )
        )
    # Ids + bucket only: the bucketed frame feeds a self-join, so keep
    # it narrow and persist it (cluster-safe, unlike localCheckpoint)
    # so the hyperplane projections evaluate once, not once per side.
    bucketed = (
        emb.select(id_col, F.explode(F.array(*band_cols)).alias("b"))
        .select(id_col, "b.band_idx", "b.bucket")
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        bucketed = (
            bucketed.withColumn(
                "_n",
                F.count(F.lit(1)).over(
                    Window.partitionBy("band_idx", "bucket")
                ),
            )
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
    bucketed = bucketed.persist()
    a = bucketed.select(F.col(id_col).alias("id_a"), "band_idx", "bucket")
    b = bucketed.select(F.col(id_col).alias("id_b"), "band_idx", "bucket")
    pairs = (
        a.join(b, on=["band_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    va = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return pairs.join(va, on="id_a").join(vb, on="id_b")


def knn_lsh(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via multi-probe sign-LSH.

    Returns (id, label if present, sim) for up to k candidates. The
    query vector's bucket is computed driver-side from one collected
    row (O(d), not a data-plane collect).
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = [_hyperplane(p, dim) for p in range(n_planes)]

    bucketed = emb.withColumn("_bucket", sign_bucket(F.col(vec_col), planes))
    qrow = bucketed.filter(F.col(id_col) == query_vec_id).select(
        vec_col, "_bucket"
    ).first()
    probes = _probe_buckets(qrow["_bucket"], probe_hamming)

    qvec = F.array(*[F.lit(float(x)) for x in qrow[vec_col]])
    sim = F.round(cosine(F.col(vec_col), qvec), 9).alias("sim")
    keep = [c for c in (id_col, "label") if c in emb.columns]
    return (
        bucketed.filter(
            (F.col("_bucket").isin(probes)) & (F.col(id_col) != query_vec_id)
        )
        .select(*keep, sim)
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
