"""Product quantization (PQ) — compressed ANN codes for 100 TB-scale
embedding tables.

Third ANN strategy next to sign-LSH (operators/similarity.py) and
IVF-Flat (operators/ivf.py), attacking a different bottleneck: the
BYTES. At 100 TB an fp32 embedding column dominates storage and scan
I/O; PQ stores each vector as `m` small codebook indices (here m bytes
against 4·d float bytes — 32× for d=64, m=8) and answers distance
queries from the codes alone:

- **fit**: split the d dims into `m` contiguous subspaces; Lloyd's
  k-means runs over ALL subspaces simultaneously — one assignment
  projection (the same expression pq_encode uses) plus one
  map-side-combinable (position, code) mean per iteration, so
  training is 1 shuffle per iteration regardless of m. Deterministic
  like operators/ivf.py::kmeans_fit: init is the ksub lowest-id
  vectors' slices, fixed iteration count, no RNG. Codebooks are
  O(m·ksub·d/m) driver metadata.
- **encode**: per subspace, argmin over ksub squared-L2 distances on
  the slice, as an Arrow-batched pandas UDF — the (batch, m, dsub) ×
  (m, ksub, dsub) distance tensor is one numpy einsum-shaped op per
  batch, no shuffle, no per-row Python. (An all-JVM formulation with
  m·ksub `aggregate`/`zip_with` folds works but costs ~10 s of
  Catalyst compile per plan at m·ksub=128 — expression-count, not
  data; the vectorized kernel is also what scales.) Codes become an
  `array<int>` column you store INSTEAD of (or beside) the raw
  vectors.
- **search (ADC)**: the query builds an m×ksub lookup table
  driver-side (O(m·ksub·d/m) — metadata, not data); per-row distance
  is m literal-array lookups summed in one projection, then
  TakeOrdered. The scan reads ONLY the codes column — at rest this is
  the difference between scanning 100 TB of floats and ~3 TB of
  codes. Optional exact re-rank joins the raw vectors back for just
  the top candidates (fetch-on-demand, the FAISS refine pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from babylon_data_loader_spark.functions.vectors import (
    cosine,
    double_array_lit,
)


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train `m` per-subspace codebooks of `ksub` centroids each.

    All subspaces train together: each Lloyd iteration is ONE
    assignment projection (m·ksub fold expressions, JVM-side) and ONE
    aggregation keyed by (dimension position, assigned code) — the
    shuffle carries d·ksub partial means, independent of row count.
    Deterministic: init is the ksub lowest-id vectors' slices, fixed
    iteration count, ties to the lowest code. The input dimension
    must divide evenly by `m`.
    """
    d = len(emb.select(vec_col).first()[0])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    seed_rows = emb.orderBy(id_col).limit(ksub).select(vec_col).collect()
    books: list[list[list[float]]] = [
        [
            [float(x) for x in r[0][i * dsub : (i + 1) * dsub]]
            for r in seed_rows
        ]
        for i in range(m)
    ]
    for _ in range(n_iters):
        coded = pq_encode(emb, books, vec_col=vec_col, code_col="_code")
        means = (
            coded.select(
                "_code", F.posexplode(F.col(vec_col)).alias("pos", "v")
            )
            .withColumn(
                "code",
                F.element_at(
                    F.col("_code"),
                    (F.floor(F.col("pos") / dsub) + 1).cast("int"),
                ),
            )
            .groupBy("pos", "code")
            .agg(F.avg(F.col("v").cast("double")).alias("mval"))
            .collect()  # d·ksub rows — codebook metadata, not data
        )
        new: dict[tuple[int, int, int], float] = {}
        for r in means:
            sub, off = divmod(int(r["pos"]), dsub)
            new[(sub, int(r["code"]), off)] = float(r["mval"])
        books = [
            [
                [
                    new.get((i, c, j), books[i][c][j])
                    for j in range(dsub)
                ]
                for c in range(ksub)
            ]
            for i in range(m)
        ]
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Add `code_col`: array<int> of length m, the per-subspace argmin
    codebook index. Arrow-batched vectorized kernel, no shuffle;
    numpy argmin ties go to the lowest index (deterministic)."""
    from pyspark.sql.functions import pandas_udf

    cb = np.asarray(codebooks, dtype=np.float64)  # m × ksub × dsub
    m, ksub, dsub = cb.shape

    @pandas_udf("array<int>")
    def _encode(vecs):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(vecs.to_numpy()).astype(np.float64)  # n × d
        n = x.shape[0]
        xs = x.reshape(n, m, 1, dsub)  # n × m × 1 × dsub
        # n × m × ksub squared distances; argmin over ksub
        d2 = ((xs - cb.reshape(1, m, ksub, dsub)) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2).astype(np.int32)  # n × m
        return pd.Series(list(codes))

    return emb.withColumn(code_col, _encode(F.col(vec_col)))


def write_pq_index(
    codes: DataFrame, path: str, codebooks: list[list[list[float]]]
) -> None:
    """Persist the codes table (ids + m-byte codes — the 32×-smaller
    at-rest representation a 100 TB search actually scans) with the
    codebooks as JSON metadata, mirroring write_ivf_index."""
    import json
    import os

    codes.write.mode("overwrite").parquet(path)
    # commit marker: presence implies a complete index, so the write
    # must be atomic (crash mid-write would poison the store)
    meta_path = os.path.join(path, "_codebooks.json")
    tmp = f"{meta_path}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(codebooks, fh)
    os.replace(tmp, meta_path)  # atomic on POSIX


def append_pq_index(
    new_vecs: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Incrementally extend a stored PQ index: encode new vectors with
    the EXISTING codebooks (no refit — stored codes stay valid; train
    drift is a periodic-rebuild decision) and append the new m-byte
    codes. Search over (base ++ appended) equals a single encode of
    the union with the same codebooks — the Arrow encode kernel is
    deterministic per vector (argmin ties to the lowest index) and ADC
    scoring depends only on code content (pinned by
    tests/test_similarity.py)."""
    first = new_vecs.select(vec_col).first()
    if first is None:
        return
    import json
    import os

    with open(
        os.path.join(path, "_codebooks.json"), encoding="utf-8"
    ) as fh:
        codebooks = json.load(fh)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(first[0]) != m * dsub:
        raise ValueError(
            f"append_pq_index: new vectors have dim {len(first[0])}, "
            f"index was built for dim {m * dsub}"
        )
    cols = [c for c in new_vecs.columns if c != vec_col]
    from babylon_data_loader_spark.operators.index_store import (
        check_append_schema,
    )

    # the stored index holds codes, not vectors: compare the appended
    # frame's carried columns (everything but the encoded vec) against
    # the store minus its code column
    check_append_schema(
        new_vecs.sparkSession,
        path,
        new_vecs.select(*cols),
        exclude=("pq_code",),
    )
    (
        pq_encode(new_vecs, codebooks, vec_col=vec_col)
        .select(*cols, "pq_code")
        .write.mode("append")
        .parquet(path)
    )


def read_pq_index(spark, path: str):
    """(codes DataFrame, codebooks) from a stored PQ index."""
    import json
    import os

    from babylon_data_loader_spark.operators.index_store import (
        _read_store,
        recover_index,
    )

    recover_index(path)
    with open(
        os.path.join(path, "_codebooks.json"), encoding="utf-8"
    ) as fh:
        codebooks = json.load(fh)
    # schema-cached read: appends republish _SUCCESS, so the mtime key
    # re-infers whenever the store's files (hence schema) could change
    return _read_store(spark, path, "_SUCCESS"), codebooks


def pq_search(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Top-k by asymmetric distance (ADC) over the codes.

    `rerank`: optionally pass the raw-vector table — the top
    `k*rerank_factor` ADC candidates (ids only) are joined back and
    re-ranked by exact cosine, trading one broadcast join for
    near-exact recall while the SCAN still reads only codes.
    """
    cb = np.asarray(codebooks, dtype=np.float64)  # m × ksub × dsub
    q = np.asarray(query_vec, dtype=np.float64)
    m, ksub, dsub = cb.shape
    # m × ksub lookup table of squared L2 to each sub-centroid
    lut = ((cb - q.reshape(m, 1, dsub)) ** 2).sum(axis=2)

    lut_lit = F.array(
        *[
            double_array_lit(lut[i])
            for i in range(m)
        ]
    )
    code = F.col(code_col)
    adc = F.round(
        sum(
            F.element_at(F.element_at(lut_lit, i + 1), code[i] + 1)
            for i in range(m)
        ),
        9,
    ).alias("adc_dist2")

    keep = [c for c in (id_col, "label") if c in codes.columns]
    ranked = (
        codes.select(*keep, adc)
        .orderBy(F.col("adc_dist2").asc(), F.col(id_col).asc())
        .limit(k * rerank_factor if rerank is not None else k)
    )
    if rerank is None:
        return ranked

    qcol = double_array_lit(query_vec)
    sim = F.round(cosine(F.col(vec_col), qcol), 9).alias("sim")
    cand = F.broadcast(ranked.select(id_col))
    return (
        rerank.join(cand, on=id_col)
        .select(*[c for c in (id_col, "label") if c in rerank.columns], sim)
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivfpq_build(
    emb: DataFrame,
    k_coarse: int = 16,
    m: int = 8,
    ksub: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF-PQ: coarse k-means partitions the space (IVF), PQ encodes
    each vector's RESIDUAL from its coarse centroid — the composed
    FAISS-standard at-rest ANN layout. A search prunes to nprobe
    coarse lists (partition pruning when written partitioned by
    cluster_id) and scans only m-byte residual codes inside them:
    both the I/O axis (PQ compression) and the candidate axis (IVF
    pruning) cut at once.

    Returns (codes DataFrame with cluster_id + pq_code, coarse
    centroids, residual codebooks). Deterministic end to end.
    """
    from babylon_data_loader_spark.operators.ivf import kmeans_fit

    centroids = kmeans_fit(
        emb, k=k_coarse, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    with_res = _with_residuals(emb, centroids, id_col, vec_col)
    books = pq_fit(
        with_res.select(id_col, F.col("_res").alias(vec_col)),
        m=m,
        ksub=ksub,
        n_iters=n_iters,
        id_col=id_col,
        vec_col=vec_col,
    )
    return ivfpq_encode(emb, centroids, books, id_col, vec_col), centroids, books


def _with_residuals(emb, centroids, id_col, vec_col):
    """Assign each vector to its nearest coarse centroid and attach
    the residual vector (Arrow-batched, no shuffle)."""
    from babylon_data_loader_spark.operators.ivf import ivf_index

    assigned = ivf_index(emb, centroids, vec_col=vec_col)
    cen = np.asarray(centroids, dtype=np.float64)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def _residual(vecs, cids):
        import pandas as pd

        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        r = x - cen[cids.to_numpy().astype(np.int64)]
        return pd.Series(list(r))

    return assigned.withColumn(
        "_res", _residual(F.col(vec_col), F.col("cluster_id"))
    )


def ivfpq_encode(
    new_vecs: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors against EXISTING IVF-PQ parameters — the
    incremental-maintenance half: assign to the stored coarse
    centroids, residual-encode with the stored codebooks, no refit.
    ivfpq_build's own encode stage IS this function, so
    codes(base) ++ ivfpq_encode(extra) is code-for-code identical to a
    single build's encode of the union under the same parameters
    (pinned by tests/test_similarity.py)."""
    with_res = _with_residuals(new_vecs, centroids, id_col, vec_col)
    return pq_encode(
        with_res.select(
            id_col,
            "cluster_id",
            *(["label"] if "label" in with_res.columns else []),
            F.col("_res").alias(vec_col),
        ),
        codebooks,
        vec_col=vec_col,
    ).drop(vec_col)


def ivfpq_search(
    codes: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Top-k via per-cluster ADC over residual codes within the
    nprobe nearest coarse lists. Each probed cluster gets its own
    lookup table (the query's residual differs per cluster); the
    cluster filter is a pushable IN / partition-pruning predicate,
    and per-cluster frames union before one TakeOrdered."""
    cen = np.asarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)  # m × ksub × dsub
    m, ksub, dsub = cb.shape
    order = np.argsort(((cen - q) ** 2).sum(axis=1), kind="stable")
    probes = [int(c) for c in order[:nprobe]]

    frames = []
    for c in probes:
        qres = (q - cen[c]).reshape(m, 1, dsub)
        lut = ((cb - qres) ** 2).sum(axis=2)  # m × ksub
        lut_lit = F.array(
            *[double_array_lit(lut[i]) for i in range(m)]
        )
        code = F.col(code_col)
        adc = F.round(
            sum(
                F.element_at(F.element_at(lut_lit, i + 1), code[i] + 1)
                for i in range(m)
            ),
            9,
        ).alias("adc_dist2")
        keep = [col for col in (id_col, "label") if col in codes.columns]
        frames.append(
            codes.filter(F.col("cluster_id") == c).select(*keep, adc)
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    pool = k * rerank_factor if rerank is not None else k
    ranked = out.orderBy(
        F.col("adc_dist2").asc(), F.col(id_col).asc()
    ).limit(pool)
    if rerank is None:
        return ranked

    from babylon_data_loader_spark.functions.vectors import cosine as _cos

    qcol = double_array_lit(query_vec)
    sim = F.round(_cos(F.col(vec_col), qcol), 9).alias("sim")
    cand = F.broadcast(ranked.select(id_col))
    return (
        rerank.join(cand, on=id_col)
        .select(*[c for c in (id_col, "label") if c in rerank.columns], sim)
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
    )
