"""Cross-engine exactness of the deterministic ANN primitives
(operators/det_ann.py) — the foundation that let r11 oracle-back
q_rerank_ann / q_ivf_nprobe_curve / q_kmeans_refine. Each test
computes the same quantity in Spark AND via the module's DuckDB SQL
snippet builders and asserts bit-identity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from babylon_data_loader_spark.operators.det_ann import (
    QUANT,
    det_plane,
    det_planes,
    hamming_ball,
    int_assign,
    quantize_vec,
    sign_bucket,
    sql_int_sq_dist,
    sql_planes_cte,
    sql_quant,
)

_PQ = "/root/testdata/sf0.001/embeddings.parquet"


def test_plane_derivation_matches_duckdb():
    """md5-derived plane components: python hashlib == DuckDB md5."""
    got = duckdb.sql(
        f"SELECT c FROM {sql_planes_cte('annplane', 3, 8)} "
        "ORDER BY p"
    ).fetchall()
    assert [list(r[0]) for r in got] == det_planes("annplane", 3, 8)
    # centered: components straddle zero
    flat = [c for r in got for c in r[0]]
    assert min(flat) < 0 < max(flat)
    assert all(-(1 << 23) <= c < (1 << 23) for c in flat)


def test_signatures_match_duckdb(spark):
    P, DIM = 8, 64
    planes = det_planes("annplane", P, DIM)
    got = {
        r["vec_id"]: r["bucket"]
        for r in spark.read.parquet(_PQ)
        .select(
            "vec_id",
            sign_bucket(
                quantize_vec(F.col("embedding")), planes
            ).alias("bucket"),
        )
        .collect()
    }
    dot = (
        f"list_sum(list_transform(generate_series(1, {DIM}), "
        "i -> qv.q[i] * pl.c[i]))"
    )
    want = dict(
        duckdb.sql(
            f"""
        WITH planes AS {sql_planes_cte('annplane', P, DIM)},
        qv AS (SELECT vec_id, {sql_quant('embedding')} AS q
               FROM read_parquet('{_PQ}')),
        bits AS (
          SELECT vec_id, p,
                 CASE WHEN {dot} >= 0 THEN CAST(1 AS BIGINT)
                      ELSE 0 END AS bit
          FROM qv CROSS JOIN planes pl)
        SELECT vec_id,
               CAST(SUM(bit * (1::BIGINT << p)) AS BIGINT) AS bucket
        FROM bits GROUP BY vec_id
        """
        ).fetchall()
    )
    assert got == want
    assert all(0 <= b < (1 << P) for b in got.values())


def test_int_assign_matches_duckdb(spark):
    DIM, K = 64, 8
    seeds = duckdb.sql(
        f"SELECT vec_id, {sql_quant('embedding')} "
        f"FROM read_parquet('{_PQ}') WHERE vec_id < {K} "
        "ORDER BY vec_id"
    ).fetchall()
    codebook = [(int(v), [int(x) for x in c]) for v, c in seeds]
    qdf = spark.read.parquet(_PQ).select(
        "vec_id", quantize_vec(F.col("embedding")).alias("q")
    )
    got = {
        r["vec_id"]: (r["cid"], r["dist"])
        for r in int_assign(qdf, "q", codebook).collect()
    }
    want = {}
    for vid, payload in duckdb.sql(
        f"""
        WITH qv AS (SELECT vec_id, {sql_quant('embedding')} AS q
                    FROM read_parquet('{_PQ}')),
        seeds AS (SELECT vec_id AS cid, q AS c FROM qv
                  WHERE vec_id < {K}),
        d AS (SELECT qv.vec_id, seeds.cid,
                     {sql_int_sq_dist('qv.q', 'seeds.c', DIM)} AS dist
              FROM qv CROSS JOIN seeds)
        SELECT vec_id, {{'cid': CAST(cid AS BIGINT),
                         'dist': CAST(dist AS BIGINT)}}
        FROM d
        QUALIFY row_number() OVER (
          PARTITION BY vec_id ORDER BY dist ASC, cid ASC) = 1
        """
    ).fetchall():
        want[vid] = (payload["cid"], payload["dist"])
    assert got == want


def test_quantize_is_floor_on_the_grid(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.5, 1.25e-6, -1.25e-6, 0.0])],
        "id INT, v ARRAY<FLOAT>",
    )
    [r] = df.select(quantize_vec(F.col("v")).alias("q")).collect()
    assert list(r["q"]) == [
        QUANT // 2,
        -QUANT // 2,
        1,
        -2,  # floor, not truncation: -1.25 floors to -2
        0,
    ]


def test_hamming_ball_sizes():
    assert hamming_ball(0b101, 8, 0) == [0b101]
    r1 = hamming_ball(0b101, 8, 1)
    assert len(r1) == 9 and 0b101 in r1 and 0b100 in r1
    # radius 2 over 8 planes: 1 + 8 + C(8,2) = 37
    assert len(hamming_ball(0, 8, 2)) == 37
    assert all(0 <= b < 256 for b in hamming_ball(17, 8, 2))


def test_det_plane_is_stable():
    """Regression pin: the derivation spec (md5 tag:p:d, first 6 hex
    chars, centered) must never drift — stored signatures and the SQL
    oracles both depend on it."""
    import hashlib

    p0 = det_plane("annplane", 0, 4)
    want = [
        int(hashlib.md5(f"annplane:0:{d}".encode()).hexdigest()[:6], 16)
        - (1 << 23)
        for d in range(4)
    ]
    assert p0 == want


def test_int_subspace_codes_and_adc_match_python(spark):
    """PQ encode + ADC (r12): the Spark expressions must equal a
    plain-python reference on the same quantized vectors — argmin
    with lowest-id tiebreak per subspace, then Σ_s lut[s][code[s]]."""
    from babylon_data_loader_spark.operators.det_ann import (
        adc_distance,
        int_subspace_codes,
    )
    from babylon_data_loader_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = (
        emb.where(F.col("vec_id") < 40)
        .select("vec_id", quantize_vec(F.col("embedding")).alias("q"))
        .collect()
    )
    qs = {r["vec_id"]: [int(x) for x in r["q"]] for r in rows}
    m, subdim, ksub = 8, 8, 16
    subbooks = [
        [
            qs[j][s * subdim : (s + 1) * subdim]
            for j in range(ksub)
        ]
        for s in range(m)
    ]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def py_codes(q):
        return [
            min(
                range(ksub),
                key=lambda j: (
                    d2(q[s * subdim : (s + 1) * subdim], subbooks[s][j]),
                    j,
                ),
            )
            for s in range(m)
        ]

    anchor = qs[0]
    lut = [
        [
            d2(anchor[s * subdim : (s + 1) * subdim], subbooks[s][j])
            for j in range(ksub)
        ]
        for s in range(m)
    ]
    got = {
        r["vec_id"]: (list(r["code"]), r["d"])
        for r in emb.where(F.col("vec_id") < 40)
        .select(
            "vec_id",
            int_subspace_codes(
                quantize_vec(F.col("embedding")), subbooks
            ).alias("code"),
        )
        .withColumn("d", adc_distance(F.col("code"), lut))
        .collect()
    }
    for vid, q in qs.items():
        want_code = py_codes(q)
        want_d = sum(lut[s][want_code[s]] for s in range(m))
        assert got[vid] == (want_code, want_d), vid


def test_residual_and_per_list_adc_match_python(spark):
    """IVF-PQ residual + per-list ADC (r12): residual_col must equal
    q − centroid[cid] and adc_distance_per_list must pick the right
    LUT slab per coarse list."""
    from babylon_data_loader_spark.operators.det_ann import (
        adc_distance_per_list,
        int_assign,
        residual_col,
    )
    from babylon_data_loader_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qdf = emb.select(
        "vec_id", quantize_vec(F.col("embedding")).alias("q")
    )
    rows = qdf.where(F.col("vec_id") < 16).collect()
    codebook = sorted(
        (r["vec_id"], [int(x) for x in r["q"]]) for r in rows
    )
    cents = dict(codebook)

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    assigned = int_assign(qdf, "q", codebook).where(
        F.col("vec_id") < 40
    )
    got_res = {
        r["vec_id"]: (int(r["cid"]), [int(x) for x in r["r"]])
        for r in assigned.select(
            "vec_id",
            "cid",
            residual_col(F.col("q"), F.col("cid"), codebook).alias(
                "r"
            ),
        ).collect()
    }
    qs = {
        r["vec_id"]: [int(x) for x in r["q"]]
        for r in qdf.where(F.col("vec_id") < 40).collect()
    }
    for vid, q in qs.items():
        cid = min(
            cents, key=lambda c: (d2(q, cents[c]), c)
        )
        want_r = [x - c for x, c in zip(q, cents[cid])]
        assert got_res[vid] == (cid, want_r), vid

    # per-list ADC: two lists, slab chosen by the lidx map
    probe = [3, 7]
    lut3 = [
        [[(li + 1) * 1000 + s * 16 + j for j in range(16)] for s in range(8)]
        for li in range(2)
    ]
    lidx = F.element_at(
        F.create_map(
            F.lit(3).cast("long"),
            F.lit(1),
            F.lit(7).cast("long"),
            F.lit(2),
        ),
        F.col("cid").cast("long"),
    )
    code = F.expr("array(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L)")
    got = {
        r["vec_id"]: r["d"]
        for r in assigned.where(F.col("cid").isin(probe))
        .select(
            "vec_id",
            "cid",
            adc_distance_per_list(code, lidx, lut3).alias("d"),
        )
        .collect()
    }
    for vid, d in got.items():
        li = probe.index(got_res[vid][0])
        want = sum(lut3[li][s][s] for s in range(8))
        assert d == want, vid


def test_py_sign_bucket_matches_spark(spark):
    """Driver-side bucket twin (r15): py_sign_bucket over every
    collected sf0.001 embedding == the sign_bucket expression the
    signature store persists. Pins the q_rerank_ann anchor-probe
    rewrite (bucket derived from the collected anchor row instead of
    a corpus-vs-store join per run)."""
    from babylon_data_loader_spark.operators.det_ann import (
        py_sign_bucket,
    )

    P, DIM = 8, 64
    planes = det_planes("annplane", P, DIM)
    rows = (
        spark.read.parquet(_PQ)
        .select(
            "vec_id",
            "embedding",
            sign_bucket(
                quantize_vec(F.col("embedding")), planes
            ).alias("bucket"),
        )
        .collect()
    )
    assert rows, "empty testdata"
    for r in rows:
        assert (
            py_sign_bucket(r["embedding"], planes) == r["bucket"]
        ), f"bucket mismatch for vec_id={r['vec_id']}"


def test_ivf_nprobe_curve_invariants(spark, sf_dir):
    """The structural invariants q_ivf_nprobe_curve used to assert
    in-query (r16 moved them here so the lane returns one lazy plan
    instead of a driver-side collect + re-wrapped local relation):
    recall is non-decreasing in nprobe, and the exhaustive probe
    (nprobe = n_lists) recovers the exact top-10 (recall 1.0)."""
    from babylon_data_loader_spark.queries.round8b import (
        q_ivf_nprobe_curve,
    )

    rows = (
        q_ivf_nprobe_curve(spark, sf_dir)
        .orderBy("nprobe")
        .collect()
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 4, 8, 16]
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls), f"recall not monotone: {rows}"
    assert recalls[-1] == 1.0, f"exhaustive probe missed: {rows[-1]}"
