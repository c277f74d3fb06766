import sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from babylon_data_loader_spark.session import build_session
from babylon_data_loader_spark.operators.det_ann import (
    quantize_vec, _nested_lit, _long_array_sql)
from babylon_data_loader_spark.schemas import load_table

def assign_expr(qcol, codebook):
    cids = [cid for cid, _ in codebook]
    dists = F.transform(
        _nested_lit([c for _, c in codebook]),
        lambda c: F.aggregate(
            F.zip_with(F.col(qcol), c, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x))
    return F.array_min(F.zip_with(
        dists, F.expr(_long_array_sql(cids)),
        lambda d, i: F.struct(d.alias("dist"), i.alias("cid"))))

spark = build_session(app_name="traj-test")
spark.sparkContext.setLogLevel("ERROR")
emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
qdf = emb.select("vec_id", quantize_vec(F.col("embedding")).alias("q")).persist()
qdf.count()
cb = sorted((r["vec_id"], [int(x) for x in r["q"]])
            for r in qdf.where(F.col("vec_id") < 8).collect())
# fake three codebooks (same shape) just for timing
cbs = [cb, [(i, [v+1 for v in c]) for i, c in cb], [(i, [v+2 for v in c]) for i, c in cb]]
for rep in range(3):
    t0 = time.time()
    traj = qdf.select(
        *[assign_expr("q", c).alias(f"b{i}") for i, c in enumerate(cbs)])
    r = traj.agg(
        F.sum("b2.dist").alias("i3"),
        F.sum(F.when(F.col("b0.cid") != F.col("b1.cid"), 1).otherwise(0)).alias("s12"),
        F.sum(F.when(F.col("b1.cid") != F.col("b2.cid"), 1).otherwise(0)).alias("s23"),
    ).first()
    print(f"flat traj rep{rep}: {time.time()-t0:.3f}s {tuple(r)}")
# also time ONE assignment agg pass for reference
for rep in range(3):
    t0 = time.time()
    one = qdf.select(assign_expr("q", cbs[0]).alias("b"))
    r = one.agg(F.sum("b.dist")).first()
    print(f"one-assign rep{rep}: {time.time()-t0:.3f}s")
spark.stop()
