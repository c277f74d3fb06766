import sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from babylon_data_loader_spark.session import build_session
from babylon_data_loader_spark.schemas import load_table
from babylon_data_loader_spark.operators.det_ann import (
    det_planes, hamming_ball, quantize_vec, sign_bucket)
from babylon_data_loader_spark.operators.index_store import get_or_build_parquet
import babylon_data_loader_spark.queries.round6 as r6

spark = build_session(app_name="ra-prof")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
# warm one full run first
r6.q_rerank_ann.__wrapped__ if hasattr(r6.q_rerank_ann,'__wrapped__') else None
from babylon_data_loader_spark.queries import QUERIES, load_all
load_all()
QUERIES["q_rerank_ann"](spark, sf).collect()

t0=time.time()
emb = load_table(spark, sf, "embeddings")
planes = det_planes("annplane", 8, 64)
def _signatures():
    return emb.select("vec_id", sign_bucket(quantize_vec(F.col("embedding")), planes).alias("bucket"))
sig = get_or_build_parquet(emb, "detsig", "p8", _signatures)
print("store:", round(time.time()-t0,3))
t0=time.time()
arows = {r["vec_id"]: r for r in emb.join(sig,"vec_id").where(F.col("vec_id").isin([0,1,2])).collect()}
print("anchors:", round(time.time()-t0,3))
t0=time.time()
out = QUERIES["q_rerank_ann"](spark, sf)
print("plan-build:", round(time.time()-t0,3))
t0=time.time(); out.collect(); print("exec:", round(time.time()-t0,3))
spark.stop()
