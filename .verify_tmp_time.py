import sys, time
sys.path.insert(0, ".")
import __spark_entry__ as entrymod
from babylon_data_loader_spark.session import build_session
spark = build_session(app_name="time-one")
spark.sparkContext.setLogLevel("ERROR")
names = sys.argv[1:-1] or ["q_kmeans_refine"]
sf = sys.argv[-1]
qs = entrymod.queries()
for name in names:
    for rep in range(3):
        t0 = time.time()
        rows = qs[name](spark, sf).collect()
        print(f"{name} rep{rep}: {time.time()-t0:.3f}s rows={len(rows)}")
spark.stop()
