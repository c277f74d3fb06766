"""Dump `.explain("formatted")` for named queries into per-query
files — the r15 optimization-evidence format:

    python scripts/dump_plan_files.py <outdir> <suffix> <name>...

writes <outdir>/<name>_<suffix>.txt for each name (e.g.
``plans/r15 after q_rerank_ann``).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from babylon_data_loader_spark.session import build_session  # noqa: E402

# r16: env-overridable so before/after pairs are captured at the SAME
# SF (r15 mixed sf0.1 before-dumps with sf0.01 after-dumps — plan
# shape is SF-independent for these queries, but same-SF capture is
# the evidence standard the verdict asked to restore).
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = build_session(app_name="dump-plan-files")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
