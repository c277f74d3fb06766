"""Run every declared query against its DuckDB oracle at an arbitrary
scale factor (default sf0.01 — what the real driver uses).

Usage: python scripts/check_oracle.py [--exact] [sf_dir] [name_filter ...]

Extra args restrict the run to queries whose name contains any of the
given substrings. With ``--exact`` the args are exact query names
instead — the driver-window sweep uses this so "what the driver
checked" is the PRIORITY[:50] list verbatim, not a substring
superset (r13 VERDICT ask #7: a 50-slot window once swept 60
lanes); unknown names are a hard error, not silently skipped.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from babylon_data_loader_spark.session import build_session  # noqa: E402
from tests.oracle_harness import compare_query  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    exact = "--exact" in args
    if exact:
        args = [a for a in args if a != "--exact"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    filters = args[1:]
    spark = build_session(app_name="oracle-check")
    qmap = entrymod.queries()
    omap = entrymod.oracle_sql()
    if exact:
        unknown = [f for f in filters if f not in qmap]
        if unknown:
            print(f"unknown query name(s) under --exact: {unknown}")
            return 1
        qmap = {n: qmap[n] for n in filters}
    elif filters:
        qmap = {
            n: q for n, q in qmap.items() if any(f in n for f in filters)
        }
    failures = 0
    for name in sorted(qmap):
        t0 = time.time()
        try:
            res = compare_query(spark, sf_dir, name, qmap[name], omap.get(name))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: exception {exc}")
            failures += 1
            continue
        dt = time.time() - t0
        status = "ok  " if res.ok else "FAIL"
        if not res.ok:
            failures += 1
        print(f"{status}  {name:24s} {dt:6.2f}s  {res.detail}")
    spark.stop()
    print(f"\n{len(qmap) - failures}/{len(qmap)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
