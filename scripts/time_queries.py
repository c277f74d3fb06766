"""Warm-rep timing for declared queries: 3 reps each, one session.

Usage: python scripts/time_queries.py <name> [<name> ...] <sf_dir>

The first rep carries codegen/store-build cost; medians of reps 1-2
are the comparable number. Used for same-session A/B evidence when a
lane's code changes (the PERF_NOTES discipline)."""

import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from babylon_data_loader_spark.session import build_session  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(
            "usage: python scripts/time_queries.py <name> "
            "[<name> ...] <sf_dir>"
        )
    names, sf = sys.argv[1:-1], sys.argv[-1]
    spark = build_session(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        times = []
        for rep in range(3):
            t0 = time.time()
            rows = qs[name](spark, sf).collect()
            times.append(time.time() - t0)
            print(
                f"{name} rep{rep}: {times[-1]:.3f}s "
                f"rows={len(rows)}"
            )
        print(
            f"{name} median_warm: "
            f"{statistics.median(times[1:]):.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
