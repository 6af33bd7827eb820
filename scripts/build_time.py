"""Builder-only timing: how long does `queries()[name](spark, sf_dir)`
take to CONSTRUCT the DataFrame (no execution)? bench.py's timed region
includes the build, and for the small-table ANN/dedup rows the driver-side
py4j construction cost is a large share of the recorded seconds — this
isolates it.

Usage:
    python scripts/build_time.py NAME [NAME...] [--runs N] [--sf DIR]

Caveat: builders that run eager work (localCheckpoint graph loops, k-means
training collects) execute jobs during "build" — their numbers here are
build+eager-exec, flagged by a '*' when Spark jobs ran during the build.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bicis_spark.caching import release_tracked  # noqa: E402
from bicis_spark.plans import queries as registry  # noqa: E402
from bicis_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="build_time")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry.queries()

    # warm-up: JVM, parquet footers, import paths
    reg["pricing_summary"](spark, args.sf).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in args.names:
        build = reg[name]
        times = []
        eager = False
        for _ in range(args.runs):
            jobs_before = len(tracker.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            build(spark, args.sf)
            times.append(time.perf_counter() - t0)
            jobs_after = len(tracker.getJobIdsForGroup() or [])
            eager = eager or jobs_after > jobs_before
            release_tracked()
            spark.catalog.clearCache()
        flag = "*" if eager else " "
        print(
            f"{min(times):8.3f}s{flag} {name}  runs={[round(t, 3) for t in times]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
