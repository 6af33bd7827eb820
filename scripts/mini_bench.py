"""Scoped bench: time a subset of rows with bench.py's exact methodology
(min-of-2 runs per pass, N passes, noop sink, release_tracked between
rows) in ONE warm session, after a warm-up prefix of cheap rows so the
JVM/codegen state resembles the full bench's mid-run state.

Usage: python scripts/mini_bench.py name1 name2 ... [--passes N] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bicis_spark.caching import release_tracked  # noqa: E402
from bicis_spark.plans import queries as registry  # noqa: E402
from bicis_spark.session import get_spark  # noqa: E402

WARMUP_ROWS = ["pricing_summary", "topk_agg_orders_per_customer", "ml_dataset"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    spark = get_spark(app_name="mini_bench")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry.queries()
    missing = [n for n in args.names if n not in reg]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        df = reg[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for w in WARMUP_ROWS:
        reg[w](spark, args.sf).write.format("noop").mode("overwrite").save()
    release_tracked()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for pass_no in range(args.passes):
        for name in args.names:
            best = min(run_once(name) for _ in range(2))
            timings[name] = round(min(timings.get(name, best), best), 4)
            release_tracked()
            spark.catalog.clearCache()
    print(json.dumps({"queries": timings, "total": round(sum(timings.values()), 4)}))


if __name__ == "__main__":
    main()
