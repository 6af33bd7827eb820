"""Per-query profiler (optimization rounds): time one declared query with
the noop sink, dump its formatted plan, and — via the Spark event log —
break the wall time into jobs/stages with shuffle bytes so the expensive
exchange is identifiable without the UI (spark.ui is disabled in the
session factory).

Usage:
    python scripts/profile_query.py NAME [--runs N] [--sf DIR]
        [--explain OUT.txt] [--jobs]

--jobs enables the event log for the session, re-parses it after the
timed runs, and prints per-job wall/stage breakdown (job description,
duration, stage shuffle read/write + task time). Timing runs mirror
bench.py: build the plan fresh each run, write to the noop sink, release
tracked persists between runs only when --cold is passed (bench's
steady-state min keeps them warm within a query).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bicis_spark.caching import release_tracked  # noqa: E402
from bicis_spark.plans import queries as registry  # noqa: E402
from bicis_spark.session import get_spark  # noqa: E402


def _parse_event_log(log_dir: str) -> None:
    import glob

    entries = sorted(glob.glob(os.path.join(log_dir, "*")))
    files: list[str] = []
    for e in entries:
        if os.path.isdir(e):
            # Spark 4 rolling (v2) event log: a directory of events_* parts
            files.extend(sorted(glob.glob(os.path.join(e, "events_*"))))
        elif "appstatus" not in os.path.basename(e):
            files.append(e)
    if not files:
        print("no event log found", file=sys.stderr)
        return

    def _lines(path):
        with open(path, "rb") as fh:
            head = fh.read(4)
        if head == b"\x28\xb5\x2f\xfd":  # zstd frame magic
            import subprocess

            out = subprocess.run(
                ["zstd", "-dc", path], capture_output=True, check=True
            ).stdout
            yield from out.decode().splitlines()
        else:
            with open(path) as fh:
                yield from fh

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    lines = (line for f in files for line in _lines(f))
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stages[si.get("Stage ID", si.get("Stage Id"))] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                    "ms": (si.get("Completion Time", 0) or 0)
                    - (si.get("Submission Time", 0) or 0),
                    "sr": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                    or 0,
                    "slr": acc.get("internal.metrics.shuffle.read.localBytesRead", 0)
                    or 0,
                    "sw": acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                    or 0,
                    "cpu": (acc.get("internal.metrics.executorCpuTime", 0) or 0)
                    / 1e9,
                    "rt": (acc.get("internal.metrics.executorRunTime", 0) or 0)
                    / 1e3,
                    "deser": (
                        acc.get("internal.metrics.executorDeserializeTime", 0)
                        or 0
                    )
                    / 1e3,
                    "gc": (acc.get("internal.metrics.jvmGCTime", 0) or 0) / 1e3,
                    "fetch": (
                        acc.get("internal.metrics.shuffle.read.fetchWaitTime", 0)
                        or 0
                    )
                    / 1e3,
                }
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1e3
        if dur < 0.05:
            continue
        print(f"job {jid:4d}  {dur:7.2f}s  {j['desc'][:80]}")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or s["ms"] < 50:
                continue
            sh = (s["sr"] + s["slr"]) / 1e6
            sw = s["sw"] / 1e6
            print(
                f"    stage {sid:4d} {s['ms'] / 1e3:7.2f}s  tasks={s['tasks']:3d}"
                f" taskTime={s['rt']:7.2f}s cpu={s['cpu']:7.2f}s"
                f" deser={s['deser']:6.2f}s gc={s['gc']:5.2f}s"
                f" fetch={s['fetch']:5.2f}s"
                f" shufR={sh:8.1f}MB shufW={sw:8.1f}MB  {s['name'][:60]}"
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None)
    ap.add_argument("--jobs", action="store_true")
    ap.add_argument("--cold", action="store_true")
    args = ap.parse_args()

    extra = {}
    log_dir = None
    if args.jobs:
        log_dir = tempfile.mkdtemp(prefix="profq_ev_")
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            # plain single-file JSON so the parser needs no zstd codec
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    spark = get_spark(app_name=f"profile_{args.name}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    build = registry.queries()[args.name]

    # warm-up: JVM + parquet footers via a cheap unrelated query
    warm = registry.queries()["pricing_summary"]
    warm(spark, args.sf).count()

    times = []
    for i in range(args.runs):
        spark.sparkContext.setJobDescription(f"{args.name} run{i}")
        t0 = time.perf_counter()
        df = build(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"run {i}: {dt:.3f}s", flush=True)
        if args.cold:
            release_tracked()
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    print(f"min: {min(times):.3f}s  runs: {[round(t, 3) for t in times]}")

    if args.explain:
        df = build(spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(args.explain, "w") as fh:
            fh.write(plan)
        print(f"explain written: {args.explain}")

    if args.jobs and log_dir:
        spark.stop()
        time.sleep(1)
        _parse_event_log(log_dir)


if __name__ == "__main__":
    main()
