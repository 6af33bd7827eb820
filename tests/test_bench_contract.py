"""bench.py driver contract: prints exactly one JSON line with the required
keys, honoring the env overrides."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_json_contract():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        line for line in proc.stdout.splitlines() if line.startswith("{")
    ]
    assert len(json_lines) == 1
    payload = json.loads(json_lines[0])
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert payload["value"] > 0
    assert set(payload) >= {"metric", "value", "unit", "queries", "sf"}
    assert all(v >= 0 for v in payload["queries"].values())
    assert len(payload["queries"]) >= 15
