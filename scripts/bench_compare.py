"""Like-for-like bench decomposition (r7 verdict task #1): compare a
min-of-N set of BENCH_FULL detail files against a reference round's
committed detail, per query.

Usage:
    python scripts/bench_compare.py ref.json run1.json [run2.json ...]

Prints a table of the biggest absolute deltas (min-of-N vs ref), the
overlap-set ratio over the shared queries, and per-run totals so
run-to-run variance (box noise) is visible next to the cross-round delta.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    ref_path, run_paths = sys.argv[1], sys.argv[2:]
    ref = json.load(open(ref_path))["queries"]
    runs = [json.load(open(p))["queries"] for p in run_paths]
    best: dict[str, float] = {}
    for q in runs[0]:
        best[q] = min(r[q] for r in runs if q in r)

    shared = sorted(set(ref) & set(best))
    ref_total = sum(ref[q] for q in shared)
    best_total = sum(best[q] for q in shared)
    print(f"shared queries: {len(shared)}")
    for i, p in enumerate(run_paths):
        t = sum(runs[i][q] for q in shared if q in runs[i])
        print(f"  run{i + 1} total (shared set): {t:.2f}s")
    print(f"ref total (shared set):   {ref_total:.2f}s")
    print(f"min-of-{len(runs)} total (shared): {best_total:.2f}s")
    print(f"overlap ratio (min/ref):  {best_total / ref_total:.3f}x")
    print()
    deltas = sorted(
        ((best[q] - ref[q], q) for q in shared), key=lambda t: -abs(t[0])
    )
    print(f"{'query':42s} {'ref':>7s} {'min':>7s} {'delta':>7s} {'ratio':>6s}")
    for d, q in deltas[:20]:
        print(
            f"{q:42s} {ref[q]:7.2f} {best[q]:7.2f} {d:+7.2f} "
            f"{best[q] / ref[q] if ref[q] else float('inf'):6.2f}"
        )
    new = sorted(set(best) - set(ref))
    if new:
        print("\nqueries not in ref (excluded from totals):")
        for q in new:
            print(f"  {q}: {best[q]:.2f}s")


if __name__ == "__main__":
    main()
