"""Compute the next round's DRIVER_WINDOW rotation.

The driver hash-verifies only the FIRST 50 registered queries per round
(see plans/queries.py). Each round, the window must rotate onto queries
that have never had a driver CORRECTNESS row — re-verifying a green query
wastes the round's only hard check (tests/test_oracle_queries.py enforces
this). This script derives the rotation mechanically:

1. ever-checked = union of keys across committed CORRECTNESS_r*.json;
2. queue = registered queries with an oracle, minus ever-checked, in
   registration order (rows-only names are excluded — they can never go
   green, so they never get a slot);
3. print the first 50 as a ready-to-paste DRIVER_WINDOW tuple, plus the
   leftover queue for the round after.

Run at the START of a round, after the driver has written the previous
round's CORRECTNESS file.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bicis_spark.plans import queries as registry  # noqa: E402


def compute_rotation(window_size: int = 50) -> tuple[list[str], list[str]]:
    """(next_window, leftover_queue) from the committed round records.

    While unverified names remain, they fill the window (never-checked
    first, registration order). Once every oracle-backed query has a
    driver row (endgame, r11+), the window becomes a RE-VERIFICATION
    rotation onto the stalest rows: rank by the LAST round each name
    appeared in a CORRECTNESS record (oldest first, registration order on
    ties) and take the first ``window_size`` — so every row keeps getting
    a periodic independent driver hash check, oldest evidence first."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        with open(path) as f:
            for k in json.load(f):
                last[k] = max(last.get(k, 0), rnd)
    oracles = registry.oracle_sql()
    names = [n for n in registry.queries() if n in oracles]
    queue = [n for n in names if n not in last]
    if queue:
        return queue[:window_size], queue[window_size:]
    order = {n: i for i, n in enumerate(names)}
    ranked = sorted(names, key=lambda n: (last[n], order[n]))
    return ranked[:window_size], ranked[window_size:]


def main() -> None:
    window, leftover = compute_rotation()
    print(f"# next DRIVER_WINDOW ({len(window)} names) — paste into plans/queries.py:")
    print("DRIVER_WINDOW: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")
    if len(window) < 50:
        print(f"# only {len(window)} unverified names remain — fill the other")
        print("# slots with the oldest previously-green queries (re-verification).")
    if leftover:
        print(f"# leftover queue for the round after ({len(leftover)}): {', '.join(leftover)}")


if __name__ == "__main__":
    main()
