"""Boundary staged-row goldens for the oracle-mutation blind spots.

`scripts/oracle_mutation_check.py` (round 5) showed that every surviving
mutant was a boundary the driver's synthetic DATA never touches — e.g.
no order exactly at a range edge, no event exactly W µs after another.
These tests stage rows exactly ON each such boundary so the semantics
(inclusive vs exclusive, ±1 µs) are pinned where the corpus-level hash
gate can't see them. Each test states both sides: the row ON the edge
and the row one unit past it.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_timestamp_range_filter_half_open_boundaries(spark):
    """F1 half-open [lo, hi): a row exactly at lo is KEPT, exactly at hi
    is DROPPED, hi - 1µs KEPT, lo - 1µs DROPPED (the ge->gt / lt->le
    mutants that survived on corpus data die here)."""
    lo = dt.datetime(2024, 1, 8)
    hi = dt.datetime(2024, 1, 15)
    us = dt.timedelta(microseconds=1)
    rows = [
        (1, lo - us), (2, lo), (3, lo + us),
        (4, hi - us), (5, hi), (6, hi + us),
    ]
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate timestamp")
    kept = {
        r["o_orderkey"]
        for r in df.where(
            (F.col("o_orderdate") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        ).collect()
    }
    assert kept == {2, 3, 4}


def test_next_window_count_edges_at_exact_window_width(spark):
    """W1 [t, t+W): an event exactly W µs after t is OUTSIDE t's window;
    exactly W-1 µs is INSIDE. Full-window mask `t <= max - W` is
    INCLUSIVE: the row exactly W µs before the station max still gets a
    count (the 3599999999-vs-3600000000 µs mutants)."""
    from bicis_spark.operators.targets import next_window_count

    w = 3600  # seconds
    base = dt.datetime(2024, 6, 1, 0, 0, 0)
    rows = [
        # station A: e2 exactly W µs after e1 (outside e1's window);
        # e1 sits exactly at max - W (mask keeps it)
        (1, "A", base),
        (2, "A", base + dt.timedelta(seconds=w)),
        # station B: e4 at W µs - 1µs after e3 (inside); e5 makes the
        # station max big enough that e3 passes the full-window mask
        (3, "B", base),
        (4, "B", base + dt.timedelta(seconds=w) - dt.timedelta(microseconds=1)),
        (5, "B", base + dt.timedelta(seconds=2 * w)),
    ]
    df = spark.createDataFrame(rows, "id long, station string, ts timestamp")
    got = {
        r["id"]: r["n_rents"]
        for r in next_window_count(df, "station", "ts", window_seconds=w).collect()
    }
    # e1: window [t1, t1+W) contains only itself (e2 sits AT t1+W, which
    #     is excluded) and t1 == max_A - W passes the inclusive mask -> 1
    # e2: fails the mask (t2 > max_A - W)
    # e3: itself + e4 (at W-1µs, inside) -> 2
    # e4: e5 sits at t4 + W + 1µs -> outside its window -> 1
    # e5: fails the mask (it is the station max)
    assert got == {1: 1, 3: 2, 4: 1}


def test_next_window_count_matches_bruteforce_on_boundary_grid(spark):
    """Brute-force replay over a grid that includes exact-W and W±1µs
    gaps — the window operator must match the quadratic definition
    everywhere, boundaries included."""
    from bicis_spark.operators.targets import next_window_count

    w_us = 3_600 * 1_000_000
    base_us = 1_700_000_000_000_000
    gaps = [0, 1, w_us - 1, w_us, w_us + 1, 2 * w_us]
    rows, t = [], base_us
    for i, g in enumerate(gaps):
        t = base_us + sum(gaps[: i + 1])
        rows.append((i, "S", t))
    df = spark.createDataFrame(rows, "id long, station string, us long").select(
        "id", "station", F.timestamp_micros(F.col("us")).alias("ts")
    )
    got = {
        r["id"]: r["n_rents"]
        for r in next_window_count(df, "station", "ts", window_seconds=3600).collect()
    }
    mx = max(t for _, _, t in rows)
    want = {}
    for i, _, t in rows:
        if t <= mx - w_us:
            want[i] = sum(1 for _, _, u in rows if t <= u < t + w_us)
    assert got == want


def test_asof_tolerance_inclusive_at_exact_bound(spark):
    """As-of tolerance is INCLUSIVE of |diff| == tolerance and excludes
    tolerance + 1µs, in all three directions (the 604800000000µs +1
    mutants)."""
    from bicis_spark.operators.asof import asof_join

    tol_s = 60
    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, 7, base)], "eid long, uid long, ts timestamp"
    )
    for direction, offset, want in [
        ("backward", -dt.timedelta(seconds=tol_s), 100),                      # exactly tol behind
        ("backward", -dt.timedelta(seconds=tol_s, microseconds=1), None),     # 1µs past
        ("forward", dt.timedelta(seconds=tol_s), 100),
        ("forward", dt.timedelta(seconds=tol_s, microseconds=1), None),
        ("nearest", dt.timedelta(seconds=tol_s), 100),
        ("nearest", dt.timedelta(seconds=tol_s, microseconds=1), None),
        ("nearest", -dt.timedelta(seconds=tol_s, microseconds=1), None),
    ]:
        right = spark.createDataFrame(
            [(7, base + offset, 100)], "uid long, rts timestamp, val long"
        )
        out = asof_join(
            left, right, "ts", "rts", "uid", "uid", ["val"],
            left_id="eid", direction=direction, tolerance_s=tol_s,
        ).collect()
        assert len(out) == 1
        assert out[0]["val"] == want, (direction, offset, out[0]["val"])


def test_asof_nearest_exact_tie_prefers_backward(spark):
    """Exact-distance tie (one right row tol behind, one tol ahead):
    'nearest' must deterministically pick the BACKWARD row — the
    documented tie rule both engines replay."""
    from bicis_spark.operators.asof import asof_join

    base = dt.datetime(2024, 6, 1, 12, 0, 0)
    d = dt.timedelta(seconds=30)
    left = spark.createDataFrame([(1, 7, base)], "eid long, uid long, ts timestamp")
    right = spark.createDataFrame(
        [(7, base - d, 100), (7, base + d, 200)],
        "uid long, rts timestamp, val long",
    )
    out = asof_join(
        left, right, "ts", "rts", "uid", "uid", ["val"],
        left_id="eid", direction="nearest",
    ).collect()
    assert out[0]["val"] == 100


def test_phrase_search_minimum_length_doc(spark):
    """The `len(tokens) >= 3` phrase-length boundary the corpus never
    exercises (no matching 3-token document at oracle SF): a document
    that IS exactly the phrase must match with one occurrence; a 2-token
    prefix must not appear; a 3-token doc one substitution off must not
    match (kills the surviving ge->gt / position int+1 mutants)."""
    from bicis_spark.extensions.text import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big order scan"),          # exactly the phrase
            (2, "big order"),               # too short
            (3, "big order scam"),          # 3 tokens, last differs
            (4, "x big order scan"),        # phrase at the very END
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "big order scan").collect()
    }
    assert got == {1: 1, 4: 1}


def test_bfs_vertex_encoding_keeps_sides_disjoint(spark):
    """The 2k / 2k+1 bipartite encoding boundary the saturated sf0.001
    graph can't show (every encoding perturbation still reaches the same
    set within 2 hops there): on a graph where part 3 and supplier 1
    would COLLIDE under a pk*3 encoding (3*1 == 2*1+1), the proper
    encoding keeps them distinct vertices with distinct hop counts."""
    from bicis_spark.operators.graph import bfs_hops

    # supplier 1 (vertex 3) supplies part 3 (vertex 6); part 3 also
    # supplied by supplier 2 (vertex 5). Seed = supplier 1.
    edges_dir = [(3, 6), (5, 6)]
    edges = spark.createDataFrame(
        edges_dir + [(b, a) for a, b in edges_dir], "src LONG, dst LONG"
    )
    seeds = spark.createDataFrame([(3,)], "v LONG")
    got = {
        r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=4).collect()
    }
    # part vertex 6 (= 2*3) is NOT the same node as supplier vertex 3
    assert got == {3: 0, 6: 1, 5: 2}
