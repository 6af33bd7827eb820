"""Round-8 mutation-survivor pinning tests (r7 verdict task #8).

The sf0.001 sweep over the 43 rotated-in oracles left 36 survivors; the
sf0.01 re-run killed 15 (kmv saturation, zorder %1024, kcore k=80,
mutual-information bucket edge, cuped date split — all data-vacant only
at the smallest SF). Of the 21 double-SF survivors, most are provably
equivalent mutants (SQL-comment edits, ascii()-of-longer-substring,
bootstrap replicate-id bijections, Bellman-Ford self-loops, the
r6/r7-classified quantization-scale class — see SCALE.md round-8 notes).
These tests stage rows exactly ON the remaining genuinely-vacant
boundaries so the semantics are pinned where the corpus-level hash gate
can't see them, per the round-5 pattern (test_boundary_goldens.py).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def test_lcc_degree_two_and_triangle_free_vertices(spark):
    """clustering_coefficient survivors (degree >= 2 -> > 2 / >= 3, and
    coalesce(tri, 0) -> 1): the corpus graph has no degree-2 vertex and
    no triangle-free vertex at either oracle SF. Stage both: a triangle
    {1,2,3} with a pendant path 3-4-5 gives vertex 1 degree EXACTLY 2
    with lcc = 1.0 (the >= 2 edge), vertex 4 degree 2 with ZERO
    triangles (lcc = 0.0 — kills the coalesce-to-1 mutant), vertex 5
    degree 1 (lcc NULL, the undefined case)."""
    from bicis_spark.operators.graph import local_clustering_coefficient

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {
        r["vertex"]: (r["degree"], r["n_triangles"], r["lcc"])
        for r in local_clustering_coefficient(edges, "src", "dst").collect()
    }
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (3, 1, pytest.approx(2.0 * 1 / (3 * 2)))
    assert got[4] == (2, 0, 0.0)
    assert got[5][0] == 1 and got[5][2] is None


def test_corpus_kl_length_one_document_included(spark):
    """corpus_kl_divergence survivor (length(text) > 0 -> > 1): no
    length-1 document exists at either oracle SF. A single-character
    document is a legal document — its slice must appear in the output
    (the > 1 mutant would silently drop the whole slice)."""
    from bicis_spark.extensions.text import corpus_kl_divergence

    docs = spark.createDataFrame(
        [
            (1, "x", "tiny"),
            (2, "big order scan big", "web"),
            (3, "order scan order scan", "web"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in corpus_kl_divergence(docs).collect()}
    assert set(rows) == {"tiny", "web"}
    # the length-1 doc's single token is slice-exclusive -> strictly
    # positive divergence from the rest of the corpus
    kl_col = [c for c in rows["tiny"].asDict() if "kl" in c.lower()][0]
    assert rows["tiny"][kl_col] > 0


def test_decision_stump_bucket_edges_and_cap(spark):
    """decision_stump_gains survivor (width literal +1): no value sits
    exactly on a bucket edge at either oracle SF (prices carry cents).
    Stage values exactly ON width multiples: 10 -> bucket 1 (not 0),
    9 -> bucket 0, and 35 -> clamped to the last bucket. Asserted via
    the per-threshold left/right counts (threshold t = bucket upper
    edge; side = value <= t via bucket index)."""
    from bicis_spark.operators.featurize import decision_stump_gains

    df = spark.createDataFrame(
        [(0, "a"), (9, "a"), (10, "b"), (20, "a"), (35, "b")],
        "v long, y string",
    )
    out = {
        r["threshold"]: (r["n_left"], r["n_right"])
        for r in decision_stump_gains(df, "v", "y", width=10, n_buckets=3).collect()
    }
    # buckets: {0,9}->b0, {10}->b1, {20,35}->b2 (35 clamps into the last)
    # threshold 10 = upper edge of b0: left {0,9}, right {10,20,35}
    # threshold 20 = upper edge of b1: left {0,9,10}, right {20,35}
    assert out[10] == (2, 3)
    assert out[20] == (3, 2)


def _write_parquet(spark, tmpdir: str, name: str, df) -> None:
    # match the driver testdata's INT64 micros encoding — read_table's
    # footer probe dispatches on it (Spark's default INT96 would trip it)
    key = "spark.sql.parquet.outputTimestampType"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "TIMESTAMP_MICROS")
    try:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmpdir, f"{name}.parquet")
        )
    finally:
        if prev is not None:
            spark.conf.set(key, prev)


def test_snm_block_prefix_boundary(spark, tmp_path):
    """sorted_neighborhood_pairs survivors (substring(c_name, 1, 10) ->
    (2, 10) / (1, 11)): every corpus c_name shares the constant prefix
    'Customer#0', so ANY 10-or-11-char window of it blocks identically.
    Stage names that differ exactly at position 10 (different blocks: no
    pair) and at position 11 (same block: paired) — each mutant moves
    one of the two decisions."""
    from bicis_spark.plans.analytics_queries import sorted_neighborhood_pairs_q

    cust = spark.createDataFrame(
        [
            (1, "AAAAAAAAA0x", 1, 0.0, "BUILDING"),
            (2, "AAAAAAAAA0y", 1, 0.0, "BUILDING"),
            (3, "AAAAAAAAA1x", 1, 0.0, "BUILDING"),
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    _write_parquet(spark, str(tmp_path), "customer", cust)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs_q(spark, str(tmp_path)).collect()
    }
    # 1 and 2 share block 'AAAAAAAAA0' (differ at char 11) -> paired;
    # 3 blocks alone ('AAAAAAAAA1', differs at char 10) -> unpaired
    assert pairs == {(1, 2)}


def test_cohort_ltv_age_week_five_boundary(spark, tmp_path):
    """cohort_ltv_curve survivor (/7 -> /8 on the week-age division):
    both sides truncate/round multiples of 7 identically up to 28 days
    (35/8 = 4.375 is the first multiple of 7 where they part), and the
    corpus purchase history never reaches 5 cohort-weeks at either
    oracle SF. Stage a purchase exactly 35 days after signup and pin
    age_weeks = 5."""
    from bicis_spark.plans.analytics_queries import cohort_ltv_curve_q

    base = dt.datetime(2024, 1, 1, 12, 0, 0)  # Monday
    events = spark.createDataFrame(
        [
            (1, base, 10, "signup", None, None),
            (2, base + dt.timedelta(days=7), 10, "purchase", 5.0, None),
            (3, base + dt.timedelta(days=35), 10, "purchase", 7.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _write_parquet(spark, str(tmp_path), "events", events)
    got = {
        r["age_weeks"]: r["revenue_cents"]
        for r in cohort_ltv_curve_q(spark, str(tmp_path)).collect()
    }
    assert got == {1: 500, 5: 700}


def test_bom_rollup_depth_covers_eight_digit_ids(spark, tmp_path):
    """bom_subtree_rollup survivor (range(8) -> range(9) in the oracle's
    ancestor levels): corpus part ids never reach 8 digits, so the extra
    level is vacant (id div 10^8 = 0, filtered). Stage an 8-digit id —
    its ancestor chain is exactly 8 levels deep (99999999 -> ... -> 9),
    pinning that _BOM_DEPTH=8 reaches the single-digit root from the
    largest id in the documented domain (ids < 10^8; a deployment with
    wider keys must raise the depth with the domain)."""
    from bicis_spark.plans.analytics_queries import bom_subtree_rollup_q

    ids = [9, 99, 999, 9999, 99999, 999999, 9999999, 99999999]
    part = spark.createDataFrame(
        [(i, "p", "B", "T", 1, 1.0) for i in ids],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    _write_parquet(spark, str(tmp_path), "part", part)
    got = {
        r["id"]: (r["n_subtree"], r["subtree_value"])
        for r in bom_subtree_rollup_q(spark, str(tmp_path)).collect()
    }
    # the root aggregates the whole 8-node chain, self included
    assert got[9] == (8, 8)
    # the 8-digit leaf's subtree is itself
    assert got[99999999] == (1, 1)
    # and each intermediate counts its suffix chain
    assert got[9999] == (5, 5)


def test_lcc_broadcast_modes_agree(spark):
    """The r8 count-gated "auto" degree-attach mode is a PLAN-only
    choice: False / True / "auto" must produce identical rows on the
    same graph (the triangle set is orientation-invariant and the
    attach mode cannot change any value)."""
    from bicis_spark.operators.graph import local_clustering_coefficient

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 4)],
        "src long, dst long",
    )
    results = []
    for mode in (False, True, "auto"):
        rows = sorted(
            (r["vertex"], r["degree"], r["n_triangles"], r["lcc"])
            for r in local_clustering_coefficient(
                edges, "src", "dst", broadcast_degrees=mode
            ).collect()
        )
        results.append(rows)
    assert results[0] == results[1] == results[2]
