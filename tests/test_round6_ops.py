"""Round-6 operator unit tests: int8 scalar quantization edge cases, the
Morton interleave against a Python bit-twiddling reference, the
one-IRLS-step GLM surface living in test_ols.py, and the late-round-6
batch — chi-square cells, activity streaks, ACF/CCF, corpus KL
divergence, l-diversity, change-point, clustering coefficient, k-core
peel, interpolation join, isotonic-vs-PAVA, Haar energy, MASE, the
join-size identity, DKW bands, and histogram-rank Mann-Whitney — each
replayed against a pure-Python reference."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_int8_quantize_zero_dim_and_extremes(spark):
    """A dimension that is identically zero gets scale 0 (all q=0, no
    division blowup); the max-magnitude element of each dimension lands
    exactly on ±127; nothing clips under corpus-derived symmetric
    scales."""
    from bicis_spark.extensions.similarity import int8_quantize_stats

    rows = [
        (1, [1.0, 0.0, -2.0]),
        (2, [-0.5, 0.0, 4.0]),
        (3, [0.25, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in int8_quantize_stats(df, "vec_id", "embedding", dims=3).collect()
    }
    # dim scales: 127/1.0, 0, 127/4.0
    # vec 1: q = [127, 0, floor(-63.5+0.5)=-63]  -> l1 190, sum 64, l2 20098
    assert (out[1]["l1"], out[1]["sum_q"], out[1]["l2"]) == (190, 64, 16129 + 3969)
    # vec 2: q = [floor(-63.5+0.5)=-63, 0, 127]
    assert (out[2]["l1"], out[2]["sum_q"]) == (190, 64)
    # vec 3: q = [floor(31.75+0.5)=32, 0, 0]
    assert (out[3]["l1"], out[3]["sum_q"], out[3]["l2"]) == (32, 32, 1024)
    assert all(r["n_clipped"] == 0 for r in out.values())


def test_morton_interleave_matches_python(spark):
    """The arithmetic-only interleave SQL equals the classic bit-twiddled
    Morton code for every (x, y) in a 32x32 grid."""
    from bicis_spark.plans.analytics_queries import _interleave_terms

    def morton(x, y, bits=10):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "xk long, yk long")
    got = {
        (r["xk"], r["yk"]): r["z"]
        for r in df.selectExpr(
            "xk", "yk", f"({_interleave_terms('xk', 'yk', 10)}) AS z"
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == morton(x, y)


def test_zorder_buckets_are_tight_boxes(spark, sf_dir):
    """Every z-bucket's (cust, day) bounds form a box no wider than the
    bucket's bit budget allows: the top 10 interleaved bits fix 5 high
    bits of each key, so each range spans < 2^5 = 32 values... per the
    z-curve recursion. This is the data-skipping property the layout
    exists for (a random layout gives full-width boxes)."""
    from bicis_spark.plans.analytics_queries import zorder_layout_orders_q

    rows = zorder_layout_orders_q(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["min_z"] <= r["max_z"]
        assert r["max_z"] - r["min_z"] < 1 << 10  # within-bucket z span
        assert r["max_cust"] - r["min_cust"] < 32
        assert r["max_day"] - r["min_day"] < 32
        assert r["n"] >= 1


def test_cuped_reduces_variance(spark, sf_dir):
    """CUPED's reason to exist: with a covariate correlated to the metric
    (same customers' spend in the two periods), the adjusted pooled
    variance must come out below the raw pooled variance, and the
    adjusted means stay means (between the per-arm min/max of the raw
    metric scale)."""
    from bicis_spark.plans.analytics_queries import cuped_adjusted_ab_q

    r = cuped_adjusted_ab_q(spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0.0 < r["var_ratio"] < 1.0
    assert r["theta"] != 0.0
    assert abs(r["z_cuped"]) < 50  # a null A/B split must not "detect" anything huge


def test_skipgram_pairs_small_doc(spark, tmp_path):
    """A 4-token doc yields exactly the +-2-window pairs, symmetric, with
    the min_count=2 floor applied after symmetrization."""
    import pandas as pd

    from bicis_spark.plans.extension_queries import skipgram_pairs_q

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b a b", "a b c d"],
            "n_chars": [7, 7],
            "lang": ["en", "en"],
            "url": ["u0", "u1"],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {
        (r["w"], r["c"]): r["n"]
        for r in skipgram_pairs_q(spark, d).collect()
    }
    # doc0 fwd pairs: (a,b)x2 (b,a) (a,a) (b,b); doc1 fwd: (a,b)(b,c)(c,d)(a,c)(b,d)
    # symmetrized: (a,b)=(b,a)=4, (a,a)=(b,b)=2; every doc1-only pair
    # symmetrizes to 1 and the min_count=2 floor drops it
    assert got == {
        ("a", "b"): 4,
        ("b", "a"): 4,
        ("a", "a"): 2,
        ("b", "b"): 2,
    }
    assert ("a", "d") not in got  # distance 3: outside the window


def test_bom_rollup_matches_python_tree_walk(spark, tmp_path):
    """Subtree sums over the decimal-radix hierarchy equal a literal
    recursive tree walk in Python — pinning that ancestor_k = id div 10^k
    enumerates exactly the ancestor chain (and that nodes absent from the
    table contribute children but receive no row)."""
    import pandas as pd

    from bicis_spark.plans.analytics_queries import bom_subtree_rollup_q

    ids = [1, 2, 3, 12, 13, 25, 123, 124, 256, 1234]
    pdf = pd.DataFrame(
        {
            "p_partkey": ids,
            "p_name": [f"p{i}" for i in ids],
            "p_brand": ["b"] * len(ids),
            "p_type": ["t"] * len(ids),
            "p_size": [1] * len(ids),
            "p_container": ["c"] * len(ids),
            "p_retailprice": [float(i) + 0.75 for i in ids],
        }
    )
    d = str(tmp_path)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/part.parquet"
    )
    got = {
        r["id"]: (r["n_subtree"], r["subtree_value"])
        for r in bom_subtree_rollup_q(spark, d).collect()
    }

    import math

    def expect(node):
        n = s = 0
        for i in ids:
            a = i
            while a > 0:
                if a == node:
                    n += 1
                    s += math.floor(i + 0.75)
                    break
                a //= 10
        return (n, s)

    assert set(got) == set(ids)  # only existing nodes get rows
    for node in ids:
        assert got[node] == expect(node), node
    # spot meaning: node 12 owns {12, 123, 124, 1234}
    assert got[12] == (4, 12 + 123 + 124 + 1234)


def test_embedding_covariance_matches_numpy(spark, tmp_path):
    """cov_num / (n^2 Q^2) reproduces numpy's biased covariance of the
    quantized vectors (scaled by n/(n-1) ... we compare the raw integer
    identity n*Sxy - Sx*Sy directly against exact Python ints)."""
    import math

    import pandas as pd

    from bicis_spark.plans.extension_queries import (
        _COV_Q,
        embedding_covariance_ints_q,
    )

    import numpy as np

    # pre-round to float32: that's what the parquet column stores and the
    # engine quantizes, so the Python replay must start from the same bits
    vecs = [
        [float(np.float32(((i * 7 + j * 13) % 29) / 29.0 - 0.5)) for j in range(64)]
        for i in range(10)
    ]
    d = str(tmp_path)
    # match the driver layout: embedding is array<float> (read_table reads
    # the EMBEDDINGS schema; a double array would type-mismatch the scan)
    spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    got = {
        (r["i"], r["j"]): (r["n"], r["si"], r["sj"], r["cov_num"])
        for r in embedding_covariance_ints_q(spark, d).collect()
    }
    assert len(got) == 64 * 65 // 2
    q = [[math.floor(x * _COV_Q) for x in v] for v in vecs]
    for (i, j) in [(0, 0), (0, 63), (5, 40), (63, 63)]:
        n = len(q)
        si = sum(r[i] for r in q)
        sj = sum(r[j] for r in q)
        sp = sum(r[i] * r[j] for r in q)
        assert got[(i, j)] == (n, si, sj, n * sp - si * sj), (i, j)


def test_incremental_join_view_exercises_all_delta_terms(spark, sf_dir):
    """The maintenance law is only meaningful if every delta term carries
    rows: base⋈base, Δorders⋈base, base⋈Δlineitem, Δorders⋈Δlineitem must
    each be non-empty at the chosen split (otherwise the decomposition
    degenerates to a plain recompute and the oracle MATCH proves
    nothing)."""
    from bicis_spark.sources.io import read_table

    split = F.lit("1998-07-01").cast("timestamp")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    a = o.where(F.col("o_orderdate") < split)
    da = o.where(F.col("o_orderdate") >= split)
    b = l.where(F.col("l_shipdate") < split)
    db = l.where(F.col("l_shipdate") >= split)
    for left, right in ((a, b), (da, b), (a, db), (da, db)):
        assert (
            left.join(right, left["o_orderkey"] == right["l_orderkey"]).count() > 0
        )


def test_golden_record_singletons_and_merge(spark, tmp_path):
    """Unlinked customers form singleton golden records carrying their own
    attributes; a linked pair merges with max-balance survivorship and
    smallest-key canonical."""
    from bicis_spark.plans.extension_queries import golden_record_customers_q

    rows = [
        (1, "Customer#000000001", "BUILDING", 100.50),
        (2, "Customer#000000002", "MACHINERY", 200.25),  # links to 3 (1 edit)
        (3, "Customer#000000003", "AUTOMOBILE", 50.00),  # links to 2
        (40, "Zed Unique Name", "FURNITURE", 10.10),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (k, nm, "addr", 0, "phone", bal, seg, "comment")
            for k, nm, seg, bal in rows
        ],
        "c_custkey long, c_name string, c_address string, c_nationkey long, "
        "c_phone string, c_acctbal double, c_mktsegment string, c_comment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    got = {
        r["cluster_id"]: r for r in golden_record_customers_q(spark, d).collect()
    }
    # 1 links to 2 and 3 too (all one edit apart in the last digit) -> one
    # cluster {1,2,3}; 40 is a singleton
    assert set(got) == {1, 40}
    g = got[1]
    assert g["n_members"] == 3
    assert g["canonical_custkey"] == 1
    assert g["acctbal_max_cents"] == 20025
    # mode over 3 distinct segments: tie -> smallest value
    assert g["seg_mode"] == "AUTOMOBILE"
    s = got[40]
    assert (s["n_members"], s["canonical_custkey"], s["acctbal_max_cents"]) == (
        1,
        40,
        1010,
    )
    assert s["seg_mode"] == "FURNITURE"


def test_zipf_fit_negative_slope_and_replay(spark, tmp_path):
    """On a corpus with a strict frequency hierarchy the fitted log-log
    slope is negative, and (n_vocab, slope) match an exact Python replay
    of the quantized OLS."""
    import math

    from bicis_spark.plans.extension_queries import _ZIPF_S, zipf_fit_tokens_q

    # freq: a=8, b=4, c=2, d=1
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    d = str(tmp_path)
    spark.createDataFrame(
        [(0, text, len(text), "en", "u")],
        "doc_id long, text string, n_chars long, lang string, url string",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = zipf_fit_tokens_q(spark, d).collect()[0]
    assert r["n_vocab"] == 4
    assert r["zipf_slope"] < 0

    pts = [(1, 8), (2, 4), (3, 2), (4, 1)]
    ql = lambda k: math.floor(math.log2(k) * _ZIPF_S)  # noqa: E731
    xs = [ql(rk) for rk, _ in pts]
    ys = [ql(f) for _, f in pts]
    n = float(len(pts))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sxx = float(sum(x * x for x in xs))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert r["zipf_slope"] == slope
    assert r["zipf_intercept"] == (sy - slope * sx) / n
    # halving frequencies fall faster than 1/rank -> slope steeper than -1
    assert -2.0 < slope < -1.0


def test_chisq_cells_match_scipy_free_replay(spark, tmp_path):
    """Cell contributions equal the Pearson formula computed from exact
    Python counts on a staged 2x2 table, and a perfectly independent
    table contributes ~0 everywhere."""
    from bicis_spark.plans.analytics_queries import chisq_independence_cells_q

    # 2x2: x=a rows: (y=p 30, y=q 10); x=b rows: (y=p 30, y=q 10) ->
    # independent by construction
    rows = []
    k = 0
    for x, y, cnt in (("a", "p", 30), ("a", "q", 10), ("b", "p", 30), ("b", "q", 10)):
        for _ in range(cnt):
            rows.append((k, 1, x, y, float(k), None))
            k += 1
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (i, None, None, x, y, None, None, None, None)
            for i, _, x, y, _, _ in rows
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderpriority string, o_orderstatus string, o_orderdate timestamp, "
        "o_clerk string, o_shippriority long, o_comment string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = {
        (r["x"], r["y"]): r for r in chisq_independence_cells_q(spark, d).collect()
    }
    assert len(got) == 4
    for (x, y), r in got.items():
        n, nx, ny, nxy = r["n"], r["n_x"], r["n_y"], r["n_xy"]
        expect = (n * nxy - nx * ny) ** 2 / (n * nx * ny)
        assert r["chisq_contrib"] == float(expect)
        assert abs(r["chisq_contrib"]) < 1e-12  # independence -> 0


def test_activity_streaks_islands_and_tiebreak(spark):
    """Hand-built calendar: user 1 has runs [Jan 1-3] and [Jan 10-11]
    (longest=3); user 2 has two equal 2-day runs — the EARLIER one must
    win the tie; duplicate events on one day collapse; a lone day is a
    streak of 1."""
    from bicis_spark.operators.timeseries import activity_streaks

    rows = [
        # user 1: 3-day run, gap, 2-day run; two events on Jan 2
        (1, "2024-01-01 10:00:00"), (1, "2024-01-02 01:00:00"),
        (1, "2024-01-02 23:00:00"), (1, "2024-01-03 12:00:00"),
        (1, "2024-01-10 09:00:00"), (1, "2024-01-11 09:00:00"),
        # user 2: [Feb 1-2] and [Feb 10-11], both length 2
        (2, "2024-02-10 08:00:00"), (2, "2024-02-11 08:00:00"),
        (2, "2024-02-01 08:00:00"), (2, "2024-02-02 08:00:00"),
        # user 3: single day
        (3, "2024-03-05 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {r["user_id"]: r for r in activity_streaks(df, "user_id", "ts").collect()}
    r1 = out[1]
    assert (r1["active_days"], r1["n_streaks"], r1["longest_streak"]) == (5, 2, 3)
    assert str(r1["longest_start"]) == "2024-01-01"
    assert str(r1["longest_end"]) == "2024-01-03"
    r2 = out[2]
    assert (r2["n_streaks"], r2["longest_streak"]) == (2, 2)
    assert str(r2["longest_start"]) == "2024-02-01"  # earliest-start tiebreak
    r3 = out[3]
    assert (r3["active_days"], r3["n_streaks"], r3["longest_streak"]) == (1, 1, 1)
    assert str(r3["longest_start"]) == str(r3["longest_end"]) == "2024-03-05"


def test_autocorrelation_matches_numpy(spark):
    """ACF of a deterministic integer series with gaps: sufficient stats
    and Pearson r at each lag equal a NumPy replay over the same pairs;
    a constant sub-series (zero variance) yields NULL acf."""
    import numpy as np

    from bicis_spark.operators.timeseries import autocorrelation

    # series with a hole at t=5 and an irregular tail
    ts = [0, 1, 2, 3, 4, 6, 7, 8, 11]
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5]
    series = spark.createDataFrame(list(zip(ts, xs)), "t long, x long")
    out = {r["lag"]: r for r in autocorrelation(series, "t", "x", max_lag=4).collect()}
    lookup = dict(zip(ts, xs))
    for lag in (1, 2, 3, 4):
        pairs = [(lookup[t], lookup[t - lag]) for t in ts if (t - lag) in lookup]
        if not pairs:
            assert lag not in out
            continue
        x = np.array([p[0] for p in pairs], dtype=np.int64)
        y = np.array([p[1] for p in pairs], dtype=np.int64)
        r = out[lag]
        assert r["n_pairs"] == len(pairs)
        assert (r["sx"], r["sy"]) == (int(x.sum()), int(y.sum()))
        assert (r["sxy"], r["sx2"], r["sy2"]) == (
            int((x * y).sum()), int((x * x).sum()), int((y * y).sum()))
        n = float(len(pairs))
        cov = n * float((x * y).sum()) - float(x.sum()) * float(y.sum())
        vx = n * float((x * x).sum()) - float(x.sum()) ** 2
        vy = n * float((y * y).sum()) - float(y.sum()) ** 2
        if vx > 0 and vy > 0:
            assert r["acf"] == cov / np.sqrt(vx * vy)
        else:
            assert r["acf"] is None

    # constant series -> zero variance -> NULL acf at every lag
    const = spark.createDataFrame([(t, 7) for t in range(6)], "t long, x long")
    for r in autocorrelation(const, "t", "x", max_lag=2).collect():
        assert r["acf"] is None


def test_corpus_kl_divergence_matches_python_grid(spark):
    """kl_num equals a pure-Python replay of the quantized GRID definition
    (sum over source x full vocab with add-1 smoothing) — proving the
    engine's absent-token closed form against the textbook formula."""
    import math
    from collections import Counter

    from bicis_spark.extensions.text import corpus_kl_divergence

    docs = [
        (1, "a", "the cat sat on the mat"),
        (2, "a", "the dog sat"),
        (3, "b", "quantum flux capacitors hum loudly"),
        (4, "b", "the flux hums"),
        (5, "c", "the cat sat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in corpus_kl_divergence(df, "source", "text", "doc_id").collect()
    }

    scale = 1_000_000
    toks = {(s, w) for _, s, txt in docs for w in txt.split(" ")}
    per = Counter()
    for _, s, txt in docs:
        for w in txt.split(" "):
            per[(s, w)] += 1
    glob = Counter()
    for (s, w), c in per.items():
        glob[w] += c
    vocab = sorted(glob)
    v, n = len(vocab), sum(glob.values())

    def qlog(k):
        return math.floor(math.log2(k) * scale)

    for s in ("a", "b", "c"):
        ns = sum(c for (s2, _), c in per.items() if s2 == s)
        expect = 0
        for w in vocab:
            cst = per.get((s, w), 0)
            crt = glob[w] - cst
            expect += (cst + 1) * (
                qlog(cst + 1) - qlog(ns + v) - qlog(crt + 1) + qlog(n - ns + v)
            )
        r = out[s]
        assert r["kl_num"] == expect
        assert r["n_tokens"] == ns
        assert r["vocab_size"] == v
        assert r["kl_bits"] == expect / (float(scale) * float(ns + v))
    # the distribution-divergent source must out-diverge the mimic
    assert out["b"]["kl_bits"] > out["c"]["kl_bits"]
    assert toks  # silence lints


def test_l_diversity_flags_homogeneous_groups(spark):
    """A class with one sensitive value is flagged regardless of size; a
    small class with >= l distinct values passes."""
    from bicis_spark.operators.featurize import l_diversity_audit

    rows = (
        [("g1", f"v{i % 3}") for i in range(9)]   # 3 distinct -> diverse
        + [("g2", "same")] * 50                    # big but homogeneous
        + [("g3", "x"), ("g3", "y")]               # 2 distinct < l=3
    )
    df = spark.createDataFrame(rows, "qi string, sens string")
    out = {r["qi"]: r for r in l_diversity_audit(df, ["qi"], "sens", l=3).collect()}
    assert out["g1"]["is_l_diverse"] and out["g1"]["sensitive_diversity"] == 3
    assert not out["g2"]["is_l_diverse"]
    assert out["g2"]["group_size"] == 50 and out["g2"]["sensitive_diversity"] == 1
    assert not out["g3"]["is_l_diverse"] and out["g3"]["sensitive_diversity"] == 2


def test_local_clustering_coefficient_known_graph(spark):
    """Kite graph: K4 on {1,2,3,4} plus pendant 5-1. Hand-checked lcc:
    vertices 2,3,4 have deg 3 and are in 3 triangles... (K4: each vertex
    in C(3,2)=3 triangles, lcc=1); vertex 1 has deg 4, still 3 triangles
    -> lcc = 6/12 = 0.5; pendant 5 has deg 1 -> NULL."""
    from bicis_spark.operators.graph import local_clustering_coefficient

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (5, 1)]
    # feed unnormalized directions + a duplicate to exercise the distinct;
    # 6-5-1 closes a triangle through the pendant, giving 5 EXACTLY degree
    # 2 (pins the deg >= 2 definedness boundary the sf0.001 graph never
    # exercises — mutation-sweep blind spot, classified in SCALE.md)
    edges = spark.createDataFrame(
        [(b, a) for a, b in k4] + [(1, 2), (5, 6), (6, 1)], "src long, dst long"
    )
    out = {
        r["vertex"]: r
        for r in local_clustering_coefficient(edges, "src", "dst").collect()
    }
    assert (out[1]["degree"], out[1]["n_triangles"], out[1]["lcc"]) == (
        5, 4, 0.4)
    for v in (2, 3, 4):
        assert (out[v]["degree"], out[v]["n_triangles"], out[v]["lcc"]) == (3, 3, 1.0)
    assert (out[5]["degree"], out[5]["n_triangles"], out[5]["lcc"]) == (2, 1, 1.0)
    assert (out[6]["degree"], out[6]["n_triangles"], out[6]["lcc"]) == (2, 1, 1.0)
    # lone pendant: degree 1 -> lcc undefined (NULL)
    edges2 = spark.createDataFrame([(7, 8), (8, 9), (8, 7)], "src long, dst long")
    out2 = {
        r["vertex"]: r
        for r in local_clustering_coefficient(edges2, "src", "dst").collect()
    }
    assert out2[7]["lcc"] is None and out2[7]["n_triangles"] == 0
    assert out2[8]["degree"] == 2 and out2[8]["lcc"] == 0.0


def test_degree_oriented_triangles_skewed_hub(spark):
    """Orientation-exactness on the adversarial shape the r6 verdict
    flagged: a mid-id hub (so id-ordering gives it both backward AND
    forward edges — the Θ(deg²) wedge case) wired to every other vertex,
    over a known ring. Degree-ordered orientation must (a) reproduce the
    exact triangle counts and (b) generate ZERO wedges pivoted at the
    hub (the hub is the highest rank, so its oriented forward degree is
    0 — the O(√m)-forward-degree property that bounds wedge volume at
    any skew)."""
    from pyspark.sql import functions as F

    from bicis_spark.operators.graph import (
        _edge_degrees,
        _normalize_edges,
        _orient_by_degree,
        local_clustering_coefficient,
        triangle_count,
    )

    n, hub = 40, 20
    ring = [(i, (i + 1) % n) for i in range(n) if i != hub and (i + 1) % n != hub]
    spokes = [(hub, i) for i in range(n) if i != hub]
    edges = spark.createDataFrame(ring + spokes, "src long, dst long")
    # triangles: each surviving ring edge (i, i+1) closes with the hub.
    # ring edges excluded: those touching the hub (i=19,20) — 38 remain.
    tc = triangle_count(edges, "src", "dst").collect()[0]
    assert tc["n_triangles"] == 38
    lcc = {
        r["vertex"]: r
        for r in local_clustering_coefficient(edges, "src", "dst").collect()
    }
    assert lcc[hub]["degree"] == 39 and lcc[hub]["n_triangles"] == 38
    # a mid-ring vertex: degree 3 (two ring + hub), 2 triangles
    assert lcc[5]["degree"] == 3 and lcc[5]["n_triangles"] == 2
    assert lcc[5]["lcc"] == 2 * 2.0 / (3.0 * 2.0)
    # the skew bound itself: no wedge pivots at the hub
    e = _normalize_edges(edges, "src", "dst")
    eo = _orient_by_degree(e, _edge_degrees(e))
    assert eo.where(F.col("u") == hub).count() == 0


def test_kcore_peel_cascade(spark):
    """Chain-of-triangles graph where peeling cascades: a path 10-11-12
    hangs off a K4 {1,2,3,4}. k=3: round 1 drops 12 (deg 1) and 10? No:
    10-11-12 all deg<=2, all dropped round 1; K4 survives with residual
    degree 3 each. Also: k=3 on a pure 6-cycle (all deg 2) empties the
    graph."""
    from bicis_spark.operators.graph import kcore_peel

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + tail, "src long, dst long")
    out = {r["vertex"]: r["residual_degree"]
           for r in kcore_peel(edges, "src", "dst", k=3, rounds=4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    edges2 = spark.createDataFrame(cyc, "src long, dst long")
    assert kcore_peel(edges2, "src", "dst", k=3, rounds=2).count() == 0

    # cascade needing multiple rounds: path 20-21-22-23 attached pairwise
    # (21-23, 20-22) makes degrees 2..3; k=2 keeps the diamond, k=3 kills
    diamond = [(20, 21), (21, 22), (22, 23), (21, 23), (20, 22)]
    edges3 = spark.createDataFrame(diamond, "src long, dst long")
    got = {r["vertex"] for r in kcore_peel(edges3, "src", "dst", k=2, rounds=3).collect()}
    assert got == {20, 21, 22, 23}


def test_changepoint_finds_planted_level_shift(spark, sf_dir):
    """On a series with a planted mean shift (5,5,5,5,20,20,20,20) the
    max-reduction boundary is exactly the shift point, and the reduction
    equals the closed form n_l*n_r/(n_l+n_r) * (mean_l - mean_r)^2."""
    from bicis_spark.plans.analytics_queries import changepoint_hourly_split_q

    # unit-level check against a hand series through the same math
    import numpy as np

    xs = [5, 5, 5, 5, 20, 20, 20, 20]

    def sse(a):
        a = np.asarray(a, dtype=float)
        return float((a * a).sum() - a.sum() ** 2 / len(a))

    best = max(
        range(1, len(xs)),
        key=lambda i: sse(xs) - (sse(xs[:i]) + sse(xs[i:])),
    )
    assert best == 4  # boundary after index 4 rows (n_l = 4)

    # engine-level: run on real data, then replay the argmin row's
    # reduction from its own emitted sufficient statistics
    rows = changepoint_hourly_split_q(spark, sf_dir).collect()
    assert rows
    top = max(rows, key=lambda r: (r["sse_reduction"], -r["boundary_t"]))
    n_l, n_r = top["n_l"], top["n_r"]
    sx_l, sx_r = top["sx_l"], top["sx_r"]
    sx2_l, sx2_r = top["sx2_l"], top["sx2_r"]
    cost_l = sx2_l - sx_l * float(sx_l) / n_l
    cost_r = sx2_r - sx_r * float(sx_r) / n_r
    n_t, sx_t, sx2_t = n_l + n_r, sx_l + sx_r, sx2_l + sx2_r
    cost_t = sx2_t - sx_t * float(sx_t) / n_t
    assert abs(top["split_cost"] - (cost_l + cost_r)) < 1e-6
    assert abs(top["sse_reduction"] - (cost_t - (cost_l + cost_r))) < 1e-6
    assert top["sse_reduction"] >= max(r["sse_reduction"] for r in rows) - 1e-12


def test_interpolate_series_at_cases(spark):
    """Midpoint target gets the arithmetic mean; exact-hit takes the
    point value; before-first and after-last get NULL interp but the
    ONE-SIDED neighbor populated (t0/t1 are independent ≤/≥ lookups —
    the oracle's two-direction ASOF semantics, ADVICE r6); a target in
    an hour with no series point interpolates across the gap."""
    from bicis_spark.operators.timeseries import interpolate_series_at

    series = spark.createDataFrame(
        [("2024-01-01 10:00:00", 10), ("2024-01-01 12:00:00", 30)],
        "h string, x long",
    ).select(F.col("h").cast("timestamp").alias("h"), "x")
    targets = spark.createDataFrame(
        [
            (1, "2024-01-01 11:00:00"),   # midpoint across the 11:00 gap
            (2, "2024-01-01 10:00:00"),   # exact hit
            (3, "2024-01-01 09:30:00"),   # before first point
            (4, "2024-01-01 12:30:00"),   # after last point
            (5, "2024-01-01 10:30:00"),   # quarter of the way
            (6, "2024-01-01 08:15:00"),   # >1 step before span (grid miss)
            (7, "2024-01-01 14:45:00"),   # >1 step after span (grid miss)
        ],
        "event_id long, ts string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"))
    out = {
        r["event_id"]: r
        for r in interpolate_series_at(
            targets, series, "ts", "event_id", "h", "x"
        ).collect()
    }
    assert out[1]["interp_value"] == 20.0
    assert out[2]["interp_value"] == 10.0 and out[2]["t0"] == out[2]["t1"]
    import datetime as _dt

    first_pt = _dt.datetime(2024, 1, 1, 10, 0, 0)
    last_pt = _dt.datetime(2024, 1, 1, 12, 0, 0)
    # before-span: no ≤-neighbor, but the ≥-neighbor is the FIRST point
    assert out[3]["interp_value"] is None and out[3]["x0"] is None
    assert out[3]["t0"] is None
    assert out[3]["t1"] == first_pt and out[3]["x1"] == 10
    # after-span: no ≥-neighbor, but the ≤-neighbor is the LAST point
    assert out[4]["interp_value"] is None and out[4]["x1"] is None
    assert out[4]["t1"] is None
    assert out[4]["t0"] == last_pt and out[4]["x0"] == 30
    assert out[5]["interp_value"] == 10.0 + 20.0 * (1800.0 / 7200.0)
    # grid-miss targets (truncated hour strictly outside [lo,hi]) take
    # the same one-sided-neighbor contract as the edge-hour ones above
    assert out[6]["interp_value"] is None and out[6]["t0"] is None
    assert out[6]["t1"] == first_pt and out[6]["x1"] == 10
    assert out[7]["interp_value"] is None and out[7]["t1"] is None
    assert out[7]["t0"] == last_pt and out[7]["x0"] == 30


def test_cross_correlation_detects_planted_lead(spark):
    """y is x shifted forward by 2 steps (y_t = x_{t-2} exactly): the
    r = 1 peak must sit at lag +2 (y leads x... wait: x_t pairs with
    y_{t-lag}; y_t = x_{t-2} means x_t = y_{t+2}, pairing x_t with
    y_{t-lag} = x_{t-lag-2} is perfect when lag = -2)."""
    from bicis_spark.operators.timeseries import cross_correlation

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    x = spark.createDataFrame(list(enumerate(xs)), "t long, x long")
    y = spark.createDataFrame(
        [(t + 2, v) for t, v in enumerate(xs)], "t long, x long"
    )
    out = {r["lag"]: r for r in cross_correlation(x, y, "t", "x", max_lag=3).collect()}
    assert out[-2]["ccf"] == 1.0
    assert out[-2]["n_pairs"] == len(xs)
    assert all(
        out[lag]["ccf"] is None or out[lag]["ccf"] < 1.0
        for lag in out if lag != -2
    )


def test_isotonic_fit_matches_pava(spark):
    """The minimax closed form equals a hand-rolled sequential PAVA on a
    bin sequence with two violations; the fit is non-decreasing and
    preserves pooled-block weighted means."""
    from decimal import Decimal

    from bicis_spark.operators.stats import isotonic_fit_bins

    # (bin, n, sum): raw means 1.0, 3.0, 2.0, 2.5, 5.0, 4.0 — two dips
    raw = [(1, 2, 2), (2, 1, 3), (3, 2, 4), (4, 2, 5), (5, 1, 5), (6, 3, 12)]

    def pava(bins):
        blocks = [[n, s] for _, n, s in bins]
        merged = True
        while merged:
            merged = False
            for i in range(len(blocks) - 1):
                if blocks[i][1] / blocks[i][0] > blocks[i + 1][1] / blocks[i + 1][0]:
                    blocks[i][0] += blocks[i + 1][0]
                    blocks[i][1] += blocks[i + 1][1]
                    del blocks[i + 1]
                    merged = True
                    break
        out = []
        for n, s in blocks:
            out.extend([s / n] * 0 or [])
        # expand per original bin
        vals = []
        for n, s in blocks:
            fitted = s / n
            total = 0
            for _, bn, _ in bins[len(vals):]:
                vals.append(fitted)
                total += bn
                if total >= n:
                    break
        return vals

    expect = pava(raw)
    df = spark.createDataFrame(
        [(b, n, Decimal(s)) for b, n, s in raw],
        "decile long, n long, s decimal(18,2)",
    )
    got = {
        r["decile"]: r
        for r in isotonic_fit_bins(df, "decile", "n", "s").collect()
    }
    fitted = [got[b]["iso"] for b, _, _ in raw]
    assert fitted == expect
    assert all(a <= b for a, b in zip(fitted, fitted[1:]))  # monotone
    # pooled blocks preserve weighted means: total weighted sum preserved
    assert sum(got[b]["iso"] * n for b, n, _ in raw) == sum(s for _, _, s in raw)


def test_haar_energy_matches_pywavelet_free_reference(spark):
    """3-level unnormalized Haar on a hand series equals a pure-Python
    recursive transform, including dyadic truncation of odd tails; a
    constant series has zero detail energy at every level."""
    from bicis_spark.operators.timeseries import haar_energy

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]  # length 11: tails drop
    df = spark.createDataFrame(list(enumerate(xs)), "t long, x long")
    got = {r["level"]: r for r in haar_energy(df, "t", "x", levels=3).collect()}

    cur = xs
    for lvl in (1, 2, 3):
        pairs = [(cur[2 * j], cur[2 * j + 1]) for j in range(len(cur) // 2)]
        a = [p + q for p, q in pairs]
        d = [p - q for p, q in pairs]
        r = got[lvl]
        assert r["n_pairs"] == len(pairs)
        assert r["energy_detail"] == sum(v * v for v in d)
        assert r["energy_approx"] == sum(v * v for v in a)
        cur = a

    const = spark.createDataFrame([(t, 7) for t in range(8)], "t long, x long")
    for r in haar_energy(const, "t", "x", levels=3).collect():
        assert r["energy_detail"] == 0 and r["n_pairs"] == 8 >> r["level"]


def test_forecast_mase_identities(spark, sf_dir):
    """The emitted MASE reproduces exactly from its own integer
    numerators, and a perfectly seasonal series would give naive_err 0 —
    sanity: on real data naive_err > 0 and all counts positive."""
    from bicis_spark.plans.analytics_queries import forecast_mase_baselines_q

    r = forecast_mase_baselines_q(spark, sf_dir).collect()[0]
    assert r["n_train"] > 0 and r["n_test_naive"] > 0 and r["naive_err"] > 0
    mae_mean = r["mean_err_scaled"] / (float(r["n_train"]) * r["n_test_mean"])
    mae_naive = r["naive_err"] / float(r["n_test_naive"])
    assert r["mae_mean"] == mae_mean
    assert r["mae_naive"] == mae_naive
    assert r["mase_mean_vs_naive"] == mae_mean / mae_naive


def test_join_size_identity_no_join_in_plan(spark, sf_dir):
    """The engine's cardinality rows must (a) equal a DuckDB-free direct
    count of the executed joins and (b) come from a plan whose scans
    never join fact-to-fact — only the count histograms meet."""
    from bicis_spark.plans.analytics_queries import join_size_by_key_stats_q

    got = {r["pair"]: r["join_size"]
           for r in join_size_by_key_stats_q(spark, sf_dir).collect()}

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert got["orders_lineitem_by_orderkey"] == (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"]).count()
    )
    p = ev.where(F.col("event_type") == "purchase").select("user_id")
    assert got["purchase_self_by_user"] == (
        p.join(p.withColumnRenamed("user_id", "u2"),
               F.col("user_id") == F.col("u2")).count()
    )


def test_dkw_bands_match_direct_counting(spark, sf_dir):
    """The histogram+cumsum n_le equals a direct per-probe filter count
    (including the boundary-inclusive ceil identity), the band width is
    sqrt(ln40/2n), and bands clamp to [0, 1]."""
    import math

    from bicis_spark.plans.analytics_queries import (
        ecdf_dkw_bands_totalprice_q,
    )

    rows = {r["probe"]: r
            for r in ecdf_dkw_bands_totalprice_q(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, 10))

    cents = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("x"))
    )
    b = cents.agg(F.min("x"), F.max("x"), F.count("x")).first()
    lo, hi, n = b
    for j, r in rows.items():
        direct = cents.where((F.col("x") - lo) * 10 <= j * (hi - lo)).count()
        assert r["n_le"] == direct, j
        assert r["n"] == n
        assert r["ecdf"] == direct / float(n)
        assert r["dkw_eps"] == math.sqrt(math.log(40.0) / (2.0 * n))
        assert 0.0 <= r["lo_band"] <= r["ecdf"] <= r["hi_band"] <= 1.0
    ecdfs = [rows[j]["ecdf"] for j in range(1, 10)]
    assert all(a <= b2 for a, b2 in zip(ecdfs, ecdfs[1:]))  # monotone CDF


def test_mann_whitney_histogram_ranks_match_naive(spark, sf_dir):
    """The histogram-derived doubled rank sum equals a naive midrank
    computation over the same per-customer spends (with ties), and the
    emitted U/effect/z reproduce from the integer statistics."""
    import math

    from bicis_spark.plans.analytics_queries import mann_whitney_ab_spend_q

    r = mann_whitney_ab_spend_q(spark, sf_dir).collect()[0]

    spends = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy(
            "o_custkey",
            F.when(
                F.ascii(
                    F.substring(
                        F.md5(F.concat_ws(":", F.col("o_custkey"), F.lit("ab"))),
                        1, 1,
                    )
                ) % 2 == 0, "A",
            ).otherwise("B").alias("arm"),
        )
        .agg((F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
             .cast("long").alias("x"))
        .collect()
    )
    vals = sorted((row["x"], row["arm"]) for row in spends)
    # naive midranks (1-based, average over ties), doubled to stay integer
    from collections import Counter
    cnt = Counter(v for v, _ in vals)
    before, rank2 = 0, {}
    for v in sorted(cnt):
        rank2[v] = 2 * before + cnt[v] + 1
        before += cnt[v]
    rs2 = sum(rank2[v] for v, arm in vals if arm == "A")
    n_a = sum(1 for _, arm in vals if arm == "A")
    n_b = len(vals) - n_a
    assert (r["n_a"], r["n_b"], r["rank_sum_2x_a"]) == (n_a, n_b, rs2)
    u2 = rs2 - n_a * (n_a + 1)
    assert r["u2_a"] == u2
    assert r["rank_biserial"] == 1.0 - u2 / (float(n_a) * float(n_b))
    tie = sum(c ** 3 - c for c in cnt.values())
    assert r["tie_term"] == tie
    n = n_a + n_b
    sig2 = (float(n_a) * float(n_b) / 12.0) * (
        float(n + 1) - float(tie) / (float(n) * float(n - 1)))
    assert abs(r["z"] - ((u2 - float(n_a) * float(n_b)) / 2.0) / math.sqrt(sig2)) < 1e-12
    assert abs(r["z"]) < 6  # a null split must not scream


def test_event_type_runs_collapses_and_splits(spark):
    """Hand sequence a a b a: three runs with correct spans; a repeated
    value after a gap starts a NEW run (value change, not time)."""
    from bicis_spark.plans.analytics_queries import event_type_runs_q
    import pandas as pd

    pdf = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": pd.to_datetime([
            "2024-01-01 10:00", "2024-01-01 10:05",
            "2024-01-01 10:10", "2024-01-01 10:15"]),
        "user_id": [7, 7, 7, 7],
        "event_type": ["a", "a", "b", "a"],
        "value": [1.0] * 4,
        "props": ["{}"] * 4,
    })
    import os
    import tempfile
    d = tempfile.mkdtemp()
    # match the driver layout: MICROS, not Spark's INT96 writer default
    prior = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        spark.createDataFrame(pdf).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet"))
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.parquet.outputTimestampType")
        else:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prior)
    rows = sorted(
        event_type_runs_q(spark, d).collect(), key=lambda r: r["run_id"]
    )
    assert [(r["event_type"], r["run_len"]) for r in rows] == [
        ("a", 2), ("b", 1), ("a", 1)]
    assert rows[0]["first_event_id"] == 1 and rows[2]["first_event_id"] == 4


def test_sorted_neighborhood_window_semantics(spark, sf_dir):
    """Every emitted pair is within w=3 in the per-prefix sort order, and
    the candidate count equals sum over blocks of max(0, n_b - d) per
    distance d."""
    from collections import Counter

    from bicis_spark.plans.analytics_queries import sorted_neighborhood_pairs_q

    rows = sorted_neighborhood_pairs_q(spark, sf_dir).collect()
    assert rows and all(1 <= r["neighbor_dist"] <= 3 for r in rows)
    names = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name").collect()
    )
    blocks = Counter(r["c_name"][:10] for r in names)
    expect = sum(
        max(0, n - d) for n in blocks.values() for d in (1, 2, 3))
    assert len(rows) == expect
    for r in rows:
        assert (r["lev"] <= 2) == r["is_match"]


def test_bellman_ford_matches_networkx_free_dijkstra(spark):
    """On a hand graph with a tempting-but-worse direct edge, the 4-round
    relaxation finds the cheaper 2-hop route; unreachable vertices get no
    row; a vertex exactly rounds+1 hops away keeps its partial-path cost
    semantics (documented fixed-round contract)."""
    from bicis_spark.operators.graph import bellman_ford_rounds

    edges = [
        (1, 2, 10), (2, 1, 10),
        (1, 3, 100), (3, 1, 100),   # direct but expensive
        (2, 3, 10), (3, 2, 10),     # 1-2-3 costs 20 < 100
        (3, 4, 1), (4, 3, 1),
        (9, 10, 1), (10, 9, 1),     # disconnected component
    ]
    e = spark.createDataFrame(edges, "u long, v long, w long")
    seeds = spark.createDataFrame([(1,)], "v long")
    out = {r["vertex"]: r["dist"]
           for r in bellman_ford_rounds(e, seeds, "u", "v", "w", rounds=4).collect()}
    assert out == {1: 0, 2: 10, 3: 20, 4: 21}
    assert 9 not in out and 10 not in out


def test_cohort_ltv_cumulative_identities(spark, sf_dir):
    """Per cohort: cum_revenue reconstructs from the sorted per-age
    revenues, ltv_per_user = cum / (100 * n_cohort), and the curve is
    non-decreasing in age."""
    from collections import defaultdict

    from bicis_spark.plans.analytics_queries import cohort_ltv_curve_q

    rows = cohort_ltv_curve_q(spark, sf_dir).collect()
    assert rows
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_bucket"]].append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r["age_weeks"])
        run = 0
        for r in rs:
            run += r["revenue_cents"]
            assert r["cum_revenue_cents"] == run
            assert r["ltv_per_user"] == run / (100.0 * r["n_cohort"])
            assert 0 < r["n_paying"] <= r["n_cohort"]
        curve = [r["cum_revenue_cents"] for r in rs]
        assert curve == sorted(curve)


def test_ucb1_score_algebra_and_ordering(spark, sf_dir):
    """Scores reproduce from the integer statistics; the bonus shrinks
    with n_i (a rarely-pulled arm gets more optimism at equal mean)."""
    import math

    from bicis_spark.plans.analytics_queries import ucb1_event_type_arms_q

    rows = ucb1_event_type_arms_q(spark, sf_dir).collect()
    assert rows
    n_total = rows[0]["n_total"]
    assert sum(r["n_i"] for r in rows) == n_total
    qln = math.floor(math.log(n_total) * 1_000_000)
    for r in rows:
        assert r["qln_n"] == qln
        mean = r["s_cents"] / (100.0 * r["n_i"])
        bonus = math.sqrt(2.0 * (qln / 1_000_000.0) / r["n_i"])
        assert r["mean_value"] == mean
        assert r["ucb_bonus"] == bonus
        assert r["ucb_score"] == mean + bonus
    by_n = sorted(rows, key=lambda r: r["n_i"])
    bonuses = [r["ucb_bonus"] for r in by_n]
    assert bonuses == sorted(bonuses, reverse=True)


def test_floor_semantics_pre_1970(spark, tmp_path):
    """ADVICE r6 regression pin: zorder's day key and the epoch-hour
    series keys must agree with the DuckDB oracle's FLOOR `//` semantics
    for PRE-1970 timestamps (Spark `div` / cast-to-long truncate toward
    zero — equivalent on the synthetic data only because all epochs are
    positive). Stages a tiny orders/events table straddling 1970 and
    replays the oracle SQL on it."""
    import duckdb

    from bicis_spark.plans.analytics_queries import (
        _ZORDER_SQL,
        acf_hourly_counts_q,
        zorder_layout_orders_q,
    )
    from tests.oracle_utils import assert_oracle_match

    d = str(tmp_path / "pre1970")
    prior = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    rows = [
        # (orderkey, custkey, date) — days -400..+400 around the epoch
        (i, 7 * i + 3, f"{1968 + (i % 5)}-0{1 + (i % 9)}-{10 + (i % 15)}"
         " 0%d:30:00" % (i % 10))
        for i in range(1, 120)
    ]
    sdf = spark.createDataFrame(
        [(ok, ck, ts) for ok, ck, ts in rows],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "'F' AS o_orderstatus",
        "CAST(100.0 AS DOUBLE) AS o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate",
        "'1-URGENT' AS o_orderpriority",
    )
    sdf.coalesce(1).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    # events table with pre-1970 ts for the hour-key family
    edf = spark.createDataFrame(
        [(i, i % 7, "view", f"{1969 + (i % 3)}-01-{1 + (i % 27):02d}"
          f" {i % 24:02d}:15:00") for i in range(1, 200)],
        "event_id long, user_id long, event_type string, ts string",
    ).selectExpr(
        "event_id", "user_id", "event_type",
        "CAST(ts AS TIMESTAMP) AS ts",
        "CAST(1.0 AS DOUBLE) AS value",
        "map('k', 'v') AS props",
    )
    edf.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    if prior is None:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    else:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prior)

    con = duckdb.connect()
    # Spark writes directories; point DuckDB at the part files
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'"
    )

    assert_oracle_match(
        zorder_layout_orders_q(spark, d), con, _ZORDER_SQL,
        "zorder_pre1970",
    )
    from bicis_spark.plans.queries import oracle_sql

    assert_oracle_match(
        acf_hourly_counts_q(spark, d), con,
        oracle_sql()["acf_hourly_counts"], "acf_pre1970",
    )
