"""Count-min sketch: fixed-size frequency counters with a one-sided error
guarantee (estimate >= true count, always; overestimate bounded by the
collision mass N/width per row, taken min across depth independent rows).

The reference counts frequencies by full groupBys (pandas value_counts in
bicis/etl/basic_features.py); at 100 TB a full groupBy on a high-cardinality
key is a giant shuffle whose result may not fit anywhere. The CMS costs a
CONSTANT depth × width counter grid regardless of key cardinality:

- build: each input row contributes ``depth`` (row, col) increments via
  seeded xxhash64; the groupBy that follows has at most depth × width
  groups, so map-side partial aggregation collapses each task's contribution
  to <= depth × width rows before the (tiny) shuffle. The 100 TB input is
  scanned once and never shuffled.
- estimate: the counter grid is broadcast (depth × width rows, e.g. 4 × 1024
  = 4096) and candidate keys probe it with a broadcast-hash join + min()
  hash agg — no shuffle of the candidate side beyond its own key agg.

The one-sided guarantee (est >= exact) is deterministic — not probabilistic
— so it is hash-gated in the declared contract query; only the SIZE of the
overestimate is probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probe_positions(key_col: str, depth: int, width: int):
    """array<int> of the key's counter column per sketch row, via seeded
    xxhash64 (seed = row index)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width)).cast(
                "int"
            )
            for i in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Counter grid as (row_i, col_i, cnt) — at most depth × width rows."""
    rows = df.select(
        F.posexplode(_probe_positions(key_col, depth, width)).alias(
            "row_i", "col_i"
        )
    )
    return rows.groupBy("row_i", "col_i").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(key, cms_est): min over the key's depth counters. Keys absent from
    the input estimate as the pure collision mass (>= 0), never null —
    unless a counter cell was never touched at all, in which case the
    inner join drops that probe and min() runs over the touched cells
    (still an upper bound, since the untouched cell would estimate 0 for
    a key that, being absent, has true count 0)."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(_probe_positions(key_col, depth, width)).alias(
            "row_i", "col_i"
        ),
    )
    return (
        probes.join(F.broadcast(counters), on=["row_i", "col_i"], how="inner")
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )


def heavy_hitters_with_contract(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-k exact heavy hitters with the CMS one-sided guarantee checked
    per key: (key, exact_n, est_ge_exact). est_ge_exact is TRUE for every
    key by CMS construction — the declared oracle replays that invariant,
    so a sketch bug (an underestimate) hash-fails the contract.

    Ties at the rank-k boundary break on the key value, giving both
    engines the same total order.
    """
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_n"))
    top = exact.orderBy(F.desc("exact_n"), F.asc(key_col)).limit(k)
    counters = cms_build(df, key_col, depth, width)
    est = cms_estimate(counters, top.select(key_col), key_col, depth, width)
    return top.join(est, on=key_col).select(
        key_col,
        F.col("exact_n").cast("long").alias("exact_n"),
        (F.col("cms_est") >= F.col("exact_n")).alias("est_ge_exact"),
    )


def hex_prefix_int_sql(inner_sql: str, ndigits: int = 15) -> str:
    """SQL expression (valid in BOTH Spark SQL and DuckDB — the shared
    dialect subset the oracle discipline relies on) converting the first
    ``ndigits`` lowercase hex chars of ``inner_sql`` to a BIGINT via the
    digit polynomial. 15 digits = 60 bits: the largest prefix that stays
    comfortably inside int64. The per-digit decode is the same
    ascii-minus-offset trick as plans/analytics_queries._hash_split_sql."""
    if not 1 <= ndigits <= 15:
        raise ValueError("ndigits must be in [1, 15] to fit int64")

    def dig(i: int) -> str:
        a = f"ascii(substr({inner_sql}, {i}, 1))"
        return f"({a} - CASE WHEN {a} >= 97 THEN 87 ELSE 48 END)"

    # Seed the accumulator as BIGINT: ascii() is 32-bit on both engines,
    # so without the up-front cast the polynomial overflows INT past ~7
    # digits (Spark ANSI raises; DuckDB would too).
    v = f"CAST({dig(1)} AS BIGINT)"
    for i in range(2, ndigits + 1):
        v = f"({v} * 16 + {dig(i)})"
    return f"CAST({v} AS BIGINT)"


def kmv_distinct_estimate(
    df: DataFrame,
    key_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """KMV / bottom-k distinct-count estimator (Bar-Yossef et al. 2002;
    the θ-sketch family): hash every key to a 60-bit integer, keep the k
    SMALLEST distinct hash values; if the k-th smallest is h_(k), the
    keys are uniform on [0, 2^60), so est = (k-1) · 2^60 / h_(k). With
    fewer than k distinct keys the sketch is exhaustive and the estimate
    is exact.

    Unlike HLL (whose register layout is engine-internal), every step
    here is replayable SQL — md5 prefix, distinct, bottom-k, one double
    division — so the ESTIMATE ITSELF is hash-gated cross-engine, not
    just a tolerance contract around it.

    Scale: the distinct-hash set shuffles 8-byte ints (map-side
    combined); the bottom-k is sort+limit = per-partition take-ordered,
    never a global sort. Sketch state is k values — mergeable across
    partitions/days by unioning and re-taking the bottom k.

    Output: 1 row [exact_distinct, kmv_estimate, within_15pct] — the
    exact count rides along as the contract's reference."""
    # STRING (not VARCHAR): the one spelling both Spark SQL and DuckDB parse
    h_sql = hex_prefix_int_sql(
        f"md5(concat_ws(':', '{salt}', CAST({key_col} AS STRING)))"
    )
    hashes = df.select(F.expr(h_sql).alias("h")).distinct()
    bottom = hashes.orderBy("h").limit(k)
    sk = bottom.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("long").alias("n_in")
    )
    exact = df.agg(
        F.countDistinct(key_col).cast("long").alias("exact_distinct")
    )
    est = (
        F.when(F.col("n_in") < k, F.col("n_in").cast("double"))
        .otherwise(
            F.lit(float(k - 1))
            * F.lit(float(2**60))
            / F.col("hk").cast("double")
        )
        .alias("kmv_estimate")
    )
    return (
        exact.crossJoin(F.broadcast(sk))
        .select("exact_distinct", est)
        .select(
            "exact_distinct",
            "kmv_estimate",
            (
                F.abs(
                    F.col("kmv_estimate")
                    - F.col("exact_distinct").cast("double")
                )
                <= F.lit(0.15) * F.col("exact_distinct").cast("double")
            ).alias("within_15pct"),
        )
    )


def kmv_merge_law(
    df: DataFrame,
    key_col: str,
    part_col: str,
    k: int = 128,
    salt: str = "kmv",
) -> DataFrame:
    """The property that makes KMV a SKETCH rather than a query: per-
    partition bottom-k states merge losslessly — union the k-sets and
    re-take the bottom k, and you get EXACTLY the sketch a direct pass
    over the union would build (both are the k smallest distinct hashes;
    the per-partition bottom-k can only discard hashes that the union's
    bottom-k would discard anyway).

    This is the 100 TB operating mode: per-day / per-shard sketches are
    tiny persisted states, and any ad-hoc slice union (last week, one
    region) answers distinct counts WITHOUT rescanning the corpus. The
    law is checked end-to-end here: build one sketch per ``part_col``
    value, merge, and compare against the direct whole-table sketch.

    Output: 1 row [n_parts, merged_estimate, direct_estimate,
    merge_law_holds] — the boolean is the contract; both estimates are
    also hash-gated values themselves."""
    h_sql = hex_prefix_int_sql(
        f"md5(concat_ws(':', '{salt}', CAST({key_col} AS STRING)))"
    )
    hashes = df.select(
        F.col(part_col).alias("_p"), F.expr(h_sql).alias("h")
    ).distinct()
    # per-partition bottom-k: slice of the sorted distinct-hash array
    per_part = hashes.groupBy("_p").agg(
        F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("_bk")
    )
    n_parts = per_part.select(F.count(F.lit(1)).cast("long").alias("n_parts"))
    # merge: union the k-sets, dedup, re-take bottom k
    merged = (
        per_part.select(F.explode("_bk").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )

    def estimate():
        return F.when(
            F.col("n_in") < k, F.col("n_in").cast("double")
        ).otherwise(
            F.lit(float(k - 1)) * F.lit(float(2**60)) / F.col("hk").cast("double")
        )

    m = merged.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).cast("long").alias("n_in")
    ).select(estimate().alias("merged_estimate"))
    direct = (
        hashes.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(
            F.max("h").alias("hk"),
            F.count(F.lit(1)).cast("long").alias("n_in"),
        )
        .select(estimate().alias("direct_estimate"))
    )
    return (
        n_parts.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(direct))
        .select(
            "n_parts",
            "merged_estimate",
            "direct_estimate",
            (F.col("merged_estimate") == F.col("direct_estimate")).alias(
                "merge_law_holds"
            ),
        )
    )


def table_checksum(
    df: DataFrame,
    group_cols: list[str],
    field_cols: list[str],
) -> DataFrame:
    """Order-invariant per-group table digest — the HASH_AGG /
    reconciliation primitive: [group..., n_rows, checksum] where

        checksum = ( Σ_rows hex60(md5(row_encoding)) ) mod (2^61 - 1)

    ``field_cols`` must already be STRING-canonicalized by the caller
    (ints via CAST, doubles via exact cents, timestamps via epoch
    micros — string renderings of floats/timestamps differ between
    engines and would poison cross-system comparison). The row encoding
    is length-prefixed (``len:value``) and NULL-marked (``_N``), joined
    with '|', so field boundaries are unambiguous.

    SUM (not XOR) keeps the digest MULTISET-sensitive: duplicate rows
    shift the checksum instead of cancelling. The sum runs as exact
    DECIMAL(38,0) (row values < 2^60, so any realistic group count stays
    within 38 digits) and reduces mod the Mersenne prime 2^61-1 back to
    BIGINT. Plan: map-side md5 + partial sums — one scan, one
    bounded-key exchange; comparing two 100 TB replicas moves |groups|
    rows per side.
    """
    enc = [
        F.when(F.col(c).isNull(), F.lit("_N")).otherwise(
            F.concat(
                F.length(F.col(c)).cast("string"), F.lit(":"), F.col(c)
            )
        )
        for c in field_cols
    ]
    rows = df.select(
        *group_cols, F.md5(F.concat_ws("|", *enc)).alias("_h")
    ).select(
        *group_cols,
        F.expr(hex_prefix_int_sql("_h")).alias("_ri"),
    )
    return (
        rows.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("_ri").cast("decimal(38,0)")).alias("_s"),
        )
        .select(
            *group_cols,
            "n_rows",
            F.expr("CAST(_s % 2305843009213693951 AS BIGINT)").alias("checksum"),
        )
    )
