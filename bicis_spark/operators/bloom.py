"""Bloom-filter join pruning: build a compact bitmap of the small side's
join keys as a declarative aggregate, broadcast it, and pre-filter the big
side with pure bitwise expressions BEFORE the exact join.

Why this matters at 100 TB: a semi-join against a selective dimension
normally shuffles every surviving fact row to the join exchange. The bloom
pre-filter drops non-matching rows at the SCAN (map-side, no state), so
the join exchange carries only candidates + the bloom's false positives
(~(1 - e^(-kn/m))^k of the rest). The exact join still runs after, so
false positives never reach the output — correctness is independent of the
bitmap parameters, which is why the oracle is the plain semi-join.

This is the hand-rolled, cross-stage-reusable twin of Spark's runtime
bloom (spark.sql.optimizer.runtime.bloomFilter.enabled): same math, but
the filter here is an explicit DataFrame you can persist and apply to many
downstream scans instead of one optimizer-chosen join.

Determinism: xxhash64 positions, bit_or aggregation, integer bit tests —
no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 64


def _positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """k bit positions in [0, m_bits) from independently-seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)).cast("long")
        for seed in range(n_hashes)
    ]


def bloom_bitmap(
    keys: DataFrame, key_col: str, n_hashes: int = 2, m_bits: int = 65536
) -> DataFrame:
    """One-row DataFrame [_bloom: map<long,long>] — the bitmap as a sparse
    word->bits map (only occupied 64-bit words are stored, so a nearly
    empty filter broadcasts in O(occupied), not O(m))."""
    pos = _positions(F.col(key_col), n_hashes, m_bits)
    exploded = keys.select(
        F.explode(F.array(*pos)).alias("_p")
    ).select(
        F.floor(F.col("_p") / _WORD_BITS).cast("long").alias("_word"),
        # shiftleft via call_function: the Python F.shiftleft wrapper only
        # accepts a literal int shift, but the SQL function takes a column
        F.call_function(
            "shiftleft",
            F.lit(1).cast("long"),
            (F.col("_p") % _WORD_BITS).cast("int"),
        ).alias("_bit"),
    )
    words = exploded.groupBy("_word").agg(F.bit_or("_bit").alias("_bits"))
    return words.agg(
        F.map_from_arrays(
            F.collect_list("_word"), F.collect_list("_bits")
        ).alias("_bloom")
    )


def bloom_might_contain(
    key: Column, bloom_col: str, n_hashes: int = 2, m_bits: int = 65536
) -> Column:
    """True iff every hash position's bit is set (candidate or FP)."""
    cond = F.lit(True)
    for p in _positions(key, n_hashes, m_bits):
        word = F.floor(p / _WORD_BITS).cast("long")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % _WORD_BITS).cast("int")
        )
        hit = (
            F.coalesce(F.element_at(F.col(bloom_col), word), F.lit(0)).bitwiseAND(bit)
            != 0
        )
        cond = cond & hit
    return cond


def bloom_semi_join(
    big: DataFrame,
    small_keys: DataFrame,
    big_key: str,
    small_key: str,
    n_hashes: int = 2,
    m_bits: int = 65536,
) -> DataFrame:
    """big ⋉ small_keys with a broadcast bloom pre-filter on the big scan.

    Output == plain left-semi join (false positives are removed by the
    exact semi-join that follows); the bloom only reduces what the join
    exchange has to carry.
    """
    bmp = bloom_bitmap(small_keys, small_key, n_hashes, m_bits)
    candidates = big.crossJoin(F.broadcast(bmp)).where(
        bloom_might_contain(F.col(big_key), "_bloom", n_hashes, m_bits)
    ).drop("_bloom")
    # exact semi-join with NO broadcast hint: the point of the bloom is the
    # regime where the dimension's key set is too big to broadcast (100M
    # keys ~ gigabytes) while its bitmap is not (m_bits/8 bytes). AQE still
    # picks broadcast when the small side turns out tiny, as in tests.
    return candidates.join(
        small_keys,
        candidates[big_key] == small_keys[small_key],
        "left_semi",
    )
