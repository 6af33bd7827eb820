"""Fellegi–Sunter record-linkage scoring (probabilistic entity
resolution, Fellegi & Sunter 1969) as a blocked pair-scoring operator.

The production decomposition: (1) BLOCK on cheap equality keys so the
candidate space is Σ_b |b|² instead of N², (2) compare each candidate
pair field-by-field into an agreement vector, (3) sum per-field
log-likelihood-ratio weights, (4) band the score into
link / possible / non-link. Field weights (log2 m/u) come from an
offline EM fit in real deployments; here they are plugged in as INTEGER
constants (scaled log-odds), which keeps every score an exact BIGINT —
the repo's determinism discipline — and matches how a fitted model is
shipped to the cluster (broadcast constants, not per-pair estimation).

Scale: the only join is the within-block self-join — the classic
blocking trade: block keys must keep |b| bounded (add more keys or
split hot blocks exactly as AQE skew-split does for the equi-join). No
all-pairs path exists in this operator by construction.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, condition(left_prefix, right_prefix) -> Column, w_agree, w_disagree)
Comparator = tuple[str, Callable[[str, str], Column], int, int]


def fellegi_sunter_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[Column],
    comparators: Sequence[Comparator],
    link_threshold: int,
    possible_threshold: int,
    keep_below_possible: bool = False,
) -> DataFrame:
    """[id_a, id_b, score, match_class] for candidate pairs within each
    block (id_a < id_b). ``score`` is the integer sum of per-field
    agreement weights; ``match_class`` bands it. By default non-link
    pairs are dropped (they are the overwhelming majority)."""
    blocked = df.withColumn(
        "_blk", F.struct(*[c.alias(f"_b{i}") for i, c in enumerate(block_cols)])
    )
    a = blocked.select(
        F.col("_blk").alias("_blk"),
        *[F.col(c).alias(f"_a_{c}") for c in df.columns],
    )
    b = blocked.select(
        F.col("_blk").alias("_blk2"),
        *[F.col(c).alias(f"_b_{c}") for c in df.columns],
    )
    pairs = a.join(
        b,
        (F.col("_blk") == F.col("_blk2"))
        & (F.col(f"_a_{id_col}") < F.col(f"_b_{id_col}")),
    )
    score: Column = F.lit(0)
    for _name, cond, w_agree, w_disagree in comparators:
        score = score + F.when(
            cond("_a_", "_b_"), F.lit(w_agree)
        ).otherwise(F.lit(w_disagree))
    out = pairs.select(
        F.col(f"_a_{id_col}").alias("id_a"),
        F.col(f"_b_{id_col}").alias("id_b"),
        score.cast("long").alias("score"),
    ).withColumn(
        "match_class",
        F.when(F.col("score") >= link_threshold, F.lit("link"))
        .when(F.col("score") >= possible_threshold, F.lit("possible"))
        .otherwise(F.lit("non_link")),
    )
    if not keep_below_possible:
        out = out.where(F.col("score") >= possible_threshold)
    return out
