"""Deterministic sampling operators for training-data curation.

Large-scale pipelines sample by CONTENT HASH, never by RNG: the decision
for a document is reproducible across runs, machines, and engines, and
survives repartitioning (rand()-based sampling is none of these). Rates
compose with strata (language, quality band, source) so a curation run can
say "keep 50% of English, 10% of everything else" or "cap every language
at K documents" and get the same corpus every time.

Both operators are pure column expressions / window functions — no RNG, no
UDF, one shuffle at most.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bicis_spark.extensions.dedup import MINHASH_P, poly_hash


def hash_sample_col(text: Column, buckets: int = 1000) -> Column:
    """Deterministic per-document sample bucket in [0, buckets): the
    oracle-replayable polynomial content hash mod buckets. A document's
    bucket never changes, so rate changes only grow/shrink the kept set
    monotonically (the classic hash-sampling property)."""
    return poly_hash(text) % F.lit(buckets)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    text_col: str = "text",
    default_rate: int = 0,
    buckets: int = 1000,
) -> DataFrame:
    """Keep each row iff its content-hash bucket < the stratum's rate
    (per-mille by default). ``rates`` maps stratum value → kept buckets;
    unlisted strata get ``default_rate``."""
    rate = None
    for value, r in sorted(rates.items()):
        cond = F.col(strata_col) == value
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    return df.where(hash_sample_col(F.col(text_col), buckets) < rate)


def quota_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    order_cols: list[Column],
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap each group at ``quota`` rows, keeping the best by ``order_cols``
    (ties broken on ``id_col`` — fully deterministic). One window shuffle
    keyed by the group column; per-group state is the top-``quota`` heap."""
    w = Window.partitionBy(group_col).orderBy(*order_cols, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )
