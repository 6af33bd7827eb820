"""Market-basket frequent itemsets (pairs and triples) by exact counting.

The relational Apriori core: deduplicate to (basket, item), self-join
within the basket key for size-2 candidates, extend once more for
size-3, count distinct baskets per itemset, filter by minimum support.
No FP-tree, no sampling — candidate generation is bounded by
``(basket_size choose k)``, which for retail-shaped baskets (≤ tens of
items) keeps the blow-up a small constant per basket, and every join is
an equi-join on the basket key (shuffle-partitioned, AQE-skew-safe).
Ordering items (a < b < c) counts each set exactly once.

At 100 TB: the (basket, item) dedup is one map-side-combinable
aggregate; the k=2/k=3 joins co-partition on the basket key so a
basket's candidates are generated within one task's partition; a
pathological mega-basket (a single basket with 10⁵ items) is the one
shape that needs guarding — cap basket size upstream (``max_items``)
exactly as production basket miners do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_items_per_basket: int | None = None,
) -> DataFrame:
    """[kind, item_a, item_b, item_c, support] for all 2- and 3-item
    sets appearing in ≥ ``min_support`` distinct baskets (item_c NULL
    for pairs). ``max_items_per_basket`` drops oversized baskets before
    candidate generation (the mega-basket guard)."""
    b = df.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
    ).distinct()
    if max_items_per_basket is not None:
        sizes = b.groupBy("_bk").agg(F.count(F.lit(1)).alias("_sz"))
        b = b.join(
            sizes.where(F.col("_sz") <= max_items_per_basket).select("_bk"),
            "_bk",
        )
    x = b.select("_bk", F.col("_it").alias("a"))
    y = b.select("_bk", F.col("_it").alias("b"))
    z = b.select("_bk", F.col("_it").alias("c"))
    pair_occ = x.join(y, "_bk").where(F.col("a") < F.col("b"))
    pairs = (
        pair_occ.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
        .select(
            F.lit("pair").alias("kind"),
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.lit(None).cast(pair_occ.schema["b"].dataType).alias("item_c"),
            "support",
        )
    )
    triple_occ = pair_occ.join(z, "_bk").where(F.col("b") < F.col("c"))
    triples = (
        triple_occ.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
        .select(
            F.lit("triple").alias("kind"),
            F.col("a").alias("item_a"),
            F.col("b").alias("item_b"),
            F.col("c").alias("item_c"),
            "support",
        )
    )
    return pairs.unionByName(triples)
