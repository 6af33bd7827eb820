"""BPE (byte-pair encoding) merge training over the document corpus.

The classic subword-vocabulary learner (Sennrich et al. 2016): repeatedly
count adjacent symbol pairs across the corpus, merge the most frequent
pair into a new symbol, repeat. The reference has no tokenizer surface at
all (its text handling stops at pandas CSV parsing); this provides the
training half of the tokenizer stack whose encode half is
extensions/text.py:encode_documents.

Spark-first shape: the corpus state between rounds is a DataFrame of
symbol strings where EVERY symbol carries its own leading and trailing
separator (``\x1fa\x1f\x1fb\x1f``). The wrap matters: with a single
shared separator between symbols, a literal-replace merge consumes the
boundary of the next occurrence and silently skips consecutive pairs
("abab" would merge only one "ab"). Fully-wrapped symbols make each
pair occurrence ``\x1fl\x1f\x1fr\x1f`` — disjoint by construction, so
greedy leftmost replace merges them all. Each round is
  1. one map-only explode of adjacent symbol pairs,
  2. one pair-count aggregation (map-side combine; pairs are tiny),
  3. a driver-side top-1 collect (the learned merge — model state, like
     the IVF centroid and OLS coefficient precedents),
  4. one map-only literal `replace` applying the merge corpus-wide.
Greedy leftmost-nonoverlapping `replace` IS the BPE merge semantics, and
Spark and DuckDB agree on it bitwise (both scan left to right, resuming
after each match — verified: 'XaXaXaX' -> 'XaaXaX').

The driver loop materializes each round's corpus and unpersists the
previous one, so the lineage never re-executes earlier rounds (same
pattern as operators/graph.py:pagerank_fixed_point). Determinism: pair
counts are exact ints; ties broken by (left, right) binary ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bicis_spark.sources.io import local_frame
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: never appears in corpus text


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    sep: str = SEP,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    [round, merge_left, merge_right, pair_count] — the trained vocab in
    merge order. Symbols start as single characters over the whole doc
    (word-boundary-aware variants would pre-split on spaces first)."""
    spark = df.sparkSession
    t = F.col(text_col)
    cur = (
        df.where(t.isNotNull() & (F.length(t) > 0))
        .select(
            id_col,
            F.regexp_replace(t, "(?s)(.)", sep + "$1" + sep).alias("s"),
        )
        .persist()
    )
    cur.count()

    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        arr = F.filter(F.split(F.col("s"), sep), lambda x: x != F.lit(""))
        n = F.size(arr)
        pairs = cur.select(
            F.explode(
                F.zip_with(
                    F.slice(arr, F.lit(1), n - F.lit(1)),
                    F.slice(arr, F.lit(2), n - F.lit(1)),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy(
                F.col("p.l").alias("l"), F.col("p.r").alias("r")
            )
            .agg(F.count("*").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((rnd, l, r, c))
        nxt = cur.select(
            id_col,
            F.replace(
                F.col("s"),
                F.lit(sep + l + sep + sep + r + sep),
                F.lit(sep + l + r + sep),
            ).alias("s"),
        ).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()

    return local_frame(spark, 
        merges,
        "round long, merge_left string, merge_right string, pair_count long",
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = SEP,
) -> DataFrame:
    """Apply a trained merge list (from :func:`bpe_train`) to tokenize
    each document; returns [id, tokens array<string>]. The apply side of
    the tokenizer loop: K chained literal replaces, entirely map-only
    column expressions — at 100 TB the corpus is tokenized in one
    shuffle-free pass with the merge table folded into the plan as
    literals (it's model state, K rows)."""
    t = F.col(text_col)
    s = F.regexp_replace(t, "(?s)(.)", sep + "$1" + sep)
    for l, r in merges:
        s = F.replace(s, F.lit(sep + l + sep + sep + r + sep), F.lit(sep + l + r + sep))
    return df.where(t.isNotNull() & (F.length(t) > 0)).select(
        id_col,
        F.filter(F.split(s, sep), lambda x: x != F.lit("")).alias("tokens"),
    )
