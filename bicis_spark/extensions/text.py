"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting — all pure column expressions (JVM-side, zero UDFs),
so they vectorize through whole-stage codegen and scale linearly with no
shuffle (per-row map only).

Determinism: every metric is integer arithmetic or a division of two exact
integers, so results are bitwise-reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_MOD = 2_147_483_647  # 2^31 - 1; keeps acc*31 + char within int64

# tiny marker vocabularies for the n-gram/stopword language heuristic —
# deterministic and oracle-expressible; real lang-id would plug in here.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow", "small", "big"),
    "es": ("data", "table", "row", "column", "query"),
    "zh": ("spark", "stream", "batch", "window", "vector"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on single spaces — the corpus is
    single-space separated; swap the pattern for `\\s+` on real data)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def char_fingerprint(text: Column) -> Column:
    """Deterministic rolling polynomial hash over characters:
    acc = (acc*31 + codepoint) mod (2^31-1). A content fingerprint usable
    for exact-dup bucketing and incremental re-crawl detection."""
    chars = F.regexp_extract_all(text, F.lit("(.)"), 1)
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(FP_MOD),
    )


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality signals: length, token stats, stopword ratio.

    All ratios are exact-int/exact-int double divisions.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(t).cast("long")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("long")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        ((n_chars - n_tok + F.lit(1)).cast("double") / n_tok.cast("double")).alias(
            "avg_token_len"
        ),
        (n_stop.cast("double") / n_tok.cast("double")).alias("stopword_ratio"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double")
        ).alias("unique_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-vocabulary language scoring with a deterministic argmax
    (ties break toward the earlier language in LANG_MARKERS order)."""
    toks = tokens(F.col(text_col))

    def marker_filter(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_filter(markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    s_en, s_es, s_zh = scores["en"], scores["es"], scores["zh"]
    predicted = (
        F.when((s_en >= s_es) & (s_en >= s_zh), F.lit("en"))
        .when(s_es >= s_zh, F.lit("es"))
        .otherwise(F.lit("zh"))
    )
    return df.select(
        F.col(id_col),
        s_en.alias("score_en"),
        s_es.alias("score_es"),
        s_zh.alias("score_zh"),
        predicted.alias("predicted_lang"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), char_fingerprint(F.col(text_col)).alias("fingerprint"))
