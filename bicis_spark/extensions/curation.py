"""Training-corpus curation operators beyond dedup/sampling: benchmark
decontamination, PII detection/redaction, intra-document repetition
metrics (Gopher-style quality rules), fixed-token chunking, and
concat-and-chunk sequence packing.

Scale design notes (100 TB corpus, 1000 executors):

- **Decontamination** is a semi-join of the corpus against the *benchmark*
  shingle set. Benchmarks are tiny relative to the corpus (millions of
  n-grams vs trillions), so the eval shingles are hashed to 64-bit keys
  and broadcast: the corpus is scanned once, never shuffled. This is the
  standard 13-gram eval-overlap filter (GPT-3 appendix C shape).
- **PII** and **repetition** are pure per-row column expressions — map-only,
  no shuffle, whole-stage codegen. The repetition metrics deliberately
  avoid explode+groupBy (which would shuffle one row per token): top-token
  frequency is an array-fold over the distinct tokens of the row.
- **Chunking** is a per-row explode (map-only, output rows ∝ tokens /
  chunk_size). **Packing** needs a running token offset, which is the one
  genuinely order-dependent op here: it windows *within a shard column*
  (source, crawl, file) so the shuffle is one exchange keyed by shard and
  no global total order is ever materialized — the classic two-pass
  distributed prefix-sum shape with the shard as the outer pass.

Determinism: counts and offsets are exact integers; every ratio is an
exact-int / exact-int double division; no RNG anywhere. All expressions
have DuckDB twins so every operator is oracle-gated bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bicis_spark.extensions.text import tokens

# Conservative, RE2-and-Java-compatible PII patterns (kept deliberately
# simple: the point is the plumbing — swap in hardened patterns per
# deployment).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+1-555-[0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def word_ngrams(toks: Column, n: int) -> Column:
    """All (overlapping, order-preserving, non-distinct) n-word grams."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """[doc_id, n_overlap]: corpus documents sharing >= 1 distinct n-gram
    with ANY benchmark document, with the count of distinct overlapping
    n-grams (the eval-overlap contamination signal).

    The benchmark side collapses to its distinct 64-bit n-gram hashes and
    is broadcast; the corpus explodes its distinct n-gram hashes and
    probes the broadcast table — corpus rows are never shuffled. 64-bit
    xxhash64 keys make a false contamination flag a ~2^-64-per-pair event
    (no exact-verify pass needed at any realistic benchmark size).
    """
    bench_grams = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))
            ).alias("g")
        )
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    # round-robin the corpus before the explode: locally the whole table is
    # one parquet split, so the (expensive) per-row gram construction would
    # run in a single task; on a cluster the scan already yields many
    # splits and AQE coalesces this exchange away
    corpus_grams = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(tokens(F.col(text_col)), n))).alias(
            "g"
        ),
    ).select(F.col(id_col), F.xxhash64("g").alias("gh"))
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def pii_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts plus the fully redacted text (each
    pattern class replaced by its <CLASS> tag). Map-only column
    expressions; redaction order is fixed (email, phone, ipv4) so output
    is deterministic even for overlapping matches."""
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    red = t
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select(F.col(id_col), *counts, red.alias("redacted_text"))


# C4 line-retention rules (Raffel et al. 2020, §2.2 — public heuristics):
# a line survives iff it ends in terminal punctuation, has >= 5 words,
# and mentions none of the boilerplate markers.
_C4_TERMINALS = (".", "!", "?", '"')
_C4_MIN_LINE_WORDS = 5
_C4_BAD_MARKERS = ("javascript", "lorem ipsum")


def _c4_line_keep(x: Column) -> Column:
    ends_ok = F.lit(False)
    for term in _C4_TERMINALS:
        ends_ok = ends_ok | x.endswith(term)
    keep = ends_ok & (F.size(F.split(x, " ", -1)) >= _C4_MIN_LINE_WORDS)
    low = F.lower(x)
    for marker in _C4_BAD_MARKERS:
        keep = keep & ~low.contains(marker)
    return keep & ~x.contains("{")


def c4_line_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): drop lines
    that don't end in terminal punctuation, have < 5 words, or carry
    boilerplate markers ('javascript', 'lorem ipsum', '{'), then keep the
    document only if the surviving text still has >= 3 sentences (counted
    as terminal-punctuation characters — the deterministic stand-in for a
    sentence splitter).

    Returns the cleaned text alongside the line/sentence bookkeeping so
    the hash gate covers the actual transformation output, not just
    flags. Map-only column expressions (array filter + array_join) — one
    scan, zero shuffles, linear scale-out; the span-level 3-sentence
    dedup half of C4 lives in `span_dedup`.
    """
    t = F.col(text_col)
    lines = F.split(t, "\n", -1)
    kept = F.filter(lines, _c4_line_keep)
    cleaned = F.array_join(kept, "\n")
    n_sentences = (
        F.length(cleaned)
        - F.length(F.replace(cleaned, F.lit("."), F.lit("")))
        + F.length(cleaned)
        - F.length(F.replace(cleaned, F.lit("!"), F.lit("")))
        + F.length(cleaned)
        - F.length(F.replace(cleaned, F.lit("?"), F.lit("")))
    ).cast("long")
    n_kept = F.size(kept).cast("long")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        ((n_kept >= 1) & (n_sentences >= 3)).alias("keep"),
        cleaned.alias("cleaned_text"),
    )


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate n-gram
    fractions (n=2,3) and the top single-token frequency fraction.

    Shuffle-free by construction: top-token frequency folds over the
    row's DISTINCT tokens (O(unique x tokens) per row, trivially
    vectorized) instead of explode -> groupBy, which would shuffle one
    row per token across the cluster.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")

    def dup_frac(n: int) -> Column:
        grams = word_ngrams(toks, n)
        total = F.size(grams).cast("long")
        dups = total - F.size(F.array_distinct(grams)).cast("long")
        return F.when(total > 0, dups.cast("double") / total.cast("double")).otherwise(
            F.lit(0.0)
        )

    top_cnt = F.aggregate(
        F.array_distinct(toks),
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(
            acc, F.size(F.filter(toks, lambda t: t == x)).cast("long")
        ),
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        dup_frac(2).alias("dup_bigram_frac"),
        dup_frac(3).alias("dup_trigram_frac"),
        top_cnt.alias("top_token_count"),
        (top_cnt.cast("double") / n_tok.cast("double")).alias("top_token_frac"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """[doc_id, chunk_id, n_chunk_tokens, chunk_text]: split every document
    into consecutive fixed-token-count windows (context-length chunking).
    Map-only explode; chunks partition the token stream exactly (no
    overlap, no loss). Null-text documents emit zero chunks — without the
    filter, size(null)=-1 (legacy sizeOfNull) makes n_chunks=-1 and
    F.sequence(0,-1) DESCENDS, emitting two bogus rows per null doc."""
    toks = tokens(F.col(text_col))
    df = df.where(F.col(text_col).isNotNull() & (F.size(toks) > 0))
    n_chunks = F.floor((F.size(toks) - 1) / F.lit(chunk_tokens)).cast("long")
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("_n"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("chunk_id"),
        toks.alias("_toks"),
    ).select(
        F.col(id_col),
        F.col("chunk_id"),
        F.least(
            F.lit(chunk_tokens).cast("long"),
            F.col("_n") - F.col("chunk_id") * F.lit(chunk_tokens),
        ).alias("n_chunk_tokens"),
        F.array_join(
            F.slice(
                F.col("_toks"),
                (F.col("chunk_id") * F.lit(chunk_tokens) + 1).cast("int"),
                chunk_tokens,
            ),
            " ",
        ).alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    seq_tokens: int,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each shard, documents are
    concatenated in id order and cut into fixed ``seq_tokens`` training
    sequences. Emits, per document, where its tokens land:
    [doc_id, shard, n_tokens, start_seq, start_offset, end_seq].

    One window shuffle keyed by the shard column — no global ordering is
    ever needed, so shards pack independently and in parallel (exactly how
    a 100 TB tokenize-and-pack job shards by input file).

    Null-text documents are dropped: size(null)=-1 would otherwise shift
    every later document's running offset within the shard."""
    toks = tokens(F.col(text_col))
    w = Window.partitionBy("shard").orderBy(id_col)
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(shard_col).alias("shard"),
        F.greatest(F.size(toks), F.lit(0)).cast("long").alias("n_tokens"),
    )
    cum = base.withColumn("_end", F.sum("n_tokens").over(w))
    start = F.col("_end") - F.col("n_tokens")
    return cum.select(
        F.col(id_col),
        F.col("shard"),
        F.col("n_tokens"),
        F.floor(start / F.lit(seq_tokens)).cast("long").alias("start_seq"),
        F.pmod(start, F.lit(seq_tokens)).cast("long").alias("start_offset"),
        F.floor((F.col("_end") - 1) / F.lit(seq_tokens))
        .cast("long")
        .alias("end_seq"),
    )


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 10,
) -> DataFrame:
    """C4-style duplicated-span removal (Raffel et al. 2020 drop repeated
    three-sentence spans; RefinedWeb dedups lines): split each document
    into non-overlapping ``span_tokens``-token spans, keep only the FIRST
    corpus-wide occurrence of each span (first = smallest (doc_id,
    position)), and rebuild the document from its surviving spans.

    Output: [doc_id, n_spans, n_kept, deduped_text].

    Determinism: the keeper choice is a pure min over (doc_id, pos) —
    no RNG, stable under retries and repartitioning.

    Scale: spans are generated executor-side (sequence + slice of the
    token array — no explode of one row per token). The first-occurrence
    owner is a hash AGGREGATE keyed by the span's 128-bit fingerprint
    (map-side combined — a boilerplate span repeated 10⁹ times collapses
    per-task before the exchange; the window-ranking formulation would
    sort that span's entire group in one task), joined back to mark
    keepers; AQE skew-split covers the join side. The shuffle carries
    16-byte fingerprints, never span text; rebuilt text aggregates
    per-document (bounded by document size).
    """
    from bicis_spark.extensions.dedup import fingerprint_cols

    t = F.col(text_col)
    base = df.where(t.isNotNull() & (F.length(t) > 0))
    toks = tokens(t)
    n_spans_expr = F.ceil(F.size(toks).cast("double") / F.lit(float(span_tokens))).cast(
        "int"
    )
    span_structs = F.transform(
        F.sequence(F.lit(0), n_spans_expr - 1),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.concat_ws(
                " ", F.slice(toks, i * span_tokens + 1, span_tokens)
            ).alias("span"),
        ),
    )
    spans = base.select(id_col, F.explode(span_structs).alias("_s")).select(
        id_col, F.col("_s.pos").alias("pos"), F.col("_s.span").alias("span")
    )
    fps = fingerprint_cols(["span"])
    keyed = spans.select(id_col, "pos", "span", *fps)
    firsts = keyed.groupBy("_fp1", "_fp2").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_first")
    )
    marked = keyed.join(firsts, ["_fp1", "_fp2"]).withColumn(
        "_keep",
        (F.col(id_col) == F.col("_first").getField(id_col))
        & (F.col("pos") == F.col("_first.pos")),
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.when(F.col("_keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct(F.col("pos"), F.col("span")))
                    )
                ),
                lambda x: x["span"],
            ),
        ).alias("deduped_text"),
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty vs everything EARLIER in the corpus
    (memorization/novelty audit): for each doc, the share of its distinct
    word n-grams whose first owner (minimum doc id containing the gram)
    is an earlier document. Curation pipelines drop or down-weight
    low-novelty documents — near-copies that sail under the pairwise
    dedup thresholds but add no new n-grams.

    Output: [id, n_grams (distinct), n_seen (first seen earlier),
    novelty = 1 - n_seen/n_grams] — docs with fewer than n words emit
    n_grams = 0 and NULL novelty.

    Scale: explode → per-doc DISTINCT gram (map-side combinable agg) →
    gram-keyed min-owner agg (partial combine collapses each gram to one
    row per task before the exchange) → join back on the gram key → one
    per-doc agg. Nothing ever pairs documents; the widest shuffle is the
    distinct gram set. At 100 TB swap the gram STRING for its 128-bit
    fingerprint as the join/agg key (extensions/dedup.fingerprint_cols)
    — the string key is declared here because the SQL oracle replays it
    verbatim."""
    # Gram construction: posexplode tokens + lead() windows, NOT the
    # word_ngrams higher-order transform — array_join(slice) per element
    # is O(len·n) char copying per gram and Catalyst re-inlines the
    # token-split into the lambda (projection collapse), measured 5.3s vs
    # 1.5s at sf0.1 for the same 260k grams. The window is keyed by doc
    # and bounded by doc length.
    toks = df.where(
        F.col(text_col).isNotNull() & (F.length(F.col(text_col)) > 0)
    ).select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
        ).alias("_p", "_t"),
    )
    if n > 1:
        w = Window.partitionBy("_id").orderBy("_p")
        lead_cols = [F.lead("_t", k).over(w) for k in range(1, n)]
        grams = toks.select(
            "_id",
            F.concat_ws(" ", F.col("_t"), *lead_cols).alias("_g"),
            lead_cols[-1].alias("_full"),
        ).where(F.col("_full").isNotNull())
    else:
        grams = toks.select("_id", F.col("_t").alias("_g"))
    # 128-bit fingerprint as the distinct/agg/join key: 16 bytes per gram
    # through every exchange instead of the gram string (the engine's
    # standard exact-dedup discipline, extensions/dedup.fingerprint_cols);
    # the oracle groups the strings themselves, so the hash gate also
    # certifies the fingerprint grouping is collision-free on this corpus
    doc_grams = (
        grams.select(
            "_id",
            F.xxhash64(F.lit(1), F.col("_g")).alias("_fp1"),
            F.xxhash64(F.lit(2), F.col("_g")).alias("_fp2"),
        )
        .distinct()
    )
    first_owner = doc_grams.groupBy("_fp1", "_fp2").agg(
        F.min("_id").alias("_first")
    )
    per_doc = (
        doc_grams.join(first_owner, ["_fp1", "_fp2"])
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("_first") < F.col("_id")).cast("long"))
            .cast("long")
            .alias("n_seen"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_seen"), F.lit(0)).cast("long").alias("n_seen"),
            F.when(
                F.col("n_grams") > 0,
                F.lit(1.0)
                - F.col("n_seen").cast("double") / F.col("n_grams").cast("double"),
            ).alias("novelty"),
        )
    )


def packing_efficiency(
    df: DataFrame,
    seq_tokens: int,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard packing report for ``pack_sequences``: how many fixed-
    length training sequences each shard yields and how full the last
    (ragged) one is — the number a tokenize-and-pack job reports so the
    training run can size its dataloader and account for padding waste.

    Output per shard: [shard, n_docs, n_tokens, n_seqs, tail_fill,
    utilization] where n_seqs = ceil(n_tokens / L), tail_fill is the
    token count of the final partial sequence (0 when it divides
    exactly), and utilization = n_tokens / (n_seqs·L). One map-side-
    combined aggregate keyed by shard — no window, no doc ordering
    needed (totals are order-invariant even though placement isn't)."""
    toks = tokens(F.col(text_col))
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(shard_col).alias("shard"),
        F.greatest(F.size(toks), F.lit(0)).cast("long").alias("n_tokens"),
    )
    agg = base.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    n_seqs = F.ceil(F.col("n_tokens") / F.lit(seq_tokens)).cast("long")
    return agg.select(
        "shard",
        "n_docs",
        "n_tokens",
        n_seqs.alias("n_seqs"),
        F.when(
            F.col("n_tokens") % seq_tokens == 0, F.lit(0).cast("long")
        )
        .otherwise((F.col("n_tokens") % seq_tokens).cast("long"))
        .alias("tail_fill"),
        (
            F.col("n_tokens").cast("double")
            / (n_seqs * F.lit(seq_tokens)).cast("double")
        ).alias("utilization"),
    )


def domain_cap_sample(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "domcap",
) -> DataFrame:
    """Per-domain document cap (RefinedWeb / Penedo et al. 2023 §3.1 cap
    over-represented hosts; FineWeb applies the same rule per domain):
    keep at most ``cap`` documents from each ``domain_col`` value, chosen
    by a deterministic hash lottery — priority = md5(salt:id) ascending,
    ties broken on the id — so the kept subset is a uniform pseudo-random
    sample that is identical across runs, retries, and engines (no RNG
    state, the repo's standard md5 discipline).

    Plan (the 100 TB shape): the naive ``row_number() OVER (PARTITION BY
    domain)`` sorts every document of a hot domain in ONE task — exactly
    the skew this operator exists to correct (a 10⁹-page domain would pin
    a single sort). Instead the cap rides the skew-bounded two-phase
    hash-agg top-k (operators/topk.py): both shuffles move at most
    ``n_salts·cap`` 16-byte-priority structs per domain regardless of
    domain size, so the hottest domain costs the same as the coldest.

    Output: one row per KEPT document — [domain, sample_rank (1-based
    lottery order), id] — the manifest downstream mixing joins against.
    """
    from bicis_spark.operators.topk import topk_by_group_agg

    pri = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    ).alias("_pri")
    base = df.select(F.col(domain_col), F.col(id_col), pri)
    kept = topk_by_group_agg(
        base,
        group_cols=[domain_col],
        order_col="_pri",
        tiebreak_col=id_col,
        k=cap,
        payload_cols=[id_col],
        descending=False,
    )
    return kept.select(
        domain_col,
        F.col("rank_in_group").alias("sample_rank"),
        id_col,
    )


def exact_substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_span_tokens: int = 10,
) -> DataFrame:
    """Exact-substring duplicate spans, Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499) —
    UNALIGNED maximal duplicated substrings, the cross-document exact
    dedup their suffix-array ExactSubstr finds, re-expressed with the
    standard k-gram-anchor construction instead of a distributed suffix
    array: a token position is COVERED when its k-gram occurs ≥ 2 times
    corpus-wide (multiplicity counted over all positions, same-document
    repeats included); maximal runs of consecutive covered positions are
    the duplicated spans (a true duplicated substring of length L ≥ k
    covers all its L−k+1 anchors; a covered run can splice overlapping
    duplicates with different partners — the documented, standard
    approximation, upper-bounding ExactSubstr's spans).

    Output: [doc_id, start_tok (0-based), n_span_tokens, span_text] for
    spans of ≥ ``min_span_tokens`` tokens.

    Unlike ``span_dedup`` (C4-style FIXED non-overlapping windows), the
    spans here are unaligned and maximal — a duplicated paragraph
    shifted by one token still matches in full.

    Scale: gram anchors are built array-side (sequence + slice, no
    per-token explode before hashing) and the shuffle carries (16-byte
    gram fingerprint, doc, pos) rows — linear in corpus tokens; the
    duplicate-gram aggregate is map-side combined (a boilerplate gram
    repeated 10⁹ times collapses per task); islands are one per-document
    window over covered positions only. The oracle groups by gram TEXT
    where the engine groups by the 128-bit fingerprint — identical
    partitions at any realistic corpus size (collision odds ~2⁻¹²⁸, the
    ``exact_dedup`` precedent)."""
    t = F.col(text_col)
    toks = tokens(t)
    base = df.where(
        t.isNotNull() & (F.size(tokens(t)) >= F.lit(k))
    ).select(F.col(id_col), toks.alias("_toks"))
    gram_structs = F.transform(
        F.sequence(F.lit(0), F.size(F.col("_toks")) - k),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            F.xxhash64(F.lit(1), F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k))).alias("_g1"),
            F.xxhash64(F.lit(2), F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, k))).alias("_g2"),
        ),
    )
    grams = base.select(id_col, F.explode(gram_structs).alias("_s")).select(
        id_col,
        F.col("_s.pos").alias("pos"),
        F.col("_s._g1").alias("_g1"),
        F.col("_s._g2").alias("_g2"),
    )
    dup = (
        grams.groupBy("_g1", "_g2")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("_g1", "_g2")
    )
    covered = grams.join(dup, ["_g1", "_g2"], "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        covered.withColumn("_rn", F.row_number().over(w))
        .groupBy(id_col, (F.col("pos") - F.col("_rn")).alias("_isl"))
        .agg(F.min("pos").alias("start_tok"), F.max("pos").alias("_end"))
        .select(
            id_col,
            "start_tok",
            (F.col("_end") - F.col("start_tok") + F.lit(k)).cast("long").alias(
                "n_span_tokens"
            ),
        )
        .where(F.col("n_span_tokens") >= min_span_tokens)
    )
    return islands.join(base, id_col).select(
        id_col,
        "start_tok",
        "n_span_tokens",
        F.concat_ws(
            " ",
            F.slice(
                F.col("_toks"),
                (F.col("start_tok") + 1).cast("int"),
                F.col("n_span_tokens").cast("int"),
            ),
        ).alias("span_text"),
    )
