"""Unit tests for the curation operators (decontamination, PII,
repetition, chunking, packing) on crafted fixtures — behavioral contracts
beyond the oracle queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bicis_spark.extensions.curation import (
    chunk_documents,
    decontaminate,
    pack_sequences,
    pii_metrics,
    repetition_metrics,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "s0"),
            (2, "one two three four five six seven", "s0"),
            (3, "alpha beta gamma delta other words here", "s0"),
            (4, "totally unrelated text with no overlap at all", "s1"),
        ],
        "doc_id long, text string, source string",
    )


def test_decontaminate_flags_only_overlapping_docs(spark, corpus):
    bench = spark.createDataFrame(
        [(100, "xx alpha beta gamma delta yy", "b")],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: r["n_overlap"] for r in decontaminate(corpus, bench, n=4).collect()}
    # docs 1 and 3 share the 4-gram "alpha beta gamma delta"; 2 and 4 don't
    assert got == {1: 1, 3: 1}


def test_pii_metrics_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@x.example.com or sue@y.example.org thanks"),
            (2, "server 192.168.1.10 then call +1-555-0199"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_metrics(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (2, 0, 0)
    assert rows[1]["redacted_text"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert (rows[2]["n_email"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (0, 1, 1)
    assert rows[2]["redacted_text"] == "server <IPV4> then call <PHONE>"
    assert rows[3]["redacted_text"] == "nothing sensitive here"


def test_repetition_metrics_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a b a b a")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    # "a a a a": 3 bigrams all "a a" -> 2/3 dup; top token 4/4
    assert rows[1]["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert rows[1]["dup_trigram_frac"] == pytest.approx(1 / 2)
    assert (rows[1]["top_token_count"], rows[1]["top_token_frac"]) == (4, 1.0)
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["top_token_frac"] == pytest.approx(1 / 4)
    # "a b a b a": bigrams [ab, ba, ab, ba] -> 2 dups of 4
    assert rows[3]["dup_bigram_frac"] == pytest.approx(1 / 2)
    assert (rows[3]["top_token_count"], rows[3]["n_tokens"]) == (3, 5)


def test_chunks_partition_tokens_exactly(spark, corpus):
    chunks = chunk_documents(corpus, chunk_tokens=3)
    # reassembling chunks in order reproduces every document verbatim
    back = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_id", "chunk_text"))
                ).getField("chunk_text"),
                " ",
            ).alias("rebuilt"),
            F.sum("n_chunk_tokens").alias("n"),
        )
        .join(corpus, "doc_id")
    )
    bad = back.where(
        (F.col("rebuilt") != F.col("text"))
        | (F.col("n") != F.size(F.split("text", " ")))
    )
    assert bad.count() == 0
    # chunk sizes: all == 3 except possibly the last chunk per doc
    sizes = chunks.groupBy("doc_id").agg(
        F.max("chunk_id").alias("last"),
        F.min("n_chunk_tokens").alias("mn"),
        F.max("n_chunk_tokens").alias("mx"),
    )
    assert sizes.where(F.col("mx") > 3).count() == 0


def test_null_text_emits_no_chunks_and_no_offset_shift(spark):
    """size(null) = -1 hazard (r2 ADVICE): a null-text doc must emit ZERO
    chunk rows (not two bogus descending-sequence rows) and must not shift
    later documents' packing offsets within its shard."""
    df = spark.createDataFrame(
        [(1, "a b c d", "s0"), (2, None, "s0"), (3, "e f g h", "s0")],
        "doc_id long, text string, source string",
    )
    chunks = chunk_documents(df, chunk_tokens=3)
    assert chunks.where(F.col("doc_id") == 2).count() == 0
    assert chunks.where(F.col("n_chunk_tokens") <= 0).count() == 0

    packed = {r["doc_id"]: r for r in pack_sequences(df, seq_tokens=4).collect()}
    assert 2 not in packed  # dropped, not emitted with n_tokens=-1
    # doc 3 starts exactly where doc 1 ended (4 tokens → seq 1, offset 0)
    assert (packed[3]["start_seq"], packed[3]["start_offset"]) == (1, 0)


def test_pack_sequences_offsets_contiguous(spark, corpus):
    out = {r["doc_id"]: r for r in pack_sequences(corpus, seq_tokens=8).collect()}
    # s0 docs in id order: 6, 7, 7 tokens -> starts at 0, 6, 13; s1: 8 tokens at 0
    assert (out[1]["start_seq"], out[1]["start_offset"], out[1]["end_seq"]) == (0, 0, 0)
    assert (out[2]["start_seq"], out[2]["start_offset"], out[2]["end_seq"]) == (0, 6, 1)
    assert (out[3]["start_seq"], out[3]["start_offset"], out[3]["end_seq"]) == (1, 5, 2)
    assert (out[4]["start_seq"], out[4]["start_offset"], out[4]["end_seq"]) == (0, 0, 0)
    assert out[4]["shard"] == "s1"


def test_vocab_stats_and_tfidf(spark):
    from bicis_spark.extensions.text import tfidf_top_terms, vocab_stats

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry"), (3, "cherry cherry date")],
        "doc_id long, text string",
    )
    vocab = {r["token"]: (r["tf"], r["df"]) for r in vocab_stats(df).collect()}
    assert vocab == {
        "apple": (3, 2),
        "banana": (1, 1),
        "cherry": (3, 2),
        "date": (1, 1),
    }
    top = tfidf_top_terms(df, k=1).collect()
    best = {r["doc_id"]: (r["token"], r["score"]) for r in top}
    # doc1: banana tf_d=1 df=1 -> 3.0; apple tf_d=2 df=2 -> 3.0; tie -> 'apple' first
    assert best[1] == ("apple", 3.0)
    assert best[2][0] == "cherry" or best[2][0] == "apple"
    # doc3: cherry 2*3/2=3.0 ties date 1*3/1=3.0 -> 'cherry' on token order
    assert best[3] == ("cherry", 3.0)


def test_ngram_novelty_flags_near_copies(spark):
    """A verbatim near-copy (same text + one new sentence) must score low
    novelty; the original and an unrelated doc score 1.0; a short doc
    (< n words) gets NULL novelty and zero grams."""
    from bicis_spark.extensions.curation import ngram_novelty

    a = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, a),
        (2, a + " with one extra closing clause"),
        (3, "completely different content about spark partitions"),
        (4, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert got[1]["novelty"] == 1.0 and got[1]["n_seen"] == 0
    # doc 2 shares all of doc 1's grams; only grams crossing into the new
    # clause are novel
    assert got[2]["n_seen"] > 0 and got[2]["novelty"] < 0.5
    assert got[3]["novelty"] == 1.0
    assert got[4]["n_grams"] == 0 and got[4]["novelty"] is None


def test_domain_cap_sample_caps_and_is_deterministic(spark):
    """No domain exceeds the cap; under-cap domains keep everything;
    ranks are 1..n_kept; and the lottery is stable across runs."""
    from bicis_spark.extensions.curation import domain_cap_sample

    rows = [(i, "big" if i < 40 else "small") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = domain_cap_sample(df, cap=10, domain_col="source").collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["big"]) == 10  # capped
    assert len(by_src["small"]) == 10  # under cap: all kept
    for src, kept in by_src.items():
        assert sorted(r["sample_rank"] for r in kept) == list(
            range(1, len(kept) + 1)
        )
    again = domain_cap_sample(df, cap=10, domain_col="source").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
