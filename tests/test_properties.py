"""Hypothesis property tests (SURVEY.md §5.3): dialect mapping is total
over header case/whitespace permutations; timestamp parse round-trips
formatting; duration parser matches the reference grammar."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bicis_spark.functions.parsing import (
    parse_duration_seconds,
    parse_timestamp_multi,
)
from bicis_spark.operators.unify import FIELDS_V1, normalize_dialect

SETTINGS = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

timestamps = st.datetimes(
    min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 12, 31)
).map(lambda d: d.replace(microsecond=0))


@given(ts=timestamps, fmt_idx=st.integers(0, 2))
@SETTINGS
def test_parse_round_trips_format(spark, ts, fmt_idx):
    """X1∘X3 identity: format then parse restores the timestamp (seconds
    resolution for the minute-format, which truncates)."""
    spark_fmts = ["dd/MM/yyyy HH:mm", "dd/MM/yyyy HH:mm:ss", "yyyy-MM-dd HH:mm:ss.SSSSSS"]
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    out = df.select(
        parse_timestamp_multi(
            F.date_format("ts", spark_fmts[fmt_idx])
        ).alias("parsed")
    ).first()
    expected = ts.replace(second=0) if fmt_idx == 0 else ts
    assert out["parsed"] == expected


@given(h=st.integers(0, 23), m=st.integers(0, 59), s=st.integers(0, 59))
@SETTINGS
def test_duration_hms_grammar(spark, h, m, s):
    df = spark.createDataFrame([(f"{h}H {m}MIN {s}SEG",)], "d string")
    out = df.select(parse_duration_seconds(F.col("d")).alias("secs")).first()
    assert out["secs"] == h * 3600 + m * 60 + s


@given(minutes=st.integers(0, 10_000))
@SETTINGS
def test_duration_integer_means_minutes(spark, minutes):
    df = spark.createDataFrame([(str(minutes),)], "d string")
    out = df.select(parse_duration_seconds(F.col("d")).alias("secs")).first()
    assert out["secs"] == minutes * 60


@given(
    casing=st.lists(st.booleans(), min_size=5, max_size=5),
    pad=st.sampled_from(["", " ", "  "]),
)
@SETTINGS
def test_dialect_mapping_total_over_header_variants(spark, casing, pad):
    """P1: header matching is case/whitespace-insensitive and total —
    any case/pad variant of a known header maps to the canonical column."""
    headers = ["ORIGENFECHA", "NOMBREORIGEN", "DESTINOFECHA", "NOMBREDESTINO", "TIEMPOUSO"]
    varied = [
        (h.lower() if flip else h) + pad for h, flip in zip(headers, casing)
    ]
    row = ("1/2/2011 10:30", "A", "1/2/2011 10:55", "B", "25")
    raw = spark.createDataFrame([row], varied)
    out = normalize_dialect(raw, FIELDS_V1)
    assert set(out.columns) == {"rent_date", "rent_station", "return_date", "return_station"}
    assert out.count() == 1


doc_corpora = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=1, max_size=40).map(" ".join),
    min_size=1,
    max_size=12,
)


@given(texts=doc_corpora, chunk=st.integers(1, 7))
@SETTINGS
def test_chunking_conserves_tokens(spark, texts, chunk):
    """Chunks partition every document's token stream exactly: sizes sum
    to the token count, no chunk exceeds the limit, rebuild == original."""
    from bicis_spark.extensions.curation import chunk_documents

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=chunk).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text in enumerate(texts):
        toks = text.split(" ")
        rs = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        assert sum(r["n_chunk_tokens"] for r in rs) == len(toks)
        assert all(r["n_chunk_tokens"] <= chunk for r in rs)
        assert " ".join(r["chunk_text"] for r in rs) == text


@given(texts=doc_corpora, seq=st.integers(1, 9))
@SETTINGS
def test_packing_offsets_contiguous(spark, texts, seq):
    """Within a shard, each doc starts exactly where the previous ended
    (concat-and-chunk): start/end seqs and offsets are the running token
    cumsum in disguise."""
    from bicis_spark.extensions.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    rows = sorted(pack_sequences(df, seq_tokens=seq).collect(),
                  key=lambda r: (r["shard"], r["doc_id"]))
    cum: dict[str, int] = {}
    for r in rows:
        start = cum.get(r["shard"], 0)
        assert r["start_seq"] == start // seq
        assert r["start_offset"] == start % seq
        end = start + r["n_tokens"]
        assert r["end_seq"] == (end - 1) // seq
        cum[r["shard"]] = end
