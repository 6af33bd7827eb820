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
