"""Shared fixtures: one local SparkSession per test session, DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bicis_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("BICIS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLE_NAMES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="bicis_spark_tests", cores=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same parquet tables registered as views —
    mirrors the driver's oracle setup."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
