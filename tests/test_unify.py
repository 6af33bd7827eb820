"""Ingest/unify golden tests on dialect CSV fixtures (FIXTURES.md §1):
header case/whitespace, unmapped-column pruning, multi-format timestamps,
duration parsing (int-minutes vs "xH yMIN zSEG"), return_date derivation,
invalid-row dropping, deterministic dense ids."""

from __future__ import annotations

import datetime as dt

import pytest

from bicis_spark.operators.unify import (
    FIELDS_V1,
    FIELDS_V4,
    normalize_dialect,
    unify,
    unify_csv_files,
)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("raw")
    # v1 dialect (2011): full columns, mixed date formats, stray header case
    (d / "recorridos-realizados-2011.csv").write_text(
        "ORIGENFECHA;NOMBREORIGEN;DESTINOFECHA;NOMBREDESTINO;TIEMPOUSO;EXTRA\n"
        "1/2/2011 10:30;RETIRO;1/2/2011 10:55;JOSE MARMOL;25;junk\n"
        "02/02/2011 11:00:30;RETIRO;2/2/2011 11:20;RETIRO;0H 19MIN 30SEG;junk\n"
        "bad-date;RETIRO;2/2/2011 12:00;RETIRO;10;junk\n"
    )
    # v4 dialect (2015): no return date column — derived from duration
    (d / "recorridos-realizados-2015.csv").write_text(
        "FECHA_HORA_RETIRO;NOMBRE_ORIGEN;NOMBRE_DESTINO;TIEMPO_USO\n"
        "2015-03-01 08:00:00.000000;PACIFICO;RETIRO;32\n"
        "2015-03-01 09:00:00.000000;PACIFICO;RETIRO;0H 5MIN 0SEG\n"
        "2015-03-01 10:00:00.000000;PACIFICO;RETIRO;bad\n"
    )
    # unknown year: must be skipped entirely
    (d / "recorridos-realizados-1999.csv").write_text(
        "FECHA_HORA_RETIRO;NOMBRE_ORIGEN;NOMBRE_DESTINO;TIEMPO_USO\n"
        "2015-03-01 08:00:00.000000;X;Y;5\n"
    )
    return d


def test_unify_end_to_end(spark, csv_dir):
    files = {
        2011: str(csv_dir / "recorridos-realizados-2011.csv"),
        2015: str(csv_dir / "recorridos-realizados-2015.csv"),
        1999: str(csv_dir / "recorridos-realizados-1999.csv"),
    }
    out = unify_csv_files(spark, files).orderBy("id")
    rows = out.collect()

    # 2011: 2 valid rows (bad-date dropped); 2015: 2 valid (bad duration ⇒
    # no return_date ⇒ dropped); 1999 skipped
    assert [r["id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["rent_station"] == "RETIRO"
    assert rows[0]["rent_date"] == dt.datetime(2011, 2, 1, 10, 30)
    assert rows[0]["return_date"] == dt.datetime(2011, 2, 1, 10, 55)
    # seconds format parsed
    assert rows[1]["rent_date"] == dt.datetime(2011, 2, 2, 11, 0, 30)
    # v4: return_date = rent + 32 minutes
    assert rows[2]["rent_date"] == dt.datetime(2015, 3, 1, 8, 0)
    assert rows[2]["return_date"] == dt.datetime(2015, 3, 1, 8, 32)
    # v4 hms duration: 5 minutes
    assert rows[3]["return_date"] == dt.datetime(2015, 3, 1, 9, 5)
    # schema is the canonical trips shape
    assert out.columns == ["id", "rent_date", "rent_station", "return_date", "return_station"]


def test_unmapped_columns_dropped(spark):
    raw = spark.createDataFrame(
        [("1/2/2011 10:30", "A", "1/2/2011 10:55", "B", "25", "junk")],
        ["ORIGENFECHA", "NOMBREORIGEN", "DESTINOFECHA", "NOMBREDESTINO", "TIEMPOUSO", "EXTRA"],
    )
    out = normalize_dialect(raw, FIELDS_V1)
    assert "EXTRA" not in out.columns and "extra" not in out.columns


def test_duration_under_three_tokens_null(spark):
    """parse_raw_data.py:59-61: <3 numeric tokens ⇒ null duration ⇒ no
    return_date ⇒ row dropped (v4 has no return_date column)."""
    raw = spark.createDataFrame(
        [("2015-03-01 08:00:00.000000", "A", "B", "5MIN 3SEG")],
        ["FECHA_HORA_RETIRO", "NOMBRE_ORIGEN", "NOMBRE_DESTINO", "TIEMPO_USO"],
    )
    out = normalize_dialect(raw, FIELDS_V4)
    assert out.count() == 0


def test_zero_and_negative_durations_dropped(spark):
    """parse_raw_data.py:108-115: falsy timedelta(0) skips return_date
    derivation, and isdigit() rejects negative strings — both row shapes
    must be dropped, not given return_date <= rent_date."""
    raw = spark.createDataFrame(
        [
            ("2015-03-01 08:00:00.000000", "A", "B", "0"),
            ("2015-03-01 09:00:00.000000", "A", "B", "-5"),
            ("2015-03-01 10:00:00.000000", "A", "B", "0H 0MIN 0SEG"),
            ("2015-03-01 11:00:00.000000", "A", "B", "7"),
        ],
        ["FECHA_HORA_RETIRO", "NOMBRE_ORIGEN", "NOMBRE_DESTINO", "TIEMPO_USO"],
    )
    rows = normalize_dialect(raw, FIELDS_V4).collect()
    assert len(rows) == 1
    assert rows[0]["return_date"] == dt.datetime(2015, 3, 1, 11, 7)


def test_dense_ids_deterministic(spark):
    raw = spark.createDataFrame(
        [
            ("1/2/2011 10:30", "B", "1/2/2011 10:55", "B", "25"),
            ("1/2/2011 09:30", "A", "1/2/2011 09:55", "A", "25"),
        ],
        ["ORIGENFECHA", "NOMBREORIGEN", "DESTINOFECHA", "NOMBREDESTINO", "TIEMPOUSO"],
    )
    a = unify({"2011": normalize_dialect(raw, FIELDS_V1)}).collect()
    b = unify({"2011": normalize_dialect(raw, FIELDS_V1)}).collect()
    assert sorted((r["id"], r["rent_station"]) for r in a) == sorted(
        (r["id"], r["rent_station"]) for r in b
    )
    # ordered by rent_date within source: A (09:30) gets id 0
    by_station = {r["rent_station"]: r["id"] for r in a}
    assert by_station == {"A": 0, "B": 1}
