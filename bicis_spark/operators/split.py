"""Time-based train/validation/test split (SURVEY.md §2.4 A1, §2.2 F1).

Reference semantics (``bicis/etl/raw_data/split.py:31-85``):
``max_date = min(max(rent_date), max(return_date))``; testing is the last
``test_period`` before max_date (inclusive end), validation the
``validation_period`` before that, training everything strictly before.
Boundary edges preserved exactly: training ``<``, validation ``>= , <``,
testing ``>= , <=`` (``split.py:51,58-61,66-70``).

Spark-first: bounds are computed as a 1-row aggregate and attached with a
broadcast cross-join, so the three splits stay in one logical plan — no
driver collect, no recompute of the scan per split (the reference re-filters
its CSV three times).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAY_US = 86_400 * 1_000_000


@dataclass(frozen=True)
class SplitPeriods:
    """Held constant in the reference "to ensure reproducibility"
    (split.py:15-17)."""

    validation_days: int = 90
    test_days: int = 90


def split_bounds(
    df: DataFrame,
    ts_cols: tuple[str, str] = ("rent_date", "return_date"),
    periods: SplitPeriods = SplitPeriods(),
) -> DataFrame:
    """1-row DataFrame of boundary timestamps (A1 + X8):
    [max_date, training_end_date, validation_start_date,
    validation_end_date, testing_start_date, testing_end_date]."""
    max_date = F.least(*[F.max(F.col(c)) for c in ts_cols])
    testing_end = max_date
    testing_start = F.timestamp_micros(
        F.unix_micros(testing_end) - F.lit(periods.test_days * DAY_US)
    )
    validation_start = F.timestamp_micros(
        F.unix_micros(testing_start) - F.lit(periods.validation_days * DAY_US)
    )
    return df.agg(
        max_date.alias("max_date"),
        validation_start.alias("training_end_date"),
        validation_start.alias("validation_start_date"),
        testing_start.alias("validation_end_date"),
        testing_start.alias("testing_start_date"),
        testing_end.alias("testing_end_date"),
    )


def with_split_label(
    df: DataFrame,
    bounds: DataFrame,
    ts_col: str = "rent_date",
    label_col: str = "split",
) -> DataFrame:
    """Attach the split label in one pass (broadcast the 1-row bounds).

    Encodes the exact reference edges: < training_end → training;
    >= validation_start and < validation_end → validation;
    >= testing_start and <= testing_end → testing; anything later (cannot
    happen when testing_end == max) or earlier-null → null label.
    """
    ts = F.col(ts_col)
    label = (
        F.when(ts < F.col("training_end_date"), F.lit("training"))
        .when(
            (ts >= F.col("validation_start_date")) & (ts < F.col("validation_end_date")),
            F.lit("validation"),
        )
        .when(
            (ts >= F.col("testing_start_date")) & (ts <= F.col("testing_end_date")),
            F.lit("testing"),
        )
    )
    return df.join(F.broadcast(bounds)).withColumn(label_col, label).drop(*bounds.columns)


def time_split(
    df: DataFrame,
    ts_cols: tuple[str, str] = ("rent_date", "return_date"),
    split_on: str = "rent_date",
    periods: SplitPeriods = SplitPeriods(),
) -> dict[str, DataFrame]:
    """The full splitter: {'training', 'validation', 'testing'} DataFrames
    plus 'metadata' (the bounds row) — the reference's four outputs
    (split.py:23-29)."""
    bounds = split_bounds(df, ts_cols, periods)
    labeled = with_split_label(df, bounds, split_on)
    return {
        "training": labeled.where(F.col("split") == "training").drop("split"),
        "validation": labeled.where(F.col("split") == "validation").drop("split"),
        "testing": labeled.where(F.col("split") == "testing").drop("split"),
        "metadata": bounds,
    }


def rolling_origin_folds(
    df, ts_col: str, n_folds: int = 3, horizon_s: int = 7 * 86400
):
    """Rolling-origin (time-series) cross-validation folds: fold k trains
    on everything before ``anchor - k*horizon`` and tests on the next
    ``horizon`` — the temporally-honest CV for forecasting models
    (reference model-selection semantics: train strictly precedes test,
    reference ``evaluate_model.py`` dataset_type loop generalized to k
    rolling folds).

    [fold, n_train, n_test, train_end, test_end] per fold. One scan: the
    1-row anchor broadcasts, events explode onto the (tiny) fold list and
    aggregate by fold with map-side combine. All boundary arithmetic is
    integer epoch-microseconds — no interval/calendar semantics to
    diverge between engines.
    """
    from pyspark.sql import functions as F

    h_us = horizon_s * 1_000_000
    anchor = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("_mx"))
    e = df.select(F.unix_micros(F.col(ts_col)).alias("_us")).crossJoin(
        F.broadcast(anchor)
    )
    folds = e.select(
        "_us",
        "_mx",
        F.explode(F.sequence(F.lit(1), F.lit(n_folds))).alias("fold"),
    )
    train_cut = F.col("_mx") - F.col("fold") * F.lit(h_us)
    test_cut = F.col("_mx") - (F.col("fold") - F.lit(1)) * F.lit(h_us)
    return (
        folds.groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            F.sum(F.when(F.col("_us") < train_cut, 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(
                F.when((F.col("_us") >= train_cut) & (F.col("_us") < test_cut), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_test"),
            F.timestamp_micros(F.min(train_cut)).alias("train_end"),
            F.timestamp_micros(F.min(test_cut)).alias("test_end"),
        )
    )
