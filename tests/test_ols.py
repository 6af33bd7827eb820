"""The exact-sum closed-form OLS must agree with MLlib's gaussian
identity-link GLM (the estimator the reference's model surface wraps) —
this pins the oracle-gated arithmetic to real model math."""

from __future__ import annotations

import math

import pytest

from bicis_spark.operators.model import fit_ols_exact, ols_predict_exact
from bicis_spark.sources.io import read_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem")


def test_closed_form_matches_mllib_glm(lineitem):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    row = fit_ols_exact(lineitem, "l_quantity", "l_extendedprice").collect()[0]

    assembled = VectorAssembler(
        inputCols=["l_quantity"], outputCol="features"
    ).transform(lineitem.select("l_quantity", "l_extendedprice"))
    model = GeneralizedLinearRegression(
        family="gaussian", link="identity", labelCol="l_extendedprice"
    ).fit(assembled)

    assert math.isclose(row["slope"], model.coefficients[0], rel_tol=1e-9)
    assert math.isclose(row["intercept"], model.intercept, rel_tol=1e-9)
    assert row["n_rows"] == lineitem.count()


def test_mse_matches_residual_average(lineitem):
    from pyspark.sql import functions as F

    fit = fit_ols_exact(lineitem, "l_quantity", "l_extendedprice").collect()[0]
    preds = ols_predict_exact(
        lineitem, "l_quantity", "l_extendedprice", ["l_orderkey", "l_linenumber"]
    )
    direct = preds.agg(
        F.avg(F.pow(F.col("label") - F.col("prediction"), F.lit(2))).alias("m")
    ).collect()[0]["m"]
    assert math.isclose(fit["mse"], direct, rel_tol=1e-9)
