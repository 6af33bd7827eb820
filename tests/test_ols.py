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


def test_grid_eval_matches_single_fit(spark, sf_dir):
    """The grid's l_quantity row must equal the dedicated single-feature
    fit bit-for-bit (same sums, same expression trees)."""
    from bicis_spark.operators.model import fit_ols_exact, grid_eval_ols
    from bicis_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    single = fit_ols_exact(li, "l_quantity", "l_extendedprice").collect()[0]
    grid = {
        r["config"]: r
        for r in grid_eval_ols(
            li, ["l_quantity", "l_discount"], "l_extendedprice"
        ).collect()
    }
    g = grid["l_quantity"]
    assert (g["n_rows"], g["slope"], g["intercept"], g["mse"]) == (
        single["n_rows"], single["slope"], single["intercept"], single["mse"],
    )
    assert grid["l_discount"]["mse"] != g["mse"]


def test_grouped_ols_matches_per_group_fits(spark):
    """fit_ols_exact_grouped must equal fit_ols_exact run per group, and
    a zero-variance-x group yields NULL coefficients instead of a
    division error."""
    from pyspark.sql import functions as F

    from bicis_spark.operators.model import fit_ols_exact, fit_ols_exact_grouped

    rows = [
        ("a", 1.0, 2.0), ("a", 2.0, 4.1), ("a", 3.0, 5.9),
        ("b", 1.0, 10.0), ("b", 2.0, 8.0), ("b", 4.0, 4.0),
        ("c", 5.0, 1.0), ("c", 5.0, 2.0),   # constant x
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in fit_ols_exact_grouped(df, "g", "x", "y").collect()}
    for g in ("a", "b"):
        want = fit_ols_exact(df.where(F.col("g") == g), "x", "y").first()
        assert got[g]["slope"] == want["slope"]
        assert got[g]["intercept"] == want["intercept"]
        assert got[g]["mse"] == want["mse"]
    assert got["c"]["slope"] is None and got["c"]["n_rows"] == 2


def test_conformal_coverage_guarantee_on_staged_data(spark):
    """On a staged linear-with-noise dataset the conformal width must
    cover ≥ ceil(0.9(n+1))-1 of the calibration residuals by
    construction (k-th order statistic), and k must be the
    ceil(0.9(n_cal+1)) formula."""
    import math

    from bicis_spark.operators.model import conformal_interval_stats

    rows = [
        (i, 1, float(i % 40), 3.0 * (i % 40) + 7.0 + ((i * 37) % 11 - 5))
        for i in range(1, 501)
    ]
    df = spark.createDataFrame(rows, "k1 long, k2 long, x double, y double")
    out = conformal_interval_stats(df, "x", "y", ["k1", "k2"], cal_mod=5).first()
    assert out["n_train"] + out["n_cal"] == 500
    assert out["k"] == min(
        math.ceil(0.9 * (out["n_cal"] + 1)), out["n_cal"]
    )
    # k-th smallest residual covers at least k residuals (ties may add)
    assert out["n_covered"] >= out["k"]
    assert out["q_width"] >= 0.0


def test_poisson_irls_step_matches_quantized_replay(spark):
    """fit_poisson_irls_step is BITWISE equal to a driver-side Python
    replay of the same quantized arithmetic (zq = floor(z·1e6) via CPython
    libm, integer sufficient statistics, the identical float tree) — and
    within float-noise of the unquantized textbook WLS step. This pins the
    engine side of glm_poisson_irls_contract independently of DuckDB."""
    import math

    from bicis_spark.operators.model import fit_poisson_irls_step

    rows = [((i * 7) % 24, (i * i) % 40) for i in range(1, 401)]
    pts = spark.createDataFrame(rows, "x long, y long")
    out = {r["x"]: r for r in fit_poisson_irls_step(pts, "x", "y").collect()}

    Z = 1_000_000
    zq = {
        y: math.floor((math.log(y + 0.1) - 0.1 / (y + 0.1)) * Z)
        for y in {y for _, y in rows}
    }
    A = B = C = D = E = 0
    for x, y in rows:
        s = 10 * y + 1
        A += s
        B += s * x
        C += s * x * x
        D += s * zq[y]
        E += s * x * zq[y]
    a_d, b_d, c_d, d_d, e_d = map(float, (A, B, C, D, E))
    slope = (a_d * e_d - b_d * d_d) / ((a_d * c_d - b_d * b_d) * float(Z))
    intercept = (d_d / float(Z) - slope * b_d) / a_d
    xs = sorted({x for x, _ in rows})
    assert set(out) == set(xs)
    for x in xs:
        assert out[x]["slope"] == slope
        assert out[x]["intercept"] == intercept
        assert out[x]["eta"] == intercept + slope * float(x)
        assert out[x]["n_pts"] == sum(1 for xx, _ in rows if xx == x)

    # sanity vs the unquantized textbook step (quantization is 1e-6 on z)
    Af = Bf = Cf = Df = Ef = 0.0
    for x, y in rows:
        mu = y + 0.1
        z = math.log(mu) - 0.1 / mu
        Af += mu
        Bf += mu * x
        Cf += mu * x * x
        Df += mu * z
        Ef += mu * x * z
    slope_f = (Af * Ef - Bf * Df) / (Af * Cf - Bf * Bf)
    intercept_f = (Df - slope_f * Bf) / Af
    assert math.isclose(slope, slope_f, rel_tol=1e-3, abs_tol=1e-6)
    assert math.isclose(intercept, intercept_f, rel_tol=1e-3)


def test_poisson_irls_shares_mllib_fixed_point(spark):
    """The contract's IRLS recursion and MLlib's GLR converge to the SAME
    optimum (MLlib seeds iteration 0 differently, so single-step values
    differ by design — the fixed point is the semantics that matter):
    iterating the contract's step from the step-1 output lands on MLlib's
    converged coefficients."""
    import math

    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression
    from pyspark.sql import functions as F

    rows = [((i * 7) % 24, (i * i) % 40) for i in range(1, 401)]
    pts = spark.createDataFrame(rows, "x long, y long")
    a = VectorAssembler(inputCols=["x"], outputCol="features").transform(
        pts.select(
            F.col("x").cast("double").alias("x"),
            F.col("y").cast("double").alias("y"),
        )
    )
    m = GeneralizedLinearRegression(
        family="poisson", link="log", maxIter=50, regParam=0.0, labelCol="y"
    ).fit(a)

    # driver-side continuation of the textbook IRLS from mustart
    mus = [y + 0.1 for _, y in rows]
    slope = intercept = None
    for _ in range(50):
        A = B = C = D = E = 0.0
        for (x, y), mu in zip(rows, mus):
            z = math.log(mu) + (y - mu) / mu
            A += mu
            B += mu * x
            C += mu * x * x
            D += mu * z
            E += mu * x * z
        slope = (A * E - B * D) / (A * C - B * B)
        intercept = (D - slope * B) / A
        mus = [math.exp(intercept + slope * x) for x, _ in rows]
    assert math.isclose(slope, float(m.coefficients[0]), rel_tol=1e-6, abs_tol=1e-9)
    assert math.isclose(intercept, float(m.intercept), rel_tol=1e-6)
