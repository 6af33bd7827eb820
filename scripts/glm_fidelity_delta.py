"""Quantify the numeric delta between the closed-form one-IRLS-step
Poisson fit (the hash-gated glm_poisson_predictions/_mse path) and the
MLlib GeneralizedLinearRegression estimator at maxIter=1 — the exact
configuration the reference runs (poisson_regression.py:13-24) — on the
BENCH data, not just the converged-fixed-point pinning in test_ols.py.

The r7 advice notes a one-step closed form from the textbook init
(mustart = y + 0.1) is not guaranteed to equal MLlib's one-step solution
(different iteration-0 seed); this script measures the gap so the
declared-plan substitution carries a recorded fidelity number:

* |Δslope|, |Δintercept| (absolute + relative)
* max / mean relative delta of mu = exp(eta) over the 24 distinct x
* MSE under each fit, and their relative delta
* the same deltas vs MLlib at convergence (maxIter=25), the anchor
  both fits approach

Usage: python scripts/glm_fidelity_delta.py [sf_dir=/root/testdata/sf0.1]
Output: one JSON line (recorded in SCALE.md).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bicis_spark.operators.model import fit_poisson_irls_step  # noqa: E402
from bicis_spark.plans.pipeline_queries import _glm_pts  # noqa: E402
from bicis_spark.session import get_spark  # noqa: E402


def mllib_fit(pts, max_iter: int):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GeneralizedLinearRegression

    ds = VectorAssembler(inputCols=["hour_d"], outputCol="features").transform(
        pts.select(
            F.col("hour").cast("double").alias("hour_d"),
            F.col("y").cast("double").alias("label"),
        )
    )
    m = GeneralizedLinearRegression(
        family="poisson", link="log", maxIter=max_iter, regParam=0.0
    ).fit(ds)
    return float(m.coefficients[0]), float(m.intercept)


def mse_of(rows, slope: float, intercept: float) -> float:
    sse = sum(n * (y - math.exp(intercept + slope * x)) ** 2 for x, y, n in rows)
    n_tot = sum(n for _, _, n in rows)
    return sse / n_tot


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="glm_fidelity_delta")
    spark.sparkContext.setLogLevel("ERROR")
    pts = _glm_pts(spark, sf_dir).cache()

    irls = fit_poisson_irls_step(pts, "hour", "y").select("slope", "intercept").first()
    s0, i0 = float(irls["slope"]), float(irls["intercept"])
    s1, i1 = mllib_fit(pts, max_iter=1)
    sc, ic = mllib_fit(pts, max_iter=25)

    # (x, y, count) contingency — bounded (24 hours x count values)
    rows = [
        (int(r["hour"]), int(r["y"]), int(r["n"]))
        for r in pts.groupBy("hour", "y").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    xs = sorted({x for x, _, _ in rows})
    mu_rel = [
        abs(math.exp(i0 + s0 * x) - math.exp(i1 + s1 * x)) / math.exp(i1 + s1 * x)
        for x in xs
    ]
    out = {
        "sf_dir": sf_dir,
        "n_pts": int(pts.count()),
        "irls_step": {"slope": s0, "intercept": i0},
        "mllib_maxiter1": {"slope": s1, "intercept": i1},
        "mllib_converged": {"slope": sc, "intercept": ic},
        "delta_vs_maxiter1": {
            "slope_abs": abs(s0 - s1),
            "intercept_abs": abs(i0 - i1),
            "slope_rel": abs(s0 - s1) / abs(s1) if s1 else None,
            "mu_rel_max": max(mu_rel),
            "mu_rel_mean": sum(mu_rel) / len(mu_rel),
        },
        "delta_vs_converged": {
            "irls_slope_abs": abs(s0 - sc),
            "mllib1_slope_abs": abs(s1 - sc),
        },
        "mse": {
            "irls_step": mse_of(rows, s0, i0),
            "mllib_maxiter1": mse_of(rows, s1, i1),
            "mllib_converged": mse_of(rows, sc, ic),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
