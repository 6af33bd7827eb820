"""End-to-end pipeline smoke: every stage materializes, the dataset has the
49-column shape, MSE is finite, fails counts reconcile."""

from __future__ import annotations

import math

from bicis_spark.plans.bicis_pipeline import run_full_pipeline
from bicis_spark.plans.runner import load_experiment


def test_full_pipeline(spark, sf_dir, tmp_path):
    results = run_full_pipeline(spark, sf_dir, str(tmp_path / "pipe"))

    ds = results["dataset"]
    assert len(ds.columns) == 3 + 48  # id, target, split, 24+24 lag features
    n_ds = ds.count()
    assert n_ds > 0

    preds = results["predictions"].collect()
    assert len(preds) == n_ds
    assert all(r["prediction"] is not None for r in preds[:10])
    splits = {r["split"] for r in preds}
    assert "training" in splits and len(splits) >= 2

    mses = {r["split"]: r["mse"] for r in results["evaluation"].collect()}
    assert set(mses) == splits
    assert all(m is not None and math.isfinite(m) and m >= 0 for m in mses.values())

    fails = results["fails"].first()
    assert fails["input_count"] - fails["output_count"] == fails["number_of_errors"]
    assert fails["output_count"] == n_ds


def test_baseline_config_resolves():
    exp = load_experiment("configs/baseline_features.yaml")
    assert exp["experiment_name"] == "baseline_features"
    fn, params = exp["target_builder"]
    assert fn.__name__ == "next_window_count"
    assert params == {"window_seconds": 3600}
    assert exp["metrics"] == ["mse"]


def test_model_save_load_roundtrip(spark, sf_dir, tmp_path):
    """S12: pyspark.ml native persistence (poisson_regression.py:28-31)."""
    from pyspark.ml.regression import GeneralizedLinearRegressionModel
    from pyspark.sql import functions as F

    from bicis_spark.operators.model import assemble_features, fit_poisson, predict
    from bicis_spark.plans.pipeline_queries import ml_dataset_q

    ds = ml_dataset_q(spark, sf_dir)
    assembled = assemble_features(ds, id_col="event_id")
    model = fit_poisson(assembled, link="log", max_iter=1)
    path = str(tmp_path / "glm_model")
    model.save(path)
    loaded = GeneralizedLinearRegressionModel.load(path)
    orig = predict(model, assembled).collect()
    re = predict(loaded, assembled).collect()
    assert sorted((r["id"], r["prediction"]) for r in orig) == sorted(
        (r["id"], r["prediction"]) for r in re
    )
