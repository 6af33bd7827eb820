"""End-to-end pipeline smoke: every stage materializes, the dataset has the
49-column shape, MSE is finite, fails counts reconcile."""

from __future__ import annotations

import math

from bicis_spark.plans.bicis_pipeline import run_full_pipeline
from bicis_spark.plans.runner import load_experiment


def test_full_pipeline(spark, sf_dir, tmp_path):
    results = run_full_pipeline(spark, sf_dir, str(tmp_path / "pipe"))

    ds = results["dataset"]
    assert len(ds.columns) == 2 + 48  # id, target, 24+24 lag features
    n_ds = ds.count()
    assert n_ds > 0

    preds = results["predictions"].collect()
    assert len(preds) == n_ds
    assert all(r["prediction"] is not None for r in preds[:10])

    mse = results["evaluation"].first()["mse"]
    assert mse is not None and math.isfinite(mse) and mse >= 0

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
