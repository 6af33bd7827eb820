"""Runner: DAG order, parquet memoization, YAML experiment loading."""

from __future__ import annotations

from pyspark.sql import functions as F

from bicis_spark.plans.runner import Pipeline, load_callable, load_experiment


def test_pipeline_memoization(spark, tmp_path):
    calls = {"base": 0, "doubled": 0}
    p = Pipeline(spark, str(tmp_path))

    @p.stage("base")
    def base(s):
        calls["base"] += 1
        return s.range(10).select(F.col("id"))

    @p.stage("doubled", deps=["base"])
    def doubled(s, base_df):
        calls["doubled"] += 1
        return base_df.select((F.col("id") * 2).alias("v"))

    r1 = p.run(["doubled"])
    assert sorted(x["v"] for x in r1["doubled"].collect()) == list(range(0, 20, 2))
    assert calls == {"base": 1, "doubled": 1}

    # second run: everything memoized from parquet
    p.run(["doubled"])
    assert calls == {"base": 1, "doubled": 1}

    # force recomputes
    p.run(["doubled"], force=True)
    assert calls == {"base": 2, "doubled": 2}


def test_topo_cycle_detection(spark, tmp_path):
    p = Pipeline(spark, str(tmp_path))
    p.stages.update(
        {
            "a": __import__("bicis_spark.plans.runner", fromlist=["Stage"]).Stage("a", lambda s: None, ["b"]),
            "b": __import__("bicis_spark.plans.runner", fromlist=["Stage"]).Stage("b", lambda s: None, ["a"]),
        }
    )
    import pytest

    with pytest.raises(ValueError, match="cycle"):
        p.run(["a"])


def test_load_experiment(tmp_path):
    cfg = tmp_path / "exp.yaml"
    cfg.write_text(
        "experiment_name: baseline\n"
        "features_builder:\n"
        "  type: bicis_spark.operators.features:circular_lag_features\n"
        "  window_size: 24\n"
        "model:\n"
        "  type: bicis_spark.operators.model:fit_poisson\n"
        "  link: log\n"
        "  max_iter: 1\n"
    )
    exp = load_experiment(str(cfg))
    assert exp["experiment_name"] == "baseline"
    fn, params = exp["features_builder"]
    assert fn.__name__ == "circular_lag_features" and params == {"window_size": 24}
    fn2, params2 = exp["model"]
    assert fn2.__name__ == "fit_poisson" and params2 == {"link": "log", "max_iter": 1}


def test_load_callable_dotted():
    fn = load_callable("bicis_spark.operators.targets.next_window_count")
    assert fn.__name__ == "next_window_count"
