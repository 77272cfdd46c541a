"""Hyperband controller golden scenario, sinks round-trip, callbacks."""

import json

import pytest

from maggy_spark import Searchspace, lagom
from maggy_spark.callbacks import KerasBatchEnd, KerasEpochEnd
from maggy_spark.config import HyperparameterOptConfig
from maggy_spark.experiment import trials_to_df
from maggy_spark.hyperband import Hyperband
from maggy_spark.reporter import Reporter
from maggy_spark.sources import (
    read_experiment,
    read_trial_summaries,
    write_experiment_result,
    write_trial_artifacts,
)


def test_hyperband_golden_schedule():
    hb = Hyperband(min_budget=1, max_budget=9, eta=3, n_iterations=2)
    hb.initialize(Searchspace(x=("DOUBLE", [0, 1])), 0, "max", 42)
    sched = {(s["iteration"], s["rung"]): (s["budget"], s["n_configs"]) for s in hb.schedule()}
    # golden from FIXTURES.md F6 (reference hyperband.py:115-124,200-209)
    assert sched == {
        (0, 0): (1, 9), (0, 1): (3, 3), (0, 2): (9, 1),
        (1, 1): (3, 3), (1, 2): (9, 1),
    }
    assert hb.num_trials == 9 + 3 + 1 + 3 + 1


def test_hyperband_e2e_promotes_best(spark):
    def fn(x, budget=1):
        return x * budget  # richer budget + better x wins

    hb = Hyperband(min_budget=1, max_budget=9, eta=3, n_iterations=2)
    config = HyperparameterOptConfig(
        optimizer=hb, searchspace=Searchspace(x=("DOUBLE", [0.0, 1.0])),
        direction="max", es_policy="none", seed=17, parallelism=16, num_trials=0,
    )
    res = lagom(fn, config, spark)
    assert res["num_trials"] == 17
    # the winner must come from the top rung (budget 9)
    best = next(t for t in hb.final_store if t.trial_id == res["best_id"])
    assert best.info_dict["budget"] == 9
    # rung ledger: iteration 0 rung 1 holds exactly 3 trials, all promoted
    rungs = hb.rungs_df(spark)
    r01 = rungs.where("iteration = 0 AND rung = 1").collect()
    assert len(r01) == 3 and all(r.promoted for r in r01)
    # promoted trials carry their source id
    assert all(r.original_trial_id != r.trial_id for r in r01)


def test_hyperband_promotes_in_metric_order(spark):
    captured = {}

    def fn(x, budget=1):
        return x

    hb = Hyperband(min_budget=1, max_budget=4, eta=2, n_iterations=1)
    config = HyperparameterOptConfig(
        optimizer=hb, searchspace=Searchspace(x=("DOUBLE", [0.0, 1.0])),
        direction="max", es_policy="none", seed=3, parallelism=8, num_trials=0,
    )
    lagom(fn, config, spark)
    rung0 = [t for t in hb.final_store if t.info_dict["rung"] == 0]
    rung1 = [t for t in hb.final_store if t.info_dict["rung"] == 1]
    top_x = sorted((t.params["x"] for t in rung0), reverse=True)[: len(rung1)]
    assert sorted(t.params["x"] for t in rung1) == sorted(top_x)


def test_sinks_roundtrip(spark, tmp_path):
    from maggy_spark.trial import Trial

    trials = []
    for i, m in enumerate([3.0, 1.0, 2.0]):
        t = Trial({"x": i})
        t.finalize(m)
        t.info_dict["seq"] = i
        trials.append(t)
    df = trials_to_df(spark, trials, "max")
    log_dir = str(tmp_path / "exp")
    write_trial_artifacts(df, log_dir, buckets=4)
    write_experiment_result({"best_val": 3.0, "num_trials": 3}, log_dir)

    back = read_experiment(spark, log_dir)
    assert back.count() == 3
    summ = read_trial_summaries(spark, log_dir).collect()
    assert [r.final_metric for r in summ] == [3.0, 2.0, 1.0]  # best-first
    with open(f"{log_dir}/result.json") as f:
        assert json.load(f)["best_val"] == 3.0


def test_keras_callbacks_report():
    rep = Reporter()
    cb = KerasBatchEnd(rep, metric="loss")
    cb.on_batch_end(0, {"loss": 1.0})
    cb.on_batch_end(1, {"loss": 0.5})
    cb.on_batch_end(2, {})  # missing metric ignored
    ce = KerasEpochEnd(rep, metric="val_loss")
    ce.on_epoch_end(5, {"val_loss": 0.25})
    assert rep.metric_history == [1.0, 0.5, 0.25]
    assert rep.step_history == [0, 1, 5]


def test_lagom_persists_artifacts(spark, tmp_path):
    from maggy_spark.sources import read_experiment, read_trial_summaries

    def fn(x):
        return x * 2

    config = HyperparameterOptConfig(
        name="exp_persist", num_trials=3, optimizer="randomsearch",
        searchspace=Searchspace(x=("DOUBLE", [0, 1])),
        direction="max", es_policy="none", seed=1, log_dir=str(tmp_path),
    )
    res = lagom(fn, config, spark)
    assert res["log_dir"].endswith("exp_persist_0")
    with open(f"{res['log_dir']}/result.json") as f:
        assert json.load(f)["best_id"] == res["best_id"]
    assert read_experiment(spark, res["log_dir"]).count() == 3
    top = read_trial_summaries(spark, res["log_dir"]).limit(1).collect()[0]
    assert top.final_metric == res["best_val"]
    # second run increments the run id
    res2 = lagom(fn, config, spark)
    assert res2["log_dir"].endswith("exp_persist_1")


def test_gp_mixed_searchspace(spark):
    """BO over DOUBLE + INTEGER + CATEGORICAL dims end-to-end."""
    from maggy_spark.bayes import GP

    def fn(lr, layers, act):
        base = {"relu": 0.0, "tanh": 0.1}[act]
        return (lr - 0.3) ** 2 + (layers - 4) ** 2 / 100.0 + base

    sp = Searchspace(
        lr=("DOUBLE", [0.0, 1.0]),
        layers=("INTEGER", [1, 8]),
        act=("CATEGORICAL", ["relu", "tanh"]),
    )
    config = HyperparameterOptConfig(
        num_trials=12, optimizer=GP(n_points=400, num_warmup_trials=6),
        searchspace=sp, direction="min", es_policy="none", seed=6, parallelism=4,
    )
    res = lagom(fn, config, spark)
    assert res["num_trials"] == 12
    best = res["best_config"]
    assert isinstance(best["layers"], int) and 1 <= best["layers"] <= 8
    assert best["act"] in ("relu", "tanh")
    assert res["best_val"] < 0.3


def test_trial_summaries_best_first_respects_direction(spark, tmp_path):
    """direction='min': the LOWEST metric is best-first — metric-desc
    alone would return the worst trial at the head."""
    from maggy_spark.experiment import trials_to_df
    from maggy_spark.sources import read_trial_summaries, write_trial_artifacts
    from maggy_spark.trial import Trial

    trials = []
    for i, m in enumerate([3.0, 1.0, 2.0]):
        t = Trial({"x": i})
        t.finalize(m)
        t.info_dict["seq"] = i
        trials.append(t)
    log_dir = str(tmp_path / "minexp")
    write_trial_artifacts(trials_to_df(spark, trials, "min"), log_dir, buckets=2)
    summ = read_trial_summaries(spark, log_dir).collect()
    assert [r.final_metric for r in summ] == [1.0, 2.0, 3.0]
