"""`lagom(train_fn, config)` — the experiment entry point.

Reference lifecycle (SURVEY.md §3.1, `maggy/experiment/experiment.py:
21-45`, `experiment_pyspark.py:43-146`): dispatch on config type,
drive trials to completion, return the result dict. The rebuild's
loop is wave-based: the controller emits pending trials, each wave
runs as a grouped pandas UDF (executor.py), finalized trials feed
back into the controller, and the final result is a Spark
aggregation over the trials DataFrame (operator A1) — no RPC server,
no reservation registry, no digestion threads.

Asynchrony note (SURVEY.md §7.3b): the reference assigns a new trial
the instant one finishes. Wave scheduling approximates that with
wave size = parallelism; ASHA promotions are checked between waves.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from maggy_spark.config import (
    AblationConfig,
    BaseConfig,
    HyperparameterOptConfig,
    TfDistributedConfig,
    TorchDistributedConfig,
)
from maggy_spark.executor import run_trial_wave
from maggy_spark.optimizers import get_controller
from maggy_spark.trial import Trial

DEC = "decimal(18,4)"


def lagom(train_fn: Callable, config: BaseConfig, spark: SparkSession | None = None) -> dict:
    """Run an experiment; returns the result dict (best/worst/avg...).

    Public API preserved from the reference (`experiment.lagom`).
    """
    spark = spark or SparkSession.builder.getOrCreate()
    if isinstance(config, HyperparameterOptConfig):
        return _run_hpo(train_fn, config, spark)
    if isinstance(config, AblationConfig):
        from maggy_spark.ablation import run_ablation

        return run_ablation(train_fn, config, spark)
    if isinstance(config, (TorchDistributedConfig, TfDistributedConfig)):
        from maggy_spark.distributed import run_distributed_training

        return run_distributed_training(train_fn, config, spark)
    if isinstance(config, BaseConfig):
        return _run_base(train_fn, config, spark)
    raise TypeError(f"unsupported config type: {type(config).__name__}")


def _run_base(train_fn: Callable, config: BaseConfig, spark: SparkSession) -> dict:
    """BaseConfig: run the function once, locally (reference
    base_executor.py:21-42 identity wrapper)."""
    from maggy_spark.executor import build_kwargs, normalize_return
    from maggy_spark.reporter import Reporter

    reporter = Reporter()
    kwargs = build_kwargs(train_fn, {}, reporter)
    ret = train_fn(**kwargs)
    metric = normalize_return(ret, config.metric_key or "metric") if ret is not None else None
    return {"test result": metric, "logs": reporter.logs}


def _run_hpo(train_fn: Callable, config: HyperparameterOptConfig, spark: SparkSession) -> dict:
    controller = get_controller(config.optimizer)
    controller.initialize(
        searchspace=config.searchspace,
        num_trials=config.num_trials,
        direction=config.direction,
        seed=config.seed,
    )
    parallelism = config.parallelism or spark.sparkContext.defaultParallelism
    es_enabled = str(config.es_policy).lower() == "median" or not isinstance(config.es_policy, str)

    t_start = time.time()
    all_trials: list[Trial] = []
    seq = 0
    waves = 0
    while not controller.done():
        wave = controller.next_batch(parallelism)
        if not wave:
            break
        stop_src = None
        if es_enabled and len(controller.final_store) >= config.es_min:
            histories = [t.metric_history for t in controller.final_store if t.metric_history]
            if histories:
                stop_src = json.dumps(
                    {
                        "direction": config.direction,
                        "es_interval": config.es_interval,
                        "prefix_histories": histories,
                    }
                )
        pending = [
            {"trial_id": t.trial_id, "params": t.params, "budget": int(t.info_dict.get("budget", 0))}
            for t in wave
        ]
        by_id = {t.trial_id: t for t in wave}
        results = run_trial_wave(
            spark,
            pending,
            train_fn,
            optimization_key=config.optimization_key,
            stop_check_source=stop_src,
        )
        for r in results:
            t = by_id[r["trial_id"]]
            t.metric_history = list(r["metric_history"] or [])
            t.step_history = [int(s) for s in (r["step_history"] or [])]
            t.early_stop = bool(r["early_stop"])
            t.duration = (r["duration_ms"] or 0) / 1000.0
            if r["error"]:
                t.status = Trial.ERROR
                t.info_dict["error"] = r["error"]
            else:
                t.status = Trial.FINALIZED
                t.final_metric = r["final_metric"]
                controller.finalize_trial(t)
            seq += 1
            t.info_dict["seq"] = seq
            all_trials.append(t)
        waves += 1
        if waves > 10_000:
            raise RuntimeError("experiment did not converge (wave limit)")

    result = _aggregate_result(spark, all_trials, config.direction)
    result["duration_sec"] = round(time.time() - t_start, 3)
    result["num_waves"] = waves
    best = next((t for t in all_trials if t.trial_id == result.get("best_id")), None)
    if best is not None:
        result["best_config"] = {k: v for k, v in best.params.items() if not callable(v)}
    worst = next((t for t in all_trials if t.trial_id == result.get("worst_id")), None)
    if worst is not None:
        result["worst_config"] = {k: v for k, v in worst.params.items() if not callable(v)}
    return result


def trials_to_df(spark: SparkSession, trials: list[Trial], direction: str = "max"):
    """Materialize driver-side trials as the `trials` DataFrame
    (FIXTURES.md F2 schema)."""
    rows = [t.to_row(seq=t.info_dict.get("seq", i), direction=direction, budget=int(t.info_dict.get("budget", 0)))
            for i, t in enumerate(trials)]
    schema = (
        "trial_id string, seq bigint, params map<string,string>, budget int, "
        "sample_type string, status string, direction string, final_metric double, "
        "early_stop boolean, duration_ms bigint"
    )
    return spark.createDataFrame(rows, schema)


def _aggregate_result(spark: SparkSession, trials: list[Trial], direction: str) -> dict:
    """The A1 result aggregation over the experiment's own trials DF
    (reference optimization_driver.py:344-406 + prep_results)."""
    if not trials:
        return {"num_trials": 0, "early_stopped": 0}
    df = trials_to_df(spark, trials, direction).where(F.col("status") == "FINALIZED")
    if df.isEmpty():
        errs = sum(t.status == Trial.ERROR for t in trials)
        return {"num_trials": len(trials), "errors": errs, "early_stopped": 0}
    sign = -1.0 if direction == "min" else 1.0
    key = (F.col("final_metric") * sign)
    agg = df.agg(
        F.max(F.struct(key.alias("m"), (-F.col("seq")).alias("ns"), F.col("trial_id"), F.col("final_metric"))).alias("b"),
        F.min(F.struct(key.alias("m"), F.col("seq"), F.col("trial_id"), F.col("final_metric"))).alias("w"),
        (F.sum(F.col("final_metric").cast(DEC)).cast("double") / F.count("final_metric")).alias("avg"),
        F.count("*").alias("num_trials"),
        F.sum(F.when(F.col("early_stop"), 1).otherwise(0)).cast("bigint").alias("early_stopped"),
    ).collect()[0]
    return {
        "best_id": agg.b.trial_id,
        "best_val": agg.b.final_metric,
        "worst_id": agg.w.trial_id,
        "worst_val": agg.w.final_metric,
        "avg": agg.avg,
        "num_trials": agg.num_trials,
        "early_stopped": agg.early_stopped,
    }
