"""Experiment result/artifact sinks and the summary scan.

Reference: the driver dumps `result.json`/`maggy.json` on finalize
(S5, `optimization_driver.py:235-253,294-342`; `base_driver.py:59-77`),
per-trial `.hparams.json`/`.outputs.json`/`trial.json` artifacts (S6,
`maggy/util.py:159-199`, `trial_executor.py:144-154`) and re-joins
them with `util.build_summary_json` (S9, `util.py:134-147`).

Rebuild: the trials DataFrame IS the artifact store — written as
parquet partitioned by trial_id bucket (not one file per trial: at
100 TB-scale experiment counts, millions of tiny JSON files are the
anti-pattern; partitioned parquet keeps the same lookup key with sane
file counts). JSON sidecars are still written for the experiment-level
result dict for notebook/UX parity.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_experiment_result(result: dict[str, Any], log_dir: str, name: str = "result.json") -> str:
    """S5: experiment-level result dict -> JSON file (driver-side
    metadata, tiny)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, name)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(result, f, sort_keys=True, default=str, indent=2)
    return path


def write_trial_artifacts(trials_df: DataFrame, log_dir: str, buckets: int = 64) -> str:
    """S6: the trials relation as parquet, bucketed by trial_id hash so
    a single-trial lookup prunes to one file group."""
    path = os.path.join(log_dir, "trials")
    (
        trials_df.withColumn("bucket", (F.crc32(F.col("trial_id")) % buckets).cast("int"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )
    return path


def read_experiment(spark: SparkSession, log_dir: str) -> DataFrame:
    """Load the trials relation back."""
    return spark.read.parquet(os.path.join(log_dir, "trials"))


def read_trial_summaries(spark: SparkSession, log_dir: str) -> DataFrame:
    """S9 summary scan: per-trial params + final metric + status,
    sorted best-first — the reference's `build_summary_json`
    "combinations" array as a DataFrame. "Best" follows the rows'
    own `direction` column: plain metric-desc would put the WORST
    trial first for a minimization experiment."""
    t = read_experiment(spark, log_dir)
    signed = F.when(F.col("direction") == "min", -F.col("final_metric")).otherwise(
        F.col("final_metric")
    )
    return (
        t.select(
            "trial_id", "params", "status", "final_metric", "early_stop", "duration_ms",
            signed.alias("__signed__"),
        )
        .orderBy(F.col("__signed__").desc_nulls_last())
        .drop("__signed__")
    )
