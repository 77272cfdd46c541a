"""ExperimentStore: trials and metrics as live parquet tables.

SURVEY.md §3.1's rebuild lifecycle: "controller emits pending trials
-> execute batch -> APPEND TO trials/metrics TABLES -> early-stop +
result aggregation SQL". This store is those tables — appended per
wave, queried with the same relational kernel shapes the oracle gate
checks (A1 summary, A4 budget stats, G5 promotions, A8 median bar) —
so dashboards/other sessions can watch a running experiment with
plain Spark SQL instead of asking the driver process.

Append-only parquet with one file per wave: cheap atomic appends, no
compaction needed at experiment scale (thousands of trials, not
billions of rows). The metric stream reuses the same expressions as
operators/earlystop.py.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.trial import Trial

TRIALS_SCHEMA = (
    "trial_id string, seq bigint, params map<string,string>, budget int, "
    "sample_type string, status string, direction string, final_metric double, "
    "early_stop boolean, duration_ms bigint"
)
METRICS_SCHEMA = "trial_id string, step bigint, value double"


class ExperimentStore:
    def __init__(self, spark: SparkSession, path: str, direction: str = "max"):
        self.spark = spark
        self.path = path
        self.direction = direction
        self._trials_path = os.path.join(path, "trials")
        self._metrics_path = os.path.join(path, "metrics")
        os.makedirs(path, exist_ok=True)

    # -- appends -------------------------------------------------------

    def append_trials(self, trials: list[Trial]) -> None:
        if not trials:
            return
        rows = [
            t.to_row(
                seq=t.info_dict.get("seq", i),
                direction=self.direction,
                budget=int(t.info_dict.get("budget", 0)),
            )
            for i, t in enumerate(trials)
        ]
        self.spark.createDataFrame(rows, TRIALS_SCHEMA).coalesce(1).write.mode("append").parquet(
            self._trials_path
        )

    def append_metrics(self, trials: list[Trial]) -> None:
        rows = [
            (t.trial_id, int(s), float(v))
            for t in trials
            for s, v in zip(t.step_history, t.metric_history, strict=True)
        ]
        if not rows:
            return
        self.spark.createDataFrame(rows, METRICS_SCHEMA).coalesce(1).write.mode("append").parquet(
            self._metrics_path
        )

    # -- live relations ------------------------------------------------

    def trials(self) -> DataFrame:
        return self.spark.read.parquet(self._trials_path)

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self._metrics_path)

    # -- kernel queries over the live store ----------------------------

    def result_summary(self) -> dict:
        """A1 over the live store (ordered-struct max/min, one pass)."""
        t = self.trials().where(F.col("status") == "FINALIZED")
        sign = -1.0 if self.direction == "min" else 1.0
        key = F.col("final_metric") * sign
        row = t.agg(
            F.max(F.struct(key.alias("m"), (-F.col("seq")).alias("ns"), F.col("trial_id"), F.col("final_metric"))).alias("b"),
            F.min(F.struct(key.alias("m"), F.col("seq"), F.col("trial_id"), F.col("final_metric"))).alias("w"),
            F.avg("final_metric").alias("avg"),
            F.count("*").alias("num_trials"),
            F.sum(F.when(F.col("early_stop"), 1).otherwise(0)).cast("bigint").alias("early_stopped"),
        ).collect()[0]
        if row.num_trials == 0:
            return {"num_trials": 0, "early_stopped": 0}
        return {
            "best_id": row.b.trial_id, "best_val": row.b.final_metric,
            "worst_id": row.w.trial_id, "worst_val": row.w.final_metric,
            "avg": row.avg, "num_trials": row.num_trials, "early_stopped": row.early_stopped,
        }

    def budget_stats(self) -> DataFrame:
        """A4 per-budget ybest/yworst/ymean over the live store."""
        t = self.trials().where(F.col("status") == "FINALIZED")
        return t.groupBy("budget").agg(
            F.min("final_metric").alias("ybest"),
            F.max("final_metric").alias("yworst"),
            F.avg("final_metric").alias("ymean"),
            F.count("*").alias("n_trials"),
        )

    def promotable(self, eta: int = 2) -> DataFrame:
        """G5: top floor(n/eta) per budget-rung, direction-aware."""
        from pyspark.sql.window import Window

        t = self.trials().where(F.col("status") == "FINALIZED")
        order = F.col("final_metric").desc() if self.direction == "max" else F.col("final_metric").asc()
        w = Window.partitionBy("budget").orderBy(order, F.col("seq"))
        ranked = t.select(
            F.col("budget").alias("rung"), "trial_id", "final_metric",
            F.row_number().over(w).alias("rank"),
            F.count("*").over(Window.partitionBy("budget")).alias("n"),
        )
        return ranked.where(F.col("rank") <= F.floor(F.col("n") / eta)).drop("n")

    def median_bar(self, step_limit: int = 3) -> float | None:
        """A8: the early-stop bar from the live metric stream."""
        fin = self.trials().where(F.col("status") == "FINALIZED").select("trial_id")
        pavg = (
            self.metrics().where(F.col("step") <= step_limit)
            .join(fin, "trial_id")
            .groupBy("trial_id")
            .agg(F.avg("value").alias("pavg"))
        )
        row = pavg.agg(F.percentile("pavg", F.lit(0.5)).alias("bar")).collect()[0]
        return None if row.bar is None else float(row.bar)
