"""Hyperparameter search end-to-end: random warmup -> GP refinement,
with median-rule early stopping — the reference's flagship workflow
(docs/hpo/strategies.md) on the Spark-native engine.

Run: python examples/hpo_search.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from maggy import Searchspace, experiment
from maggy.config import HyperparameterOptConfig


def train_fn(lr, layers, dropout, reporter):
    """A stand-in training loop: deterministic loss surface with a
    per-epoch metric stream for the early-stop rule to watch."""
    quality = 1.0 - (lr - 0.1) ** 2 - (layers - 4) ** 2 / 50.0 - abs(dropout - 0.3)
    for epoch in range(5):
        reporter.broadcast(quality * (epoch + 1) / 5.0, epoch)
    return quality


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-hpo-example")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sp = Searchspace(
        lr=("DOUBLE", [0.001, 0.5]),
        layers=("INTEGER", [1, 8]),
        dropout=("DOUBLE", [0.0, 0.9]),
    )
    config = HyperparameterOptConfig(
        name="hpo_example",
        num_trials=20,
        optimizer="gp",           # or "randomsearch", "tpe", "asha", "hyperband"
        searchspace=sp,
        direction="max",
        es_policy="median",
        es_min=8,
        seed=42,
        parallelism=8,
    )
    result = experiment.lagom(train_fn, config, spark)
    print(f"best {result['best_val']:.4f} with {result['best_config']}")
    print(f"{result['num_trials']} trials, {result['early_stopped']} early-stopped, "
          f"{result['duration_sec']}s")


if __name__ == "__main__":
    main()
