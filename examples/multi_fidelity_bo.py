"""Multi-fidelity Bayesian optimization with interim-results
surrogate augmentation (reference GP `interim_results=True`,
`maggy/optimizer/bayes/base.py:536-641`).

Each trial reports a per-epoch metric curve; the GP trains on EVERY
k-th interim observation with the hparam vector augmented by the
normalized budget z = [x, n/N], then acquires new candidates at full
budget (z = 1). Compared to final-metric-only fitting, the surrogate
sees len(history)/k times more observations per trial — the point of
multi-fidelity BO when epochs are expensive.

Run: python examples/multi_fidelity_bo.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession

from maggy_spark import Searchspace, lagom
from maggy_spark.bayes import GP
from maggy_spark.config import HyperparameterOptConfig

EPOCHS = 8


def train(lr, width, reporter):
    """Fake training: loss decays toward a minimum at lr=0.1,
    width=0.6; the curve converges over EPOCHS so interim points are
    informative about the final value."""
    final = (lr - 0.1) ** 2 + 0.5 * (width - 0.6) ** 2
    for epoch in range(EPOCHS):
        # loss approaches `final` geometrically
        loss = final + (1.0 - final) * (0.5 ** (epoch + 1))
        reporter.broadcast(loss, epoch)
    return final


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-multi-fidelity-bo")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    config = HyperparameterOptConfig(
        num_trials=15,
        optimizer=GP(
            num_warmup_trials=5,
            n_points=2000,
            interim_results=True,           # fit on z = [x, n/N] rows
            interim_results_interval=2,     # every 2nd epoch + final
        ),
        searchspace=Searchspace(lr=("DOUBLE", [0.0, 1.0]), width=("DOUBLE", [0.0, 1.0])),
        direction="min",
        es_policy="none",
        seed=42,
        parallelism=4,
    )
    res = lagom(train, config, spark)
    print(f"best loss {res['best_val']:.5f} at {res['best_config']}")
    print(f"{res['num_trials']} trials in {res['duration_sec']}s, {res['num_waves']} waves")
    spark.stop()


if __name__ == "__main__":
    main()
