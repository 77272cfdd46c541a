"""LOCO ablation study: which feature earns its place? Mirrors the
reference's titanic feature-ablation example (docs/ablation/intro.md)
with a synthetic table.

Run: python examples/ablation_study.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from maggy import experiment
from maggy.ablation import AblationStudy
from maggy.config import AblationConfig


def make_training_table(path: str) -> None:
    rng = np.random.default_rng(7)
    n = 2_000
    df = pd.DataFrame(
        {
            "age": rng.normal(35, 12, n),
            "fare": rng.exponential(30, n),
            "pclass": rng.integers(1, 4, n).astype(float),
            "noise": rng.normal(0, 1, n),
        }
    )
    logit = 0.8 * (df.pclass == 1) + 0.02 * df.fare - 0.01 * df.age
    df["survived"] = (logit + rng.normal(0, 0.3, n) > 0.5).astype(int)
    df.to_parquet(path)


def train_fn(dataset_function, label_name):
    """Deterministic proxy model: mean |correlation| of each remaining
    feature with the label (swap in any sklearn/framework fit)."""
    pdf = dataset_function()
    feats = [c for c in pdf.columns if c != label_name]
    corrs = [abs(np.corrcoef(pdf[f], pdf[label_name])[0, 1]) for f in feats]
    return float(np.mean(corrs))


def main():
    spark = SparkSession.builder.master("local[8]").appName("maggy-spark-ablation").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    path = "/tmp/maggy_example_train.parquet"
    make_training_table(path)
    study = AblationStudy(training_dataset_path=path, label_name="survived")
    study.features.include("age", "fare", "pclass", "noise")

    result = experiment.lagom(train_fn, AblationConfig(ablation_study=study, direction="max"), spark)
    print(f"{result['num_trials']} trials (base + one per feature)")
    print(f"best configuration excludes: {result['best_excludes']}")
    # dropping `noise` should help; dropping `pclass`/`fare` should hurt


if __name__ == "__main__":
    main()
