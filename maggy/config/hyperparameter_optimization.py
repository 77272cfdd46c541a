"""`from maggy.config.hyperparameter_optimization import
HyperparameterOptConfig` (reference path)."""

from maggy_spark.config import HyperparameterOptConfig

__all__ = ["HyperparameterOptConfig"]
