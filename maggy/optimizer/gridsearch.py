"""`from maggy.optimizer.gridsearch import GridSearch` (reference path)."""

from maggy_spark.optimizers import GridSearch

__all__ = ["GridSearch"]
