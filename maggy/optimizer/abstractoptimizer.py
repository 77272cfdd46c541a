"""`from maggy.optimizer.abstractoptimizer import AbstractOptimizer`."""

from maggy_spark.optimizers import AbstractOptimizer

__all__ = ["AbstractOptimizer"]
