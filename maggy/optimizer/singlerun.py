"""`from maggy.optimizer.singlerun import SingleRun` (reference path)."""

from maggy_spark.optimizers import SingleRun

__all__ = ["SingleRun"]
