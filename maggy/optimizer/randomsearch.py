"""`from maggy.optimizer.randomsearch import RandomSearch` (reference path)."""

from maggy_spark.optimizers import RandomSearch

__all__ = ["RandomSearch"]
