"""`from maggy.optimizer.bayes.tpe import TPE` (reference path)."""

from maggy_spark.bayes import TPE

__all__ = ["TPE"]
