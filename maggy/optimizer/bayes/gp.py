"""`from maggy.optimizer.bayes.gp import GP` (reference path)."""

from maggy_spark.bayes import GP

__all__ = ["GP"]
