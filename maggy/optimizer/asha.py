"""`from maggy.optimizer.asha import Asha` (reference path)."""

from maggy_spark.optimizers import Asha

__all__ = ["Asha"]
