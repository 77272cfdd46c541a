"""`from maggy.optimizer.bayes.base import BaseAsyncBO` (reference path)."""

from maggy_spark.bayes import BaseAsyncBO

__all__ = ["BaseAsyncBO"]
