"""Bayesian optimizer facade (reference `maggy/optimizer/bayes/`):
`GP` (gp.py) and `TPE` (tpe.py) forwarded from maggy_spark.bayes."""

from maggy_spark.bayes import GP, TPE, BaseAsyncBO

__all__ = ["GP", "TPE", "BaseAsyncBO"]
