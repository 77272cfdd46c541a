"""`from maggy import experiment; experiment.lagom(train_fn, config)`."""

from maggy_spark.experiment import lagom

__all__ = ["lagom"]
