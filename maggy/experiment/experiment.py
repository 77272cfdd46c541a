"""`from maggy.experiment.experiment import lagom` (reference module
path `maggy/experiment/experiment.py:21` — same entry contract)."""

from maggy_spark.experiment import lagom

__all__ = ["lagom"]
