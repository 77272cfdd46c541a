"""`from maggy.ablation.ablator.abstractablator import AbstractAblator`."""

from maggy_spark.ablation import AbstractAblator

__all__ = ["AbstractAblator"]
