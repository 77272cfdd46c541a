"""`from maggy.ablation.ablator import AbstractAblator, LOCO`."""

from maggy_spark.ablation import LOCO, AbstractAblator

__all__ = ["AbstractAblator", "LOCO"]
