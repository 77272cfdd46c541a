"""`from maggy.ablation.ablator.loco import LOCO` (reference module path)."""

from maggy_spark.ablation import LOCO

__all__ = ["LOCO"]
