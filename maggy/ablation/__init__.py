"""`from maggy.ablation import AblationStudy`."""

from maggy_spark.ablation import AblationStudy

__all__ = ["AblationStudy"]
