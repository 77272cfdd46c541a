"""`from maggy.config.ablation import AblationConfig` (reference path)."""

from maggy_spark.config import AblationConfig

__all__ = ["AblationConfig"]
