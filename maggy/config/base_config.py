"""`from maggy.config.base_config import BaseConfig` (reference path)."""

from maggy_spark.config import BaseConfig

__all__ = ["BaseConfig"]
