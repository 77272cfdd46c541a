"""`from maggy.config.tf_distributed import TfDistributedConfig`."""

from maggy_spark.config import TfDistributedConfig

__all__ = ["TfDistributedConfig"]
