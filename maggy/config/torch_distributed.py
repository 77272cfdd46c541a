"""`from maggy.config.torch_distributed import TorchDistributedConfig`."""

from maggy_spark.config import TorchDistributedConfig

__all__ = ["TorchDistributedConfig"]
