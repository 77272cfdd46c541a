"""Legacy module path (`from maggy.experiment_config.torch_distributed
import TorchDistributedConfig`) — the torch twin of the tf shim."""

from maggy_spark.config import TorchDistributedConfig

__all__ = ["TorchDistributedConfig"]
