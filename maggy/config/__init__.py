"""Config classes under the reference's import path
(`from maggy.config import HyperparameterOptConfig`, ...)."""

from maggy_spark.config import (
    AblationConfig,
    BaseConfig,
    HyperparameterOptConfig,
    TfDistributedConfig,
    TorchDistributedConfig,
)

# the reference also exposes LagomConfig as the base name
LagomConfig = BaseConfig

__all__ = [
    "AblationConfig",
    "BaseConfig",
    "LagomConfig",
    "HyperparameterOptConfig",
    "TfDistributedConfig",
    "TorchDistributedConfig",
]
