"""Legacy import path kept for published notebooks and pre-rename
user code (`from maggy.experiment_config import OptimizationConfig`).

The reference renamed this package to `maggy.config` and the class to
`HyperparameterOptConfig`; its own Databricks example notebooks
(`examples/Databricks/*.ipynb`) still use the old path, so this shim
re-exports the current classes under both names.
"""

from maggy_spark.config import (
    AblationConfig,
    BaseConfig,
    HyperparameterOptConfig,
    TfDistributedConfig,
    TorchDistributedConfig,
)

LagomConfig = BaseConfig
OptimizationConfig = HyperparameterOptConfig

__all__ = [
    "AblationConfig",
    "BaseConfig",
    "LagomConfig",
    "OptimizationConfig",
    "HyperparameterOptConfig",
    "TfDistributedConfig",
    "TorchDistributedConfig",
]
