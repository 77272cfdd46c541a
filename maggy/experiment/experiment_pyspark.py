"""Spark-backed experiment entry (reference
`maggy/experiment/experiment_pyspark.py`). In this engine every lagom
run is Spark-backed, so `lagom` is the one entry point; `lagom_driver`
keeps the reference's dispatch-validation behavior for callers that
used it directly."""

from maggy_spark.config import (
    AblationConfig,
    BaseConfig,
    HyperparameterOptConfig,
    TfDistributedConfig,
    TorchDistributedConfig,
)
from maggy_spark.experiment import lagom


def lagom_driver(config, app_id=None, run_id=None):
    """Validate the config the way the reference dispatcher does
    (`experiment_pyspark.py:83-99`): a recognized config type selects
    a driver; anything else raises TypeError. The engine has a single
    driver, so this returns the lagom callable bound to the config."""
    if not isinstance(
        config,
        (HyperparameterOptConfig, AblationConfig, TorchDistributedConfig, TfDistributedConfig, BaseConfig),
    ):
        raise TypeError(
            "Invalid config type! LagomConfig is expected to be of type "
            f"{HyperparameterOptConfig}, {AblationConfig}, {TorchDistributedConfig} "
            f"or {TfDistributedConfig}, but is of type {type(config)}"
        )
    return lambda train_fn, spark=None: lagom(train_fn, config, spark)


__all__ = ["lagom", "lagom_driver"]
