"""Legacy import path kept for published notebooks and pre-rename
user code (`from maggy.experiment_config import OptimizationConfig`).

The reference renamed this package to `maggy.config` and the class to
`HyperparameterOptConfig`; its own Databricks example notebooks
(`examples/Databricks/*.ipynb`) still use the old path, so this shim
re-exports the current `maggy.config` surface (single source of
truth) under both names.
"""

from maggy.config import *  # noqa: F401,F403 — mirror the current surface
from maggy.config import __all__ as _config_all
from maggy.config import HyperparameterOptConfig

OptimizationConfig = HyperparameterOptConfig

__all__ = [*_config_all, "OptimizationConfig"]
