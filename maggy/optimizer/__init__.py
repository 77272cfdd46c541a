"""Optimizer facade (reference `maggy/optimizer/__init__.py`): the
reference's public controller names, forwarded to maggy_spark."""

from maggy_spark.bayes import GP, TPE
from maggy_spark.optimizers import (
    AbstractOptimizer,
    Asha,
    GridSearch,
    RandomSearch,
    SingleRun,
)

from maggy.optimizer import bayes  # noqa: F401  (module-shaped alias)

__all__ = ["AbstractOptimizer", "RandomSearch", "Asha", "SingleRun", "GridSearch", "GP", "TPE"]
