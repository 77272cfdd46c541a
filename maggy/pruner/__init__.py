"""Pruner facade (reference `maggy/pruner/__init__.py`): the
reference exports `Hyperband`; the engine's implementation is
maggy_spark.pruner.HyperbandPruner (same pruning_routine contract,
pruner/hyperband.py:137-195)."""

from maggy_spark.pruner import HyperbandPruner
from maggy_spark.pruner import HyperbandPruner as Hyperband

__all__ = ["Hyperband", "HyperbandPruner"]
