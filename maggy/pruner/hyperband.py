"""`from maggy.pruner.hyperband import Hyperband, SHIteration`."""

from maggy_spark.pruner import SHIteration
from maggy.pruner import Hyperband

__all__ = ["Hyperband", "SHIteration"]
