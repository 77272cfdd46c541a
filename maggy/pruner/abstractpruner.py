"""`from maggy.pruner.abstractpruner import AbstractPruner`."""

from maggy.pruner import AbstractPruner

__all__ = ["AbstractPruner"]
