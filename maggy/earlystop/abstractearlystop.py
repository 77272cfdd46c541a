"""`from maggy.earlystop.abstractearlystop import AbstractEarlyStop`."""

from maggy.earlystop import AbstractEarlyStop

__all__ = ["AbstractEarlyStop"]
