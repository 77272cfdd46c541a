"""`from maggy.earlystop.nostop import NoStoppingRule`."""

from maggy.earlystop import NoStoppingRule

__all__ = ["NoStoppingRule"]
