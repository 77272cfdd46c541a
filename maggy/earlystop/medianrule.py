"""`from maggy.earlystop.medianrule import MedianStoppingRule`."""

from maggy.earlystop import MedianStoppingRule

__all__ = ["MedianStoppingRule"]
