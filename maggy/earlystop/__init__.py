"""Early-stop rule facade (reference `maggy/earlystop/__init__.py`).

The engine's early stopping is policy-by-name ("median" / "none",
evaluated trial-locally — SURVEY §7.3a); these classes keep the
reference's import and config shape: passing `MedianStoppingRule` (the
class or an instance) as `es_policy` selects the median rule.
"""

from __future__ import annotations


class AbstractEarlyStop:
    """Marker base (reference abstractearlystop.py)."""

    POLICY: str | None = None


class MedianStoppingRule(AbstractEarlyStop):
    """Median rule (reference medianrule.py:24-59): stop a trial whose
    running average at step s falls below the median of completed
    trials' averages at s."""

    POLICY = "median"


class NoStoppingRule(AbstractEarlyStop):
    """Never stops (reference nostop.py)."""

    POLICY = "none"


__all__ = ["AbstractEarlyStop", "MedianStoppingRule", "NoStoppingRule"]
