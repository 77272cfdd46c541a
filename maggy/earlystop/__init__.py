"""Early-stop rule facade (reference `maggy/earlystop/__init__.py`).

The engine's built-in early stopping is policy-by-name ("median" /
"none", evaluated trial-locally — SURVEY §7.3a); these classes keep
the reference's import and config shape: passing `MedianStoppingRule`
(the class or an instance) as `es_policy` selects the median rule.

A CUSTOM rule subclasses AbstractEarlyStop and implements the static
``earlystop_check(to_check, finalized_trials, direction)`` contract
(reference `abstractearlystop.py:20-40`); the engine cloudpickles the
check into the trial-local stop source and stops the trial whenever
it returns non-None.
"""

from __future__ import annotations

import statistics


class AbstractEarlyStop:
    """Rule base (reference abstractearlystop.py:20-40). Subclass and
    implement `earlystop_check`; pass the class or an instance as
    `es_policy`."""

    POLICY: str | None = None

    @staticmethod
    def earlystop_check(to_check, finalized_trials, direction):
        raise NotImplementedError("implement earlystop_check(to_check, finalized_trials, direction)")


class MedianStoppingRule(AbstractEarlyStop):
    """Median rule (reference medianrule.py:24-59): stop a trial whose
    best metric falls on the wrong side of the median of completed
    trials' prefix averages at the same step."""

    POLICY = "median"

    @staticmethod
    def earlystop_check(to_check, finalized_trials, direction):
        step = len(to_check.metric_history)
        if step == 0:
            return None
        averages = [
            sum(t.metric_history[:step]) / float(step)
            for t in finalized_trials
            if len(t.metric_history) >= step
        ]
        if not averages:
            return None
        median = statistics.median(averages)
        if direction == "max" and max(to_check.metric_history) < median:
            return to_check.trial_id
        if direction == "min" and min(to_check.metric_history) > median:
            return to_check.trial_id
        return None


class NoStoppingRule(AbstractEarlyStop):
    """Never stops (reference nostop.py)."""

    POLICY = "none"

    @staticmethod
    def earlystop_check(to_check, finalized_trials, direction):
        return None


__all__ = ["AbstractEarlyStop", "MedianStoppingRule", "NoStoppingRule"]
