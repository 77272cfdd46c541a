"""Trial-side reporter: the user-facing metric broadcast API.

Reference: `maggy/core/reporter.py:77-162` — `broadcast(metric,
step)` appends to the trial's metric stream (steps must be numeric
and monotonically increasing, duplicates dropped) and surfaces early
stopping by raising inside the user function at the next broadcast
(`reporter.py:100-101`) — Spark cannot interrupt a running UDF, so
cooperative cancellation at broadcast points is both the reference's
contract and ours (SURVEY.md §7.3a).
"""

from __future__ import annotations

import numbers


class EarlyStopException(Exception):
    """Raised inside the user train_fn when the trial is stopped early;
    carries the last reported metric (reference
    `core/exceptions.py:70-80`)."""

    def __init__(self, metric: float | None = None):
        super().__init__("trial stopped early")
        self.metric = metric


class BadStepException(Exception):
    """Non-numeric or non-increasing step (reference
    `core/exceptions.py:83-107`)."""


class Reporter:
    """Collects (step, value) pairs; checks a stop predicate at each
    broadcast. The stop predicate is evaluated locally in the trial
    UDF (e.g. a median-rule bar broadcast from the driver)."""

    def __init__(self, stop_check=None):
        self.metric_history: list[float] = []
        self.step_history: list[int] = []
        self.logs: list[str] = []
        self._stop_check = stop_check
        self.early_stopped = False

    def broadcast(self, metric, step=None):
        if metric is None:
            return
        if not isinstance(metric, numbers.Number):
            raise BadStepException(f"metric must be numeric, got {type(metric).__name__}")
        if step is None:
            step = self.step_history[-1] + 1 if self.step_history else 0
        if not isinstance(step, numbers.Number):
            raise BadStepException(f"step must be numeric, got {type(step).__name__}")
        step = int(step)
        if self.step_history and step <= self.step_history[-1]:
            if step in self.step_history:
                return  # duplicate step: dropped (trial.py:98-101)
            raise BadStepException(f"step {step} regressed below {self.step_history[-1]}")
        self.metric_history.append(float(metric))
        self.step_history.append(step)
        if self._stop_check is not None and self._stop_check(self.step_history, self.metric_history):
            self.early_stopped = True
            raise EarlyStopException(float(metric))

    def log(self, msg: str, verbose: bool = True) -> None:
        self.logs.append(str(msg))
