"""Framework reporting callbacks (E5).

Reference: `maggy/callbacks.py:20-66` — `KerasBatchEnd` broadcasts
`logs[metric]` at each batch end, `KerasEpochEnd` at each epoch with
step=epoch. These are thin shims from a framework's callback API to
`reporter.broadcast`; they import keras lazily so the engine has no
hard TF dependency (none exists in this container — the fallback
base class keeps the same interface for any object exposing
`on_batch_end` / `on_epoch_end` hooks).
"""

from __future__ import annotations

try:  # pragma: no cover - tensorflow not present in this environment
    from tensorflow.keras.callbacks import Callback as _KerasCallback  # type: ignore
except ImportError:
    class _KerasCallback:  # minimal stand-in with the keras hook names
        def set_params(self, params):
            self.params = params

        def set_model(self, model):
            self.model = model


class KerasBatchEnd(_KerasCallback):
    """Broadcast a metric from `logs` at the end of every batch."""

    def __init__(self, reporter, metric: str = "loss"):
        super().__init__()
        self.reporter = reporter
        self.metric = metric
        self._step = 0

    def on_batch_end(self, batch, logs=None):
        logs = logs or {}
        if self.metric in logs:
            self.reporter.broadcast(float(logs[self.metric]), self._step)
            self._step += 1


class KerasEpochEnd(_KerasCallback):
    """Broadcast a metric from `logs` at the end of every epoch, with
    step=epoch (reference `callbacks.py:45-66`)."""

    def __init__(self, reporter, metric: str = "val_loss"):
        super().__init__()
        self.reporter = reporter
        self.metric = metric

    def on_epoch_end(self, epoch, logs=None):
        logs = logs or {}
        if self.metric in logs:
            self.reporter.broadcast(float(logs[self.metric]), int(epoch))
