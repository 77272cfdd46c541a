"""TensorBoard facade (reference `maggy/tensorboard.py:28-108`).

The reference exposes a module users import inside their training
function to find the per-trial TensorBoard directory (`logdir()`) and
that the runtime points at each trial (`_register`). The hparams
writers need tensorflow/tensorboard, which this environment does not
ship, so they degrade to the engine's JSON hparams fallback
(`maggy_spark.util.write_tensorboard_hparams`) instead of raising.
"""

from __future__ import annotations

_tensorboard_dir: str | None = None


def _register(trial_dir: str) -> None:
    """Point the module at a trial's log dir (tensorboard.py:28-31);
    called by the executor before the user function runs."""
    global _tensorboard_dir
    _tensorboard_dir = trial_dir


def logdir() -> str | None:
    """The current trial's TensorBoard directory
    (tensorboard.py:33-37) — users pass this to their own
    tf.summary writers / Keras TensorBoard callback."""
    return _tensorboard_dir


def _write_hparams_config(log_dir: str, searchspace) -> str | None:
    """Experiment-level hparams config (tensorboard.py:75-101):
    tf-gated in the reference; here it forwards to the engine's
    hparams sink, which writes real tensorboard HParams when
    tensorflow is importable and a JSON summary otherwise."""
    from maggy_spark.util import write_tensorboard_hparams

    return write_tensorboard_hparams(log_dir, searchspace, [])


def _write_hparams(hparams: dict, trial_id: str) -> None:
    """Per-trial hparams record (tensorboard.py:104-108): appended as
    JSON next to the registered trial dir when tf is unavailable."""
    if _tensorboard_dir is None:
        return
    import json
    from pathlib import Path

    p = Path(_tensorboard_dir)
    p.mkdir(parents=True, exist_ok=True)
    with open(p / "hparams.json", "w") as f:
        json.dump({"trial_id": trial_id, "hparams": hparams}, f, default=str)
