"""Experiment utilities: progress bar (A11), run-id bookkeeping (A12),
TensorBoard hparams sink (S8, import-gated).

Reference: `maggy/util.py:79-94` (30-char progress bar),
`maggy/util.py:216-290` (ML_ID validation / increment / experiment
dir registration), `maggy/tensorboard.py:76-108` (hparams config +
per-trial summaries).
"""

from __future__ import annotations

import json
import os
import time


def progress_bar(done: int, total: int, width: int = 30) -> str:
    """A11: `[====>    ] done/total` (reference util.py:79-94)."""
    total = max(total, 1)
    filled = int(width * min(done, total) / total)
    head = ">" if filled < width else "="
    return "[" + "=" * filled + head + " " * (width - filled) + f"] {done}/{total}"


def validate_ml_id(app_id: str, run_id: int) -> tuple[str, int]:
    """A12: validate/normalize the experiment identity
    (reference util.py:216-240)."""
    if not app_id or not isinstance(app_id, str):
        raise ValueError(f"app_id must be a non-empty string, got {app_id!r}")
    run_id = int(run_id)
    if run_id < 0:
        raise ValueError(f"run_id must be >= 0, got {run_id}")
    return app_id, run_id


def register_environment(app_id: str, run_id: int, base_dir: str) -> str:
    """A12: create the experiment log dir `<base>/<app_id>_<run_id>`
    and stamp metadata (reference util.py:250-290)."""
    app_id, run_id = validate_ml_id(app_id, run_id)
    log_dir = os.path.join(base_dir, f"{app_id}_{run_id}")
    os.makedirs(log_dir, exist_ok=True)
    meta = {"app_id": app_id, "run_id": run_id, "created_at": time.time()}
    with open(os.path.join(log_dir, "experiment.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, sort_keys=True)
    return log_dir


def next_run_id(base_dir: str, app_id: str) -> int:
    """Increment semantics: next unused run id for an app
    (reference util.py:241-249)."""
    if not os.path.isdir(base_dir):
        return 0
    used = []
    prefix = f"{app_id}_"
    for name in os.listdir(base_dir):
        if name.startswith(prefix):
            try:
                used.append(int(name[len(prefix):]))
            except ValueError:
                continue
    return max(used) + 1 if used else 0


def write_tensorboard_hparams(log_dir: str, searchspace, trials: list) -> str | None:
    """S8: TensorBoard hparams summaries. With tensorboard installed,
    writes real hparams-plugin events; otherwise falls back to a
    JSONL sidecar with the same information (and returns its path),
    so the data is never lost to a missing dependency."""
    try:  # pragma: no cover - tensorboard not in this environment
        from tensorboard.plugins.hparams import api as hp  # type: ignore
        import tensorflow as tf  # type: ignore

        with tf.summary.create_file_writer(log_dir).as_default():
            hparams = [hp.HParam(name) for name, _t, _r in searchspace.items()]
            hp.hparams_config(hparams=hparams, metrics=[hp.Metric("metric")])
            for t in trials:
                with tf.summary.create_file_writer(os.path.join(log_dir, t.trial_id)).as_default():
                    hp.hparams({h.name: t.params.get(h.name) for h in hparams})
                    # the metric scalar is what the HParams dashboard
                    # joins against hp.Metric("metric"); without it the
                    # comparison view shows an empty metric column
                    if t.final_metric is not None:
                        tf.summary.scalar("metric", float(t.final_metric), step=1)
        return None
    except ImportError:
        path = os.path.join(log_dir, "hparams.jsonl")
        os.makedirs(log_dir, exist_ok=True)
        with open(path, "w", encoding="utf-8") as f:
            f.write(json.dumps({"searchspace": json.loads(searchspace.json())}) + "\n")
            for t in trials:
                f.write(
                    json.dumps(
                        {
                            "trial_id": t.trial_id,
                            "hparams": {k: v for k, v in t.params.items() if not callable(v)},
                            "metric": t.final_metric,
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )
        return path
