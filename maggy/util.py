"""Utility facade (reference `maggy/util.py`): the helpers reference
user code touches, forwarded to maggy_spark or re-expressed. The
Hopsworks-specific environment plumbing (register_environment,
populate_experiment) is engine-internal here — see
maggy_spark/util.py and maggy_spark/experiment.py.
"""

from __future__ import annotations

import json
import time

from maggy_spark.util import progress_bar, validate_ml_id  # noqa: F401

DEBUG = True
APP_ID = None


def log(msg) -> None:
    """Debug print (reference util.py:39-47)."""
    if DEBUG:
        print(msg)


def num_executors(sc) -> int:
    """Cluster parallelism (reference util.py:50-60): executor count
    from the SparkContext, defaultParallelism in local mode."""
    try:
        return int(sc._jsc.sc().getExecutorMemoryStatus().size())
    except Exception:
        return int(sc.defaultParallelism)


def json_default_numpy(obj):
    """JSON encoder hook for numpy scalars/arrays (util.py:97-107)."""
    import numpy as np

    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    raise TypeError(f"Object of type {type(obj)} is not JSON serializable")


def seconds_to_milliseconds(t: float) -> int:
    """(util.py:256-260)"""
    return int(round(t * 1000))


def time_diff(t0: float, t1: float) -> str:
    """Human-readable duration (util.py:263-272)."""
    minutes, seconds = divmod(t1 - t0, 60)
    hours, minutes = divmod(minutes, 60)
    return f"{int(hours)}h {int(minutes)}m {int(seconds)}s"


def get_metric_value(return_dict, metric_key):
    """Pull the optimization metric out of a user return value
    (util.py:350-366)."""
    if metric_key is not None and isinstance(return_dict, dict):
        if metric_key not in return_dict:
            raise ValueError(f"Metric {metric_key!r} not in return dict {return_dict!r}")
        return return_dict[metric_key]
    if isinstance(return_dict, dict):
        return return_dict.get("metric")
    return return_dict


def build_summary_json(logdir: str) -> str:
    """Summarize per-trial artifact dirs under `logdir` into one JSON
    blob (util.py:134-147): reads each trial's result/hparams files
    written by the engine's sinks."""
    from pathlib import Path

    combined = []
    for trial_dir in sorted(Path(logdir).glob("*")):
        if not trial_dir.is_dir():
            continue
        entry: dict = {"trial_id": trial_dir.name}
        for name in ("result.json", "hparams.json", "trial.json"):
            f = trial_dir / name
            if f.exists():
                try:
                    entry[name.split(".")[0]] = json.loads(f.read_text())
                except (json.JSONDecodeError, OSError):
                    pass
        combined.append(entry)
    return json.dumps({"experiment_results": combined}, default=json_default_numpy)


def current_time_millis() -> int:
    return seconds_to_milliseconds(time.time())
