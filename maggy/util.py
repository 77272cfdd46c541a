"""Utility facade (reference `maggy/util.py`): the helpers reference
user code touches, forwarded to maggy_spark or re-expressed. The
Hopsworks-specific environment plumbing (register_environment,
populate_experiment) is engine-internal here — see
maggy_spark/util.py and maggy_spark/experiment.py.
"""

from __future__ import annotations

import json
import time

import os
import shutil

from maggy_spark.util import progress_bar  # noqa: F401
from maggy_spark.util import register_environment as _register_environment_dir
from maggy_spark.util import validate_ml_id as _validate_ml_id_basic

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


# -- reference environment/return plumbing, local-filesystem form --------
#
# The reference routes these through its environment singleton
# (`util.py:110-348`); here the same contracts run against the local
# filesystem so reference user code calling them works unchanged.

_DEFAULT_LOG_BASE = os.environ.get("MAGGY_LOG_DIR", os.path.join(os.getcwd(), "maggy_experiments"))


def set_app_id(app_id) -> None:
    """First-writer-wins app id registration (reference util.py:339-347)."""
    global APP_ID
    if APP_ID is None:
        APP_ID = app_id


def set_ml_id(app_id, run_id) -> None:
    """Stamp the experiment id into the environment (util.py:235-243)."""
    os.environ["ML_ID"] = f"{app_id}_{run_id}"


def validate_ml_id(app_id, run_id):
    """Bump run_id past any previously-registered ML_ID for the same
    app (reference util.py:216-233), then basic validation."""
    prev_ml_id = os.environ.get("ML_ID")
    if prev_ml_id is not None:
        prev_app_id, sep, prev_run_id = prev_ml_id.rpartition("_")
        if not sep:
            raise ValueError(f"Found a previous ML_ID with wrong format: {prev_ml_id}")
        if prev_app_id == str(app_id) and int(prev_run_id) >= int(run_id):
            run_id = int(prev_run_id) + 1
    return _validate_ml_id_basic(str(app_id), run_id)


def register_environment(app_id, run_id):
    """Validate ids, stamp ML_ID, create the experiment directory
    (reference util.py:275-290). Returns the updated (app_id, run_id)."""
    app_id, run_id = validate_ml_id(app_id, run_id)
    set_ml_id(app_id, run_id)
    _register_environment_dir(app_id, run_id, _DEFAULT_LOG_BASE)
    return app_id, run_id


def handle_return_val(return_val, log_dir=None, optimization_key="metric", log_file=None):
    """Validate and persist a training-function return value
    (reference util.py:159-199): scalar or dict containing the
    optimization key; writes `.outputs.json` + `.metric` beside the
    trial log and returns the numeric metric."""
    from maggy.constants import USER_FCT

    if not optimization_key:
        raise ValueError("Optimization key cannot be None.")
    # `is None` / empty-dict, NOT falsiness: a metric of 0 / 0.0 is a
    # legitimate return (the reference's `if not return_val` guard
    # rejects it — a bug this engine's normalize_return already avoids)
    if return_val is None or (isinstance(return_val, dict) and not return_val):
        raise TypeError(
            f"Training function cannot return None or empty (optimization key "
            f"{optimization_key!r}, got {return_val!r})."
        )
    if not isinstance(return_val, USER_FCT.RETURN_TYPES):
        raise TypeError(
            f"Training function must return {USER_FCT.RETURN_TYPES}, got "
            f"{type(return_val).__name__}."
        )
    if isinstance(return_val, dict) and optimization_key not in return_val:
        raise KeyError(
            "Returned dictionary does not contain optimization key with the "
            f"provided name: {optimization_key}"
        )
    if isinstance(return_val, dict):
        opt_val = return_val[optimization_key]
    else:
        opt_val = return_val
        return_val = {optimization_key: opt_val}
    if not isinstance(opt_val, USER_FCT.NUMERIC_TYPES):
        raise TypeError(
            f"The optimization metric `{optimization_key}` must be numeric, got "
            f"{type(opt_val).__name__}."
        )
    if log_file is not None:
        return_val["log"] = str(log_file)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        with open(os.path.join(log_dir, ".outputs.json"), "w", encoding="utf-8") as f:
            f.write(json.dumps(return_val, default=json_default_numpy))
        with open(os.path.join(log_dir, ".metric"), "w", encoding="utf-8") as f:
            f.write(json.dumps(opt_val, default=json_default_numpy))
    return opt_val


def clean_dir(clean_dir, keep=()):
    """Delete everything in a directory except `keep` (util.py:202-213)."""
    if not os.path.isdir(clean_dir):
        raise ValueError(f"{clean_dir} is not a directory.")
    for name in os.listdir(clean_dir):
        path = os.path.join(clean_dir, name)
        if name in keep or path in keep:
            continue
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        else:
            os.remove(path)


def find_spark():
    """Active SparkSession, or None outside Spark (util.py:246-253)."""
    try:
        from pyspark.sql import SparkSession

        return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    except Exception:
        return None


def get_partition_attempt_id():
    """(partitionId, attemptNumber) of the running task, (0, 0) on the
    driver (reference util.py:63-77)."""
    try:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None:
            return ctx.partitionId(), ctx.attemptNumber()
    except Exception:
        pass
    return 0, 0


def num_physical_devices() -> int:
    """Device count via TensorFlow when present (util.py:330-336);
    falls back to 1 (CPU) in TF-less environments like this one."""
    try:
        import tensorflow as tf

        return len(tf.config.list_physical_devices())
    except ImportError:
        return 1


def populate_experiment(config, app_id, run_id, exp_function):
    """Experiment-metadata dict (reference util.py:293-327), local
    form: the fields the reference attaches via its experiments
    service, as a plain dict."""
    return {
        "name": getattr(config, "name", None),
        "function": exp_function,
        "framework": "MAGGY",
        "description": getattr(config, "description", None),
        "app_id": app_id,
        "ml_id": f"{app_id}_{run_id}",
        "direction": getattr(config, "direction", "N/A"),
        "optimization_key": getattr(config, "optimization_key", "N/A"),
        "state": "INIT",
    }


def finalize_experiment(experiment_json, metric, app_id, run_id, state, duration,
                        logdir, best_logdir, optimization_key):
    """Stamp final state into the experiment dict and persist it next
    to the experiment logs (reference util.py:110-131)."""
    experiment_json = dict(experiment_json or {})
    experiment_json.update(
        {
            "metric": metric,
            "state": state,
            "duration": duration,
            "logdir": logdir,
            "best_logdir": best_logdir,
            "optimization_key": optimization_key,
        }
    )
    target_dir = logdir or os.path.join(_DEFAULT_LOG_BASE, f"{app_id}_{run_id}")
    try:
        os.makedirs(target_dir, exist_ok=True)
        with open(os.path.join(target_dir, "experiment.json"), "w", encoding="utf-8") as f:
            f.write(json.dumps(experiment_json, default=json_default_numpy))
    except OSError:
        pass
    return experiment_json
