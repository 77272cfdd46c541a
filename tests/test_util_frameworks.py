"""util (A11/A12, S8 fallback) and import-gated framework wrappers."""

import json
import os

import pytest

from maggy_spark import Searchspace, Trial
from maggy_spark.frameworks import (
    distributed_dataloader,
    sanitize_ds_config,
    wrap_torch_ddp,
    zero_optimizer,
)
from maggy_spark.util import (
    next_run_id,
    progress_bar,
    register_environment,
    validate_ml_id,
    write_tensorboard_hparams,
)


def test_progress_bar_shape():
    assert progress_bar(0, 10) == "[>" + " " * 30 + "] 0/10"
    assert progress_bar(10, 10).startswith("[" + "=" * 30)
    assert progress_bar(5, 10).count("=") == 15


def test_run_id_bookkeeping(tmp_path):
    base = str(tmp_path)
    assert next_run_id(base, "app1") == 0
    d0 = register_environment("app1", 0, base)
    assert os.path.isdir(d0)
    with open(os.path.join(d0, "experiment.json")) as f:
        assert json.load(f)["run_id"] == 0
    assert next_run_id(base, "app1") == 1
    register_environment("app1", 1, base)
    assert next_run_id(base, "app1") == 2
    assert next_run_id(base, "other_app") == 0


def test_validate_ml_id_rejects_bad():
    with pytest.raises(ValueError):
        validate_ml_id("", 0)
    with pytest.raises(ValueError):
        validate_ml_id("app", -1)


def test_tensorboard_fallback(tmp_path):
    sp = Searchspace(x=("DOUBLE", [0, 1]))
    t = Trial({"x": 0.5})
    t.finalize(1.0)
    path = write_tensorboard_hparams(str(tmp_path), sp, [t])
    # tensorboard absent in this env -> JSONL sidecar
    assert path and path.endswith("hparams.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["searchspace"]["x"][0] == "DOUBLE"
    assert lines[1]["trial_id"] == t.trial_id and lines[1]["metric"] == 1.0


def test_frameworks_gated():
    # torch is absent here: factories must raise informative ImportError
    with pytest.raises(ImportError, match="torch"):
        wrap_torch_ddp(object())
    with pytest.raises(ImportError, match="torch"):
        distributed_dataloader(object(), 8, 0, 2)
    with pytest.raises(ImportError, match="torch"):
        zero_optimizer([])


def test_sanitize_ds_config():
    cfg = {"optimizer": {"type": "Adam", "params": {}}}
    out = sanitize_ds_config(cfg, zero_lvl=3)
    assert out["zero_optimization"]["stage"] == 3
    assert out["optimizer"]["params"]["torch_adam"] is True
    with pytest.raises(ValueError):
        sanitize_ds_config({"optimizer": {"type": "SGD"}})
    with pytest.raises(ValueError):
        sanitize_ds_config("not a dict")
