"""Reference-API compatibility: user code written against
logicalclocks/maggy runs unchanged through the facade package."""

import pytest


def test_reference_imports():
    # the exact import shapes from the reference's README/tests
    from maggy import Searchspace
    from maggy.config import HyperparameterOptConfig, LagomConfig
    from maggy.ablation import AblationStudy
    from maggy.callbacks import KerasBatchEnd, KerasEpochEnd
    from maggy.searchspace import Searchspace as S2
    from maggy.trial import Trial
    from maggy import experiment

    assert S2 is Searchspace
    assert callable(experiment.lagom)
    assert LagomConfig is not None


def test_reference_searchspace_surface():
    from maggy import Searchspace

    # reference test_searchspace shapes: kwargs of (type, region) tuples
    sp = Searchspace(kernel=("INTEGER", [2, 8]), pool=("INTEGER", [2, 8]))
    sp.add("dropout", ("DOUBLE", [0.01, 0.99]))  # reference add(name, tuple)
    assert sp.names() == {"kernel": "INTEGER", "pool": "INTEGER", "dropout": "DOUBLE"}
    # attribute access to regions
    assert sp.dropout == [0.01, 0.99]
    # get with default
    assert sp.get("kernel") == [2, 8]
    assert sp.get("missing", "fallback") == "fallback"
    # to_dict / values / keys
    assert sp.to_dict()["dropout"] == ("DOUBLE", [0.01, 0.99])
    assert sp.values()[0] == ("INTEGER", [2, 8])
    assert sp.keys() == ["kernel", "pool", "dropout"]
    # dict-style iteration (reference __next__ dicts)
    items = list(sp)
    assert items[0]["name"] == "kernel" and items[0]["type"] == "INTEGER"
    assert items[2]["values"] == [0.01, 0.99]
    # AND engine-style triple unpacking still works
    name, t, region = items[0]
    assert (name, t, region) == ("kernel", "INTEGER", [2, 8])


def test_reference_e2e_shape(spark):
    """The reference's own e2e test shape (test_randomsearch.py:66-100)
    written as a reference user would, via the facade."""
    from maggy import Searchspace, experiment
    from maggy.config import HyperparameterOptConfig

    def train_fn(kernel, pool, dropout, reporter):
        import random

        acc = random.Random(kernel * 100 + pool * 10 + int(dropout * 10)).random()
        reporter.broadcast(acc, 0)
        reporter.log("validation loss reported")
        return acc

    sp = Searchspace(
        kernel=("INTEGER", [2, 8]), pool=("INTEGER", [2, 8]), dropout=("DOUBLE", [0.01, 0.99])
    )
    config = HyperparameterOptConfig(
        num_trials=5, optimizer="randomsearch", searchspace=sp,
        direction="max", es_policy="none", name="test_experiment", seed=42,
    )
    result = experiment.lagom(train_fn, config, spark)
    assert isinstance(result, dict)  # the reference asserts exactly this
    assert result["num_trials"] == 5
    assert {"best_id", "best_val", "worst_val", "avg", "best_config"} <= set(result)


def test_reference_ablation_shape(spark):
    from maggy import experiment
    from maggy.ablation import AblationStudy
    from maggy.config import AblationConfig
    from tests.test_bayes_ablation_dist import make_study

    study = make_study()  # uses the facade-compatible AblationStudy
    assert isinstance(study, AblationStudy)

    def train_fn(dataset_function, label_name):
        return float(len(dataset_function()))

    res = experiment.lagom(train_fn, AblationConfig(ablation_study=study, direction="max"), spark)
    assert res["num_trials"] == 4


def test_facade_module_surface():
    """Every module path the reference exports resolves (VERDICT
    missing-items 4/5: tensorboard, constants, util facades; plus
    earlystop/optimizer/pruner packages)."""
    import numpy as np

    from maggy import constants, tensorboard, util, version
    from maggy.earlystop import AbstractEarlyStop, MedianStoppingRule, NoStoppingRule
    from maggy.optimizer import GP, TPE, Asha, GridSearch, RandomSearch, SingleRun
    from maggy.optimizer.bayes import GP as GP2
    from maggy.pruner import Hyperband

    assert GP is GP2
    assert float in constants.USER_FCT.RETURN_TYPES
    assert dict in constants.USER_FCT.RETURN_TYPES
    assert isinstance(np.float64(1.0), constants.USER_FCT.NUMERIC_TYPES)
    assert version.__version__.startswith("1.1.2")
    assert callable(tensorboard.logdir)
    assert util.seconds_to_milliseconds(1.5) == 1500
    assert util.time_diff(0, 3725) == "1h 2m 5s"
    assert util.get_metric_value({"acc": 3}, "acc") == 3
    assert util.get_metric_value(2.5, None) == 2.5
    assert util.json_default_numpy(np.int64(3)) == 3
    assert issubclass(MedianStoppingRule, AbstractEarlyStop)
    assert MedianStoppingRule.POLICY == "median" and NoStoppingRule.POLICY == "none"
    assert Hyperband(1, 9, 3, 1).budgets == [1, 3, 9]
    assert {RandomSearch, GridSearch, Asha, SingleRun, TPE} and True


def test_es_policy_accepts_rule_class(spark):
    """Reference config passes rule CLASSES/instances, not strings."""
    from maggy import Searchspace, experiment
    from maggy.config import HyperparameterOptConfig
    from maggy.earlystop import MedianStoppingRule

    def fn(x, reporter):
        for step in range(3):
            reporter.broadcast(x, step)
        return x

    config = HyperparameterOptConfig(
        num_trials=4, optimizer="randomsearch",
        searchspace=Searchspace(x=("DOUBLE", [0.0, 1.0])),
        direction="max", es_policy=MedianStoppingRule(), es_min=2, seed=1,
    )
    res = experiment.lagom(fn, config, spark)
    assert res["num_trials"] == 4


def test_tensorboard_logdir_inside_train_fn(spark):
    """`from maggy import tensorboard; tensorboard.logdir()` works
    inside the user function (reference tensorboard.py:28-37)."""
    from maggy import Searchspace, experiment
    from maggy.config import HyperparameterOptConfig

    def fn(x, reporter):
        from maggy import tensorboard

        ld = tensorboard.logdir()
        return 1.0 if ld else 0.0

    config = HyperparameterOptConfig(
        num_trials=3, optimizer="randomsearch",
        searchspace=Searchspace(x=("DOUBLE", [0.0, 1.0])),
        direction="max", es_policy="none", seed=3, name="tb_exp",
    )
    res = experiment.lagom(fn, config, spark)
    assert res["best_val"] == 1.0 and res["worst_val"] == 1.0


def test_lagom_config_is_optional_like_reference(spark):
    """The reference entry point defaults config=None to a base
    single-run (`experiment/experiment.py:21-41`), so the README
    quick-start `experiment.lagom(train_fn=fn)` must run unchanged."""
    from maggy import experiment

    def train_fn(reporter):
        acc = 0.0
        for _ in range(3):
            acc += 0.3
            reporter.broadcast(metric=acc)
        return acc

    res = experiment.lagom(train_fn=train_fn)
    assert abs(res["test result"] - 0.9) < 1e-9


def test_distributed_config_reference_constructor_shapes():
    """Every constructor field from the reference's distributed
    configs (`config/tf_distributed.py:27-37`,
    `config/torch_distributed.py:33-45`) must be accepted, so doc
    and notebook call sites construct unchanged (execution is
    import-gated on the frameworks)."""
    from maggy.config import TfDistributedConfig, TorchDistributedConfig

    tf_c = TfDistributedConfig(
        model=object, dataset=["train", "test"], process_data=None,
        mixed_precision=True, name="tfDist", hb_interval=1,
        description="", hparams={"nlayers": 2},
    )
    assert tf_c.hparams == {"nlayers": 2} and tf_c.mixed_precision

    t_c = TorchDistributedConfig(
        module=object, dataset=["train"], hparams={"lr": 0.1},
        backend="deepspeed", mixed_precision=False, zero_lvl=2,
        deepspeed_config={"train_batch_size": 8}, name="torchDist",
    )
    assert t_c.backend == "deepspeed" and t_c.zero_lvl == 2


def test_lagom_readme_name_kwarg(spark):
    """The reference README's `lagom(train_fn=fn, name='MNIST')` —
    extras feed the default BaseConfig when no config is given."""
    import pytest

    from maggy import experiment
    from maggy.config import BaseConfig

    def train_fn(reporter):
        reporter.broadcast(metric=1.0)
        return 1.0

    res = experiment.lagom(train_fn=train_fn, name="MNIST")
    assert res["test result"] == 1.0
    with pytest.raises(TypeError):
        experiment.lagom(train_fn=train_fn, config=BaseConfig(), name="clash")


def test_legacy_experiment_config_import_path(spark):
    """The reference's published Databricks notebooks import from the
    pre-rename path `maggy.experiment_config` with the old class name
    `OptimizationConfig`; the shim keeps them runnable."""
    from maggy import Searchspace, experiment
    from maggy.experiment_config import OptimizationConfig
    from maggy.experiment_config.tf_distributed import TfDistributedConfig

    assert TfDistributedConfig(name="tf_test", model=object, hparams={}).name == "tf_test"

    sp = Searchspace(number_layers=("INTEGER", [2, 8]))
    config = OptimizationConfig(
        num_trials=4, optimizer="randomsearch", searchspace=sp,
        direction="max", es_interval=1, es_min=5, name="hp_tuning_test",
    )

    def hpo_function(number_layers, reporter):
        reporter.broadcast(metric=float(number_layers))
        return float(number_layers)

    result = experiment.lagom(train_fn=hpo_function, config=config)
    assert result["num_trials"] == 4 and result["best_val"] is not None


def test_distributed_hparams_delivered_to_train_fn(spark):
    """config.hparams is the reference's model-init interface
    (`tf_distributed.py:36,48-49`): the dict must reach a train_fn
    declaring `hparams`, and individual names must inject too."""
    from maggy import experiment
    from maggy.config import TfDistributedConfig

    def train_fn(model, hparams, reporter):
        assert hparams == {"nlayers": 3}
        return float(hparams["nlayers"])

    res = experiment.lagom(
        train_fn, TfDistributedConfig(model="M", hparams={"nlayers": 3}, num_workers=2), spark
    )
    assert res["errors"] is None and res["test result"] == 3.0

    def by_name(model, nlayers, reporter):
        return float(nlayers)

    res2 = experiment.lagom(
        by_name, TfDistributedConfig(model="M", hparams={"nlayers": 4}, num_workers=2), spark
    )
    assert res2["errors"] is None and res2["test result"] == 4.0


def test_torch_backend_validation():
    import pytest

    from maggy.config import TorchDistributedConfig
    from maggy.experiment_config.torch_distributed import TorchDistributedConfig as LegacyTorch

    assert LegacyTorch is TorchDistributedConfig
    assert TorchDistributedConfig(backend="deepspeed").process_group_backend == "gloo"
    # a process-group name in `backend` (this engine's own pre-rename
    # field meaning) remaps instead of breaking old call sites
    legacy = TorchDistributedConfig(backend="nccl")
    assert legacy.backend == "torch" and legacy.process_group_backend == "nccl"
    with pytest.raises(ValueError):
        TorchDistributedConfig(backend="horovod")  # unknown stays rejected


def test_package_level_lagom_matches_experiment_signature(spark):
    """maggy_spark.lagom (the package's own advertised entry point)
    must accept the same optional-config/kwargs shapes."""
    import maggy_spark

    def train_fn(reporter):
        reporter.broadcast(metric=2.0)
        return 2.0

    assert maggy_spark.lagom(train_fn, name="pkg_entry")["test result"] == 2.0


def test_experiment_submodule_paths():
    """Reference module paths under maggy.experiment resolve."""
    import pytest

    from maggy.experiment import lagom as l0
    from maggy.experiment.experiment import lagom as l1
    from maggy.experiment.experiment_pyspark import lagom as l2
    from maggy.experiment.experiment_pyspark import lagom_driver
    from maggy.experiment.experiment_python import lagom as l3

    assert l0 is l1 is l2 is l3
    with pytest.raises(TypeError):
        lagom_driver("not-a-config")
