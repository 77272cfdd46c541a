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
