"""Ablation studies: LOCO (leave-one-component-out).

Reference: `maggy/ablation/ablationstudy.py:18-408` (feature set,
layer set, layer groups, custom model generators) and the LOCO
ablator (`maggy/ablation/ablator/loco.py:31-261`): n+1 trials — the
base trial plus one per included component; feature trials drop one
dataset column, layer trials drop one model layer (by name, group,
or prefix).

Rebuild: the component inventory is a relational `components` table
(FIXTURES.md F4); the trial list is a UNION ALL projection over it
(operator G11); feature ablation is `.drop(column)` — i.e. column
pruning, which parquet gives us for free; the ablated training table
is read executor-side via pyarrow inside the trial UDF (the
dataset_function contract, `loco.py:222-230`).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from maggy_spark.config import AblationConfig
from maggy_spark.executor import run_trial_wave
from maggy_spark.trial import Trial


class _IncludeSet:
    """Insertion-ordered include/exclude collection (reference
    `ablationstudy.py:160-225` Features API)."""

    def __init__(self) -> None:
        self._items: list[str] = []

    def include(self, *names) -> None:
        for n in names:
            for item in (n if isinstance(n, (list, tuple)) else [n]):
                if not isinstance(item, str):
                    raise ValueError(f"component names must be strings, got {item!r}")
                if item not in self._items:
                    self._items.append(item)

    def exclude(self, *names) -> None:
        for n in names:
            for item in (n if isinstance(n, (list, tuple)) else [n]):
                if item in self._items:
                    self._items.remove(item)

    def list_all(self) -> list[str]:
        return list(self._items)

    @property
    def included_features(self) -> set[str]:
        """Reference attribute shape (`ablationstudy.py:162`)."""
        return set(self._items)

    def __len__(self) -> int:
        return len(self._items)

    def __iter__(self):
        return iter(self._items)


class _Layers(_IncludeSet):
    """Layers + layer groups + prefix groups (`ablationstudy.py:253-408`)."""

    def __init__(self) -> None:
        super().__init__()
        self._groups: list[frozenset[str]] = []
        self._prefixes: list[str] = []

    def include_groups(self, *groups, prefix: str | None = None) -> None:
        if prefix is not None:
            if not isinstance(prefix, str):
                raise ValueError(
                    "`prefix` argument of layers.include_groups() should either be "
                    f"a `NoneType` or a `str`, got {prefix!r}"
                )
            if prefix not in self._prefixes:
                self._prefixes.append(prefix)
        for g in groups:
            if not isinstance(g, (list, tuple, set, frozenset)) or len(g) < 2:
                raise ValueError("a layer group needs >= 2 layer names (ablationstudy.py:306-347)")
            fs = frozenset(g)
            if fs not in self._groups:
                self._groups.append(fs)

    def exclude_groups(self, *groups, prefix: str | None = None) -> None:
        """Remove previously-included groups / prefix groups
        (reference `ablationstudy.py:349-385`)."""
        if prefix is not None:
            if not isinstance(prefix, str):
                raise ValueError(
                    "`prefix` argument of layers.exclude_groups() should either be "
                    f"a `NoneType` or a `str`, got {prefix!r}"
                )
            if prefix in self._prefixes:
                self._prefixes.remove(prefix)
        for g in groups:
            if not isinstance(g, (list, tuple, set, frozenset)):
                raise ValueError("layers.exclude_groups() takes lists of layer names")
            fs = frozenset(g)
            if fs in self._groups:
                self._groups.remove(fs)

    def list_groups(self) -> list[list[str]]:
        return [sorted(g) for g in self._groups]

    def list_prefixes(self) -> list[str]:
        return list(self._prefixes)

    @property
    def included_layers(self) -> set[str]:
        """Reference attribute shape (`ablationstudy.py:255`)."""
        return set(self._items)

    @property
    def included_groups(self) -> set[frozenset]:
        """Reference encoding (`ablationstudy.py:256,306-347`): each
        explicit group is a frozenset of layer names; a prefix group
        is a singleton frozenset holding the prefix."""
        return set(self._groups) | {frozenset([p]) for p in self._prefixes}

    def print_all(self) -> None:
        """(reference `ablationstudy.py:387-394`)"""
        if self._items:
            print("Included single layers are: \n")
            for layer in self._items:
                print(layer)
        else:
            print("There are no single layers in this ablation study configuration.")

    def print_all_groups(self) -> None:
        """(reference `ablationstudy.py:396-408`)"""
        if self._groups or self._prefixes:
            print("Included layer groups are: \n")
            for group in self._groups:
                print("--- Layer group " + str(sorted(group)))
            for prefix in self._prefixes:
                print(f'---- All layers prefixed "{prefix}"')
        else:
            print("There are no layer groups in this ablation study configuration.")


class _Model:
    """Model-side ablation declarations (reference
    `ablationstudy.py:228-250`): layer sets plus base/custom model
    generators."""

    def __init__(self) -> None:
        self.layers = _Layers()
        self.base_model_generator: Callable | None = None
        self.custom_model_generators: list[tuple[Callable, str]] = []

    def set_base_model_generator(self, base_model_generator: Callable) -> None:
        self.base_model_generator = base_model_generator

    def add_custom_model_generator(self, custom_model_generator: Callable, model_identifier: str) -> None:
        self.custom_model_generators.append((custom_model_generator, model_identifier))


class AblationStudy:
    """Declares what to ablate (reference `ablationstudy.py:18-157`).

    Constructor takes the reference's positional shape
    ``(training_dataset_name, training_dataset_version, label_name)``;
    in this engine the dataset name doubles as a parquet path (or pass
    ``training_dataset_path=`` explicitly) and feature trials read it
    with the ablated column pruned.
    """

    def __init__(
        self,
        training_dataset_name: str | None = None,
        training_dataset_version: int | None = None,
        label_name: str | None = None,
        *,
        training_dataset_path: str | None = None,
        **kwargs,
    ) -> None:
        self.features = _IncludeSet()
        self.model = _Model()
        self.custom_model_generators: dict[str, Callable] = {}
        self.hops_training_dataset_name = training_dataset_name
        self.hops_training_dataset_version = training_dataset_version
        self.label_name = label_name
        self.training_dataset_path = training_dataset_path or training_dataset_name
        self.custom_dataset_generator = kwargs.get("dataset_generator", False)

    def set_dataset_generator(self, dataset_generator: Callable) -> None:
        """(reference `ablationstudy.py:151-157`)"""
        self.custom_dataset_generator = dataset_generator

    def add_custom_model_generator(self, name: str, generator: Callable) -> None:
        """Engine-native registration (name -> generator); the
        reference's Model-level form is `model.add_custom_model_generator`."""
        self.custom_model_generators[name] = generator

    def _custom_model_names(self) -> list[str]:
        """Union of engine-native and reference-style registrations,
        insertion-ordered and de-duplicated."""
        names = list(self.custom_model_generators)
        for _, identifier in self.model.custom_model_generators:
            if identifier not in names:
                names.append(identifier)
        return names

    def to_dict(self) -> dict:
        """(reference `ablationstudy.py:130-149`)"""
        return {
            "training_dataset_name": self.hops_training_dataset_name,
            "training_dataset_version": self.hops_training_dataset_version,
            "label_name": self.label_name,
            "included_features": list(self.features.list_all()),
            "included_layers": sorted(self.model.layers.included_layers),
            "custom_dataset_generator": bool(self.custom_dataset_generator),
        }


def loco_trials(study: AblationStudy) -> list[Trial]:
    """The LOCO trial list: base + one per component
    (`loco.py:138-194`; count `loco.py:31-39` =
    n_features + n_layers + n_groups + n_custom + 1).
    Trial ids hash only the ablation labels (`trial.py:62-67`)."""
    trials = [Trial({"ablated": "None"}, trial_type="ablation", info_dict={"component": "base"})]
    for f in study.features:
        trials.append(Trial({"ablated": f"feature:{f}"}, trial_type="ablation",
                            info_dict={"component": "feature", "name": f}))
    for layer in study.model.layers:
        trials.append(Trial({"ablated": f"layer:{layer}"}, trial_type="ablation",
                            info_dict={"component": "layer", "name": layer}))
    for group in study.model.layers.list_groups():
        gname = ",".join(group)
        trials.append(Trial({"ablated": f"layer_group:{gname}"}, trial_type="ablation",
                            info_dict={"component": "layer_group", "members": group}))
    for prefix in study.model.layers.list_prefixes():
        trials.append(Trial({"ablated": f"layer_prefix:{prefix}"}, trial_type="ablation",
                            info_dict={"component": "layer_prefix", "name": prefix}))
    for name in study._custom_model_names():
        trials.append(Trial({"ablated": f"custom:{name}"}, trial_type="ablation",
                            info_dict={"component": "custom_model", "name": name}))
    return trials


def components_df(spark: SparkSession, study: AblationStudy):
    """The `components` relation (FIXTURES.md F4) for relational use."""
    rows = (
        [("feature", f, [f]) for f in study.features]
        + [("layer", l, [l]) for l in study.model.layers]
        + [("layer_group", "group:" + ",".join(g), list(g)) for g in study.model.layers.list_groups()]
        + [("layer_group", "prefix:" + p, [p]) for p in study.model.layers.list_prefixes()]
        + [("custom_model", "custom:" + n, [n]) for n in study._custom_model_names()]
    )
    return spark.createDataFrame(rows, "kind string, name string, members array<string>")


def make_dataset_function(path: str | None, label: str | None, ablated_feature: str | None):
    """Executor-side dataset loader with the ablated column pruned —
    the `dataset_function` contract (`loco.py:222-230`). Reads
    parquet via pyarrow with an explicit column projection, so the
    ablation is column pruning at the scan, not a post-hoc drop."""

    def dataset_function():
        if path is None:
            raise ValueError("AblationStudy has no training_dataset_path")
        import pyarrow.parquet as pq

        schema_names = pq.read_schema(path).names
        cols = [c for c in schema_names if c != ablated_feature]
        return pq.read_table(path, columns=cols).to_pandas()

    return dataset_function


def run_ablation(train_fn: Callable, config: AblationConfig, spark: SparkSession) -> dict:
    """Execute the LOCO study; early stopping forced off
    (`ablation_driver.py:52`)."""
    from maggy_spark.experiment import _aggregate_result

    study: AblationStudy = config.ablation_study
    if study is None:
        raise ValueError("AblationConfig.ablation_study is required")
    trials = loco_trials(study)

    path = study.training_dataset_path
    label = study.label_name
    custom_gens = dict(study.custom_model_generators)
    for gen, identifier in study.model.custom_model_generators:
        custom_gens.setdefault(identifier, gen)
    # Serialize the USER fn by value here: `wrapped` (a local function)
    # is always pickled by value, but a closure cell holding train_fn
    # would be pickled by REFERENCE to train_fn's module — exactly the
    # executor-side ModuleNotFoundError _dumps_by_value prevents.
    from maggy_spark.executor import _dumps_by_value

    train_fn_bytes = _dumps_by_value(train_fn)

    def wrapped(hparams: dict, reporter: Any = None, **_kw) -> Any:
        from pyspark import cloudpickle as _cp

        user_fn = _cp.loads(train_fn_bytes)
        ablated = hparams.get("ablated", "None")
        kind, _, name = ablated.partition(":")
        ablated_feature = name if kind == "feature" else None
        ablated_layer = name if kind in ("layer", "layer_group", "layer_prefix") else None
        from maggy_spark.executor import build_kwargs

        extras = {
            "dataset_function": make_dataset_function(path, label, ablated_feature),
            "ablated_feature": ablated_feature,
            "ablated_layer": ablated_layer,
            "label_name": label,
        }
        # only inject model_function when this trial actually carries
        # one — an unconditional None would clobber a user-supplied
        # parameter default (build_kwargs prefers extras over defaults)
        if kind == "custom" and custom_gens.get(name) is not None:
            extras["model_function"] = custom_gens[name]
        kwargs = build_kwargs(user_fn, {}, reporter, extras)
        return user_fn(**kwargs)

    pending = [{"trial_id": t.trial_id, "params": t.params, "budget": 0} for t in trials]
    by_id = {t.trial_id: t for t in trials}
    results = run_trial_wave(spark, pending, wrapped, optimization_key=config.optimization_key)
    done: list[Trial] = []
    for r in results:
        t = by_id[r["trial_id"]]
        if r["error"]:
            t.status = Trial.ERROR
            t.info_dict["error"] = r["error"]
        else:
            t.status = Trial.FINALIZED
            t.final_metric = r["final_metric"]
        t.info_dict["seq"] = len(done)
        done.append(t)

    result = _aggregate_result(spark, done, config.direction)
    best = next((t for t in done if t.trial_id == result.get("best_id")), None)
    if best is not None:
        result["best_config"] = dict(best.params)
        # "BEST Config Excludes ..." (ablation_driver.py:153-183)
        result["best_excludes"] = best.params.get("ablated", "None")
    result["n_components"] = len(trials) - 1
    return result
