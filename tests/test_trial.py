"""Trial id golden value + metric-history semantics.

The golden id is asserted by the reference's own suite
(`maggy/tests/test_trial.py:24-48`) and must match bit-for-bit."""

from maggy_spark import Trial, trial_id_for_params


def test_golden_trial_id():
    assert trial_id_for_params({"param1": 5, "param2": "ada"}) == "3d1cc9fdb1d4d001"


def test_trial_id_key_order_invariant():
    assert trial_id_for_params({"b": 1, "a": 2}) == trial_id_for_params({"a": 2, "b": 1})


def test_trial_id_ignores_callables_and_ablation_keys():
    base = trial_id_for_params({"x": 1})
    assert trial_id_for_params({"x": 1, "dataset_function": lambda: 0}) == base
    assert trial_id_for_params({"x": 1, "model_function": None}) == base


def test_append_metric_dedup_and_nulls():
    t = Trial({"x": 1})
    assert t.append_metric(0.5, step=0) == 0
    assert t.append_metric(0.6, step=1) == 1
    assert t.append_metric(0.7, step=1) is None  # duplicate step dropped
    assert t.append_metric(None, step=2) is None  # null ignored
    assert t.append_metric(0.8) == 2  # auto-increment
    assert t.metric_history == [0.5, 0.6, 0.8]
    assert t.step_history == [0, 1, 2]


def test_json_roundtrip():
    t = Trial({"x": 1, "y": "a"})
    t.append_metric(1.0, 0)
    t.finalize(1.0)
    t2 = Trial.from_json(t.json())
    assert t2.trial_id == t.trial_id
    assert t2.status == Trial.FINALIZED
    assert t2.metric_history == [1.0]


def test_to_row_canonical_strings():
    t = Trial({"lr": 0.5, "n": 4, "flag": True})
    row = t.to_row(seq=7, direction="max", budget=2)
    assert row["params"] == {"lr": "0.5", "n": "4", "flag": "true"}
    assert row["budget"] == 2 and row["seq"] == 7
