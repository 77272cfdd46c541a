"""Searchspace semantics — mirrors the reference's own coverage
(`maggy/tests/test_searchspace.py:23-77`) plus transform round-trips."""

import pytest

from maggy_spark import Searchspace


def test_declaration_and_order():
    sp = Searchspace(
        kernel=("INTEGER", [2, 8]),
        pool=("INTEGER", [2, 8]),
        dropout=("DOUBLE", [0.01, 0.99]),
        color=("CATEGORICAL", ["red", "green", "blue"]),
        units=("DISCRETE", [16, 32, 64]),
    )
    assert list(sp.names()) == ["kernel", "pool", "dropout", "color", "units"]
    assert sp.names()["dropout"] == "DOUBLE"
    assert len(sp) == 5


@pytest.mark.parametrize(
    "spec",
    [
        ("DOUBLE", [1.0]),            # not a pair
        ("DOUBLE", [5.0, 1.0]),       # lo >= hi
        ("INTEGER", [1.5, 3]),        # non-int bounds
        ("CATEGORICAL", [1, 2]),      # non-strings
        ("DISCRETE", ["a", "b"]),     # non-numeric
        ("BOGUS", [1, 2]),            # unknown type
        ("DISCRETE", []),             # empty domain
    ],
)
def test_validation_errors(spec):
    with pytest.raises(ValueError):
        Searchspace(x=spec)


def test_duplicate_name_rejected():
    sp = Searchspace(x=("DOUBLE", [0, 1]))
    with pytest.raises(ValueError):
        sp.add("x", "DOUBLE", [0, 1])


def test_random_sampling_bounds_and_determinism():
    sp = Searchspace(
        d=("DOUBLE", [0.5, 2.5]),
        i=("INTEGER", [3, 9]),
        c=("CATEGORICAL", ["a", "b"]),
        k=("DISCRETE", [1, 10, 100]),
    )
    a = sp.get_random_parameter_values(50, seed=42)
    b = sp.get_random_parameter_values(50, seed=42)
    assert a == b
    for p in a:
        assert 0.5 <= p["d"] <= 2.5
        assert 3 <= p["i"] <= 9 and isinstance(p["i"], int)
        assert p["c"] in ("a", "b")
        assert p["k"] in (1, 10, 100)
    assert sp.get_random_parameter_values(5, seed=1) != sp.get_random_parameter_values(5, seed=2)


def test_transform_roundtrip():
    sp = Searchspace(
        d=("DOUBLE", [0.0, 10.0]),
        i=("INTEGER", [0, 100]),
        c=("CATEGORICAL", ["x", "y", "z"]),
    )
    params = {"d": 2.5, "i": 40, "c": "y"}
    vec = sp.transform(params)
    assert vec == [0.25, 0.4, 0.5]
    assert sp.inverse_transform(vec) == params


def test_transform_clips_out_of_range():
    sp = Searchspace(d=("DOUBLE", [0.0, 1.0]))
    assert sp.transform({"d": 5.0}) == [1.0]
    assert sp.transform({"d": -5.0}) == [0.0]


def test_contains():
    sp = Searchspace(d=("DOUBLE", [0, 1]), c=("CATEGORICAL", ["a"]))
    assert sp.contains({"d": 0.5, "c": "a"})
    assert not sp.contains({"d": 1.5, "c": "a"})
    assert not sp.contains({"d": 0.5})


def test_json_roundtrip():
    sp = Searchspace(d=("DOUBLE", [0.0, 1.0]), c=("CATEGORICAL", ["a", "b"]))
    sp2 = Searchspace.from_json(sp.json())
    assert sp2.names() == sp.names()
    assert sp2.get("c") == ["a", "b"]


def test_to_dataframe(spark):
    sp = Searchspace(d=("DOUBLE", [0.0, 1.0]), c=("CATEGORICAL", ["a", "b"]))
    rows = sp.to_dataframe(spark).collect()
    assert [r.name for r in rows] == ["d", "c"]
    assert rows[0].lo == 0.0 and rows[0].hi == 1.0 and rows[0].domain is None
    assert rows[1].domain == ["a", "b"]
