"""Selector DSL resolution (port of reference tests/test_selectors.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from recipys_ray import Ingredients
from recipys_ray.selector import (
    all_numeric_predictors,
    all_of,
    all_outcomes,
    all_predictors,
    contains,
    ends_with,
    enlist_str,
    has_role,
    has_type,
    intersection,
    regex_names,
    select_groups,
    select_sequence,
    starts_with,
)

from .conftest import f1_pandas


@pytest.fixture
def ing():
    ds = rd.from_pandas(f1_pandas())
    i = Ingredients(ds)
    for c, r in [("y", "outcome"), ("x1", "predictor"), ("x2", "predictor"),
                 ("x3", "predictor"), ("x4", "predictor"), ("id", "group"),
                 ("time", "sequence")]:
        i.update_role(c, r)
    return i


def test_enlist_str():
    assert enlist_str("a") == ["a"]
    assert enlist_str(["a", "b"]) == ["a", "b"]
    assert enlist_str(None) is None
    with pytest.raises(TypeError):
        enlist_str(1)
    with pytest.raises(TypeError):
        enlist_str(["a", 1])


def test_intersection_order_preserving():
    assert intersection([3, 1, 2], [1, 2, 3, 4]) == [3, 1, 2]
    assert intersection([1, 1, 2], [1, 2]) == [1, 1, 2]  # no dedup


def test_all_of(ing):
    assert all_of(["x1", "x2"])(ing) == ["x1", "x2"]
    assert all_of("x1")(ing) == ["x1"]


def test_regex_and_affixes(ing):
    assert regex_names("^x")(ing) == ["x1", "x2", "x3", "x4"]
    assert starts_with("x")(ing) == ["x1", "x2", "x3", "x4"]
    assert ends_with("1")(ing) == ["x1"]
    assert contains("ime")(ing) == ["time"]


def test_has_role(ing):
    assert has_role("predictor")(ing) == ["x1", "x2", "x3", "x4"]
    assert has_role("outcome")(ing) == ["y"]


def test_has_type(ing):
    # polars-style spelling
    assert "x1" in has_type(["Float64"])(ing)
    # pandas/arrow spelling
    assert "x1" in has_type(["float64"])(ing)
    assert has_type(["Int64"])(ing) == ["id", "x2"]


def test_all_predictors(ing):
    assert all_predictors()(ing) == ["x1", "x2", "x3", "x4"]
    assert all_outcomes()(ing) == ["y"]


def test_all_numeric_predictors(ing):
    # x3/x4 are categorical → excluded
    assert all_numeric_predictors()(ing) == ["x1", "x2"]


def test_group_and_sequence(ing):
    assert select_groups(ing) == ["id"]
    assert select_sequence(ing) == ["time"]


def test_numeric_whitelist_excludes_unsigned():
    tbl = pa.table(
        {
            "u": pa.array([1, 2], pa.uint32()),
            "i": pa.array([1, 2], pa.int32()),
            "h": pa.array(np.array([1.0, 2.0], dtype=np.float16)),
        }
    )
    ds = rd.from_arrow(tbl)
    ing = Ingredients(ds, roles={"u": ["predictor"], "i": ["predictor"],
                                 "h": ["predictor"]})
    assert all_numeric_predictors()(ing) == ["i"]
