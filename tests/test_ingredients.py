"""Ingredients role CRUD (port of reference tests/test_ingredients.py)."""

import pytest
import ray.data as rd

from recipys_ray import Ingredients

from .conftest import f1_pandas


@pytest.fixture
def ing():
    return Ingredients(rd.from_pandas(f1_pandas()))


def test_roles_validated_against_columns():
    ds = rd.from_pandas(f1_pandas())
    with pytest.raises(ValueError, match="not in data"):
        Ingredients(ds, roles={"nope": ["predictor"]})


def test_update_role_add(ing):
    ing.update_role("x1", "predictor")
    assert ing.roles["x1"] == ["predictor"]


def test_add_role_requires_existing(ing):
    with pytest.raises(RuntimeError):
        ing.add_role("x1", "extra")
    ing.update_role("x1", "predictor")
    ing.add_role("x1", "extra")
    assert ing.roles["x1"] == ["predictor", "extra"]


def test_update_role_with_old_role(ing):
    ing.update_role("x1", "predictor")
    ing.update_role("x1", "outcome", old_role="predictor")
    assert ing.roles["x1"] == ["outcome"]


def test_update_role_wrong_old_role(ing):
    ing.update_role("x1", "predictor")
    with pytest.raises(ValueError):
        ing.update_role("x1", "outcome", old_role="group")


def test_update_multirole_ambiguous(ing):
    ing.update_role("x1", "predictor")
    ing.add_role("x1", "extra")
    with pytest.raises(ValueError, match="more than one current role"):
        ing.update_role("x1", "outcome")


def test_missing_column(ing):
    with pytest.raises(ValueError):
        ing.update_role("nope", "predictor")


def test_select_dtypes(ing):
    assert ing.select_dtypes(["Int64"]) == ["id", "x2"]
    assert "x3" in ing.select_dtypes(["Categorical"])
    assert "time" in ing.select_dtypes(["Duration"])


def test_copy_meta_isolated(ing):
    ing.update_role("x1", "predictor")
    c = ing.copy_meta()
    c.update_role("x1", "outcome")
    assert ing.roles["x1"] == ["predictor"]
