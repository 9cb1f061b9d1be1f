"""Selector DSL — driver-side column resolution, no data motion.

Same semantics as the reference DSL (reference: recipys/selector.py:8-340):
a conjunctive filter over (roles ∧ types ∧ names ∧ name-regex) resolved
against ``Ingredients`` at fit time, preserving the data's column order
(order-preserving, non-deduplicating intersection, reference
selector.py:157-175). Types match by dtype string representation
(reference selector.py:251-263) — here normalized across polars / pandas /
arrow spellings via :mod:`recipys_ray.dtypes`.
"""

from __future__ import annotations

import re
from typing import Optional, Union

from recipys_ray.ingredients import Ingredients


def enlist_str(x: Union[str, list[str], None]) -> Optional[list[str]]:
    if isinstance(x, str):
        return [x]
    if isinstance(x, list):
        if not all(isinstance(i, str) for i in x):
            raise TypeError("Only lists of str are allowed.")
        return x
    if x is None:
        return None
    raise TypeError(f"Expected str or list of str, got {x.__class__}")


def intersection(x: list, y: list) -> list:
    """Order of first list, non-deduplicating."""
    if isinstance(x, str):
        x = [x]
    if isinstance(y, str):
        y = [y]
    return [i for i in x if i in y]


class Selector:
    def __init__(
        self,
        description: str,
        names: Union[str, list[str], None] = None,
        roles: Union[str, list[str], None] = None,
        types: Union[str, list[str], None] = None,
        pattern: Optional[re.Pattern] = None,
    ):
        self.description = description
        self.names = enlist_str(names)
        self.roles = enlist_str(roles)
        self.types = enlist_str(types)
        self.pattern = pattern

    def set_names(self, names):
        self.names = enlist_str(names)

    def set_roles(self, roles):
        self.roles = enlist_str(roles)

    def set_types(self, types):
        self.types = enlist_str(types)

    def set_pattern(self, pattern):
        self.pattern = pattern

    def __call__(self, ingr: Ingredients) -> list[str]:
        if not isinstance(ingr, Ingredients):
            raise TypeError(f"Expected Ingredients, got {ingr.__class__}")
        vars = list(ingr.columns)
        if self.roles is not None:
            sel_roles = [
                v for v, r in ingr.roles.items() if intersection(r, self.roles)
            ]
            vars = intersection(vars, sel_roles)
        if self.types is not None:
            vars = intersection(vars, ingr.select_dtypes(self.types))
        if self.names is not None:
            vars = intersection(vars, self.names)
        if self.pattern is not None:
            vars = list(filter(self.pattern.search, vars))
        return vars

    def __repr__(self):
        return self.description


# --------------------------------------------------------------------- #
# factory functions (reference selector.py:178-340)
# --------------------------------------------------------------------- #
def all_of(names: Union[str, list[str]]) -> Selector:
    return Selector(description=str(names), names=names)


def regex_names(regex: str) -> Selector:
    return Selector(description=f"regex: {regex}", pattern=re.compile(regex))


def starts_with(prefix: str) -> Selector:
    return regex_names(f"^{prefix}")


def ends_with(suffix: str) -> Selector:
    return regex_names(f"{suffix}$")


def contains(substring: str) -> Selector:
    return regex_names(f"{substring}")


def has_role(roles: Union[str, list[str]]) -> Selector:
    return Selector(description=f"roles: {roles}", roles=roles)


def has_type(types: Union[str, list[str]]) -> Selector:
    return Selector(description=f"types: {types}", types=types)


def all_predictors() -> Selector:
    sel = has_role(["predictor"])
    sel.description = "all predictors"
    return sel


def all_numeric_predictors() -> Selector:
    """Signed ints + float32/64 predictors (reference whitelist,
    selector.py:284-287 — unsigned and float16 excluded)."""
    sel = all_predictors()
    sel.set_types(["Int8", "Int16", "Int32", "Int64", "Float32", "Float64"])
    sel.description = "all numeric predictors"
    return sel


def all_outcomes() -> Selector:
    sel = has_role(["outcome"])
    sel.description = "all outcomes"
    return sel


def all_groups() -> Selector:
    return Selector(description="all grouping variables", roles=["group"])


def select_groups(ingr: Ingredients) -> list[str]:
    return all_groups()(ingr)


def all_sequences() -> Selector:
    return Selector(description="all sequence variables", roles=["sequence"])


def select_sequence(ingr: Ingredients) -> list[str]:
    return all_sequences()(ingr)
