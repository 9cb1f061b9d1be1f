"""Ingredients — a ``ray.data.Dataset`` plus column-role metadata.

Re-expression of the reference's ``Ingredients`` (reference:
recipys/ingredients.py:8-234) for a distributed engine: instead of one
in-memory DataFrame, the data is a lazy, streaming ``ray.data.Dataset`` whose
blocks are Arrow tables. The roles dict (``{column: [role, ...]}``) lives
driver-side; the tracked Arrow schema is updated symbolically as steps add or
retype columns, so selector resolution never forces execution.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Optional

import pyarrow as pa

from recipys_ray.dtypes import matches_type


def as_dataset(data):
    """Accept what the reference Recipe accepts (recipe.py:33-47) and more:
    a ray.data.Dataset passes through; pandas / polars DataFrames and Arrow
    tables are wrapped via the zero-copy from_* constructors."""
    import ray.data as rd

    if isinstance(data, rd.Dataset):
        return data
    import pandas as pd

    if isinstance(data, pd.DataFrame):
        return rd.from_pandas(data)
    if isinstance(data, pa.Table):
        return rd.from_arrow(data)
    try:
        import polars as pl

        if isinstance(data, pl.DataFrame):
            return rd.from_arrow(data.to_arrow())
    except ImportError:
        pass
    raise TypeError(
        f"Expected ray.data.Dataset / pandas / polars / pyarrow table, "
        f"got {data.__class__}"
    )


def _to_arrow_schema(ray_schema) -> pa.Schema:
    """Convert a ray.data Schema (arrow- or pandas-backed blocks) to Arrow."""
    base = getattr(ray_schema, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    import pandas as pd

    fields = []
    names = ray_schema.names
    dtypes = getattr(base, "types", None) or []
    for name, dt in zip(names, dtypes):
        if isinstance(dt, pa.DataType):
            t = dt
        elif isinstance(dt, pd.CategoricalDtype):
            t = pa.dictionary(pa.int32(), pa.string())
        elif dt == object:
            t = pa.string()
        else:
            try:
                t = pa.from_numpy_dtype(dt)
            except (TypeError, pa.ArrowNotImplementedError):
                t = pa.string()
        fields.append(pa.field(name, t))
    return pa.schema(fields)


class Ingredients:
    """A Dataset + roles wrapper.

    Args:
        dataset: a ``ray.data.Dataset`` (or anything exposing ``.schema()``).
        roles: optional ``{column: [role, ...]}`` mapping.
        schema: optional explicit Arrow schema (otherwise taken from
            ``dataset.schema()`` — cheap for parquet reads, metadata-only).
        check_roles: validate that role keys are actual columns
            (reference: ingredients.py:76-79).
    """

    def __init__(
        self,
        dataset,
        roles: Optional[dict[str, list[str]]] = None,
        schema: Optional[pa.Schema] = None,
        check_roles: bool = True,
    ):
        self.dataset = dataset
        if schema is None:
            schema = _to_arrow_schema(dataset.schema())
        self._types: dict[str, pa.DataType] = {
            name: schema.field(name).type for name in schema.names
        }
        self._order: list[str] = list(schema.names)
        if roles is None:
            roles = {}
        else:
            roles = {k: list(v) for k, v in roles.items()}
            if check_roles:
                missing = [c for c in roles if c not in self._types]
                if missing:
                    raise ValueError(
                        f"Roles for columns not in data: {missing}"
                    )
        self.roles: dict[str, list[str]] = roles

    # ------------------------------------------------------------------ #
    # schema access
    # ------------------------------------------------------------------ #
    @property
    def columns(self) -> list[str]:
        return list(self._order)

    @property
    def dtypes(self) -> dict[str, pa.DataType]:
        return dict(self._types)

    def get_schema(self) -> pa.Schema:
        return pa.schema([pa.field(c, self._types[c]) for c in self._order])

    def select_dtypes(self, include: list[str]) -> list[str]:
        """Columns whose dtype's string form matches any of ``include``
        (reference: ingredients.py:180-195 matches stringified dtypes)."""
        return [c for c in self._order if matches_type(self._types[c], include)]

    # ------------------------------------------------------------------ #
    # role CRUD (reference: ingredients.py:127-178)
    # ------------------------------------------------------------------ #
    def add_role(self, column: str, new_role: str) -> None:
        if column not in self._types:
            raise ValueError(f"{column} does not exist in this Data object")
        if column not in self.roles:
            raise RuntimeError(
                f"{column} has no role yet, use update_role() instead"
            )
        self.roles[column].append(new_role)

    def update_role(
        self, column: str, new_role: str, old_role: Optional[str] = None
    ) -> None:
        if column not in self._types:
            raise ValueError(f"{column} does not exist in this Data object")
        if old_role is not None:
            if column not in self.roles:
                raise ValueError(
                    f"Attempted to update role of {column} from {old_role} "
                    f"to {new_role} but {column} does not have a role yet."
                )
            if old_role not in self.roles[column]:
                raise ValueError(
                    f"Attempted to set role of {column} from {old_role} to "
                    f"{new_role} but {old_role} not among current roles: "
                    f"{self.roles[column]}."
                )
            self.roles[column].remove(old_role)
            self.roles[column].append(new_role)
        else:
            if column not in self.roles or len(self.roles[column]) <= 1:
                self.roles[column] = [new_role]
            else:
                raise ValueError(
                    f"Attempted to update role of {column} to {new_role} "
                    f"but it has more than one current role: "
                    f"{self.roles[column]}. Use old_role to disambiguate."
                )

    def columns_with_role(self, roles: list[str]) -> list[str]:
        want = set(roles)
        return [
            c
            for c in self._order
            if c in self.roles and want.intersection(self.roles[c])
        ]

    # ------------------------------------------------------------------ #
    # symbolic schema mutation (used by the planner as steps run)
    # ------------------------------------------------------------------ #
    def apply_schema_delta(self, delta: dict[str, pa.DataType]) -> None:
        for col, t in delta.items():
            if col not in self._types:
                self._order.append(col)
            self._types[col] = t

    def apply_role_delta(self, delta: dict[str, str]) -> None:
        for col, role in delta.items():
            self.update_role(col, role)

    def copy_meta(self) -> "Ingredients":
        """Shallow copy: same dataset ref, deep-copied roles/schema."""
        new = Ingredients.__new__(Ingredients)
        new.dataset = self.dataset
        new._types = dict(self._types)
        new._order = list(self._order)
        new.roles = deepcopy(self.roles)
        return new
