"""StepFunction — the stateless user-function hook (reference:
recipys/step.py:608-619).

The reference passes the whole in-memory Ingredients to the function; in a
distributed engine the function sees one batch (Arrow table or pandas frame)
at a time — it must be a pure batch→batch map. For order/group-dependent
logic set ``grouped=True``: the function then receives one hash partition as
a pandas frame sorted by (group, sequence) plus the group columns, inside the
shared shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from recipys_ray.selector import Selector, all_predictors
from recipys_ray.steps.base import Step


class StepFunction(Step):
    def __init__(
        self,
        sel: Selector = None,
        function=None,
        batch_format: str = "pandas",
        grouped: bool = False,
    ):
        super().__init__(sel if sel is not None else all_predictors())
        if function is None:
            raise ValueError("function is required")
        if batch_format not in ("pandas", "pyarrow"):
            raise ValueError(batch_format)
        self.function = function
        self.batch_format = batch_format
        self.grouped = grouped
        self.desc = f"Apply function {getattr(function, '__name__', function)}"
        self._trained = True

    @property
    def kind(self) -> str:
        return "grouped" if self.grouped else "batch"

    # a user function may read/write anything → full-frame path
    frame_needs_all = True

    def transform_batch(self, tbl: pa.Table) -> pa.Table:
        if self.batch_format == "pyarrow":
            out = self.function(tbl)
            if not isinstance(out, pa.Table):
                raise TypeError("pyarrow StepFunction must return a pa.Table")
            return out
        pdf = self.function(tbl.to_pandas())
        if not isinstance(pdf, pd.DataFrame):
            raise TypeError("pandas StepFunction must return a DataFrame")
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        return self.function(pdf, group_cols)
