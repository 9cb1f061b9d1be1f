"""Temporal feature steps with no reference counterpart — required by the
engine's north rule (BASELINE.json): lag/lead, diff, and gap-based
sessionization. All run as vectorized frame kernels inside the shared
hash-partition + sorted-scan shuffle, so they fuse with imputation and
historical steps into one exchange.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import pandas as pd
import pyarrow as pa

from recipys_ray.dtypes import is_temporal
from recipys_ray.ingredients import Ingredients
from recipys_ray.selector import Selector, all_numeric_predictors
from recipys_ray.steps.base import Step, sequence_or_error


class _ShiftStep(Step):
    _direction = 1
    _label = "lag"

    def __init__(
        self,
        sel: Selector = None,
        shifts: Union[int, list[int]] = 1,
        role: str = "predictor",
    ):
        super().__init__(sel if sel is not None else all_numeric_predictors())
        self.shifts = [shifts] if isinstance(shifts, int) else list(shifts)
        if any(s <= 0 for s in self.shifts):
            raise ValueError("shifts must be positive integers")
        self.desc = f"Create {self._label} {self.shifts}"
        self.role = role

    @property
    def kind(self) -> str:
        return "grouped"

    def _names(self, col: str) -> list[str]:
        return [f"{col}_{self._label}{s}" for s in self.shifts]

    def frame_outputs(self) -> list[str]:
        return [n for c in self.columns for n in self._names(c)]

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        gid = pdf["__gid__"]
        cols = [c for c in self.columns if c in pdf.columns]
        if not cols:
            return pdf
        g = pdf.groupby(gid, sort=False, observed=True)
        for s in self.shifts:
            shifted = g[cols].shift(s * self._direction)
            pdf[[f"{c}_{self._label}{s}" for c in cols]] = shifted.to_numpy()
        return pdf

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        out = {}
        for c in self.columns:
            t = ing.dtypes.get(c, pa.float64())
            # shifting introduces nulls; ints surface as float64 via pandas
            t = pa.float64() if pa.types.is_integer(t) else t
            for name in self._names(c):
                out[name] = t
        return out

    def role_delta(self) -> dict[str, str]:
        return {n: self.role for c in self.columns for n in self._names(c)}

    # ---------------- chunk-merge protocol (kernels/chunked.py) ----------- #
    @property
    def chunk_mergeable(self) -> bool:
        return True

    @property
    def chunk_fold_reverse(self) -> bool:
        return self._direction == -1  # lead carries come from LATER chunks

    def chunk_state(self, pdf, gid):
        """State: chunk row count + the K raw boundary values per column
        (POSITIONAL — shifts move the raw sequence, nulls included); the
        boundary is the chunk end for lag/diff, the chunk start for lead."""
        from recipys_ray.kernels.chunked import boundary_chunk_state

        cols = [c for c in self.columns if c in pdf.columns]
        return boundary_chunk_state(
            pdf, gid, cols, max(self.shifts), from_end=(self._direction == 1)
        )

    def fold_chunk_states(self, states):
        from recipys_ray.kernels.chunked import fold_boundary_states

        return fold_boundary_states(states, max(self.shifts))

    def fold_chunk_states_grouped(self, states, gkey):
        from recipys_ray.kernels.chunked import fold_boundary_states_grouped

        return fold_boundary_states_grouped(states, gkey, max(self.shifts))

    def apply_chunk_prefix(self, pdf, gid, prefix):
        cols = [c for c in self.columns if c in pdf.columns]
        hot = gid.isin(prefix.index)
        if not hot.any():
            return pdf
        # distance from the carried boundary: chunk start for lag/diff,
        # chunk end for lead
        pos = (
            pdf.loc[hot]
            .groupby(gid[hot], sort=False)
            .cumcount(ascending=(self._direction == 1))
        )
        avail = gid[hot].map(prefix["avail"])
        for s in self.shifts:
            for i in range(s):
                back = s - i  # distance across the boundary
                rows = hot.copy()
                rows[hot] = (pos == i) & (back <= avail)
                if not rows.any():
                    continue
                for c in cols:
                    oc = f"{c}_{self._label}{s}"
                    carried = gid[rows].map(prefix[f"t{back}_{c}"])
                    if self._label == "diff":
                        pdf.loc[rows, oc] = (
                            pdf.loc[rows, c].astype(np.float64) - carried
                        )
                    else:
                        pdf.loc[rows, oc] = carried
        return pdf


class StepLag(_ShiftStep):
    """``<col>_lag{n}`` = value n rows earlier within the group (null-padded)."""

    _direction = 1
    _label = "lag"


class StepLead(_ShiftStep):
    """``<col>_lead{n}`` = value n rows later within the group (null-padded)."""

    _direction = -1
    _label = "lead"


class StepDiff(_ShiftStep):
    """``<col>_diff{n}`` = value - value n rows earlier within the group."""

    _direction = 1
    _label = "diff"

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        gid = pdf["__gid__"]
        cols = [c for c in self.columns if c in pdf.columns]
        if not cols:
            return pdf
        g = pdf.groupby(gid, sort=False, observed=True)
        for s in self.shifts:
            shifted = g[cols].shift(s)
            pdf[[f"{c}_diff{s}" for c in cols]] = (
                pdf[cols].to_numpy(dtype=np.float64)
                - shifted.to_numpy(dtype=np.float64)
            )
        return pdf

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        return {n: pa.float64() for c in self.columns for n in self._names(c)}


class StepSessionize(Step):
    """Gap-based sessionization: within each group (ordered by the sequence
    role), start a new session whenever the time delta to the previous row
    exceeds ``gap``. Emits an int64 ``name`` column (0-based per group).
    """

    def __init__(
        self,
        gap: Union[str, pd.Timedelta, int, float] = "30m",
        name: str = "session_id",
        role: str = "predictor",
    ):
        super().__init__(Selector(description="sessionize", names=[]))
        self.gap = gap
        self.name = name
        self.role = role
        self.desc = f"Sessionize with gap {gap}"
        self._seq_col: str = None
        self._seq_temporal = True

    @property
    def kind(self) -> str:
        return "grouped"

    def frame_inputs(self) -> list[str]:
        return [self._seq_col] if self._seq_col else []

    def frame_outputs(self) -> list[str]:
        return [self.name]

    def resolve(self, ing: Ingredients) -> None:
        super().resolve(ing)
        seq = sequence_or_error(ing, "sessionization")
        # first temporal sequence column, else first sequence column
        temporal = [c for c in seq if is_temporal(ing.dtypes[c])]
        self._seq_col = temporal[0] if temporal else seq[0]
        self._seq_temporal = bool(temporal)
        if not self._seq_temporal and isinstance(self.gap, str):
            raise ValueError(
                f"Sessionize gap {self.gap!r} is a time string but no "
                f"temporal sequence column exists (sequences: {seq}); "
                f"pass a numeric gap or add a timestamp sequence role."
            )

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        gid = pdf["__gid__"]
        s = pdf[self._seq_col]
        delta = s.groupby(gid, sort=False).diff()
        gap = pd.Timedelta(self.gap) if self._seq_temporal else self.gap
        new_session = (delta > gap).to_numpy()
        sid = (
            pd.Series(new_session.astype(np.int64), index=pdf.index)
            .groupby(gid, sort=False)
            .cumsum()
        )
        pdf[self.name] = sid.to_numpy()
        return pdf

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        return {self.name: pa.int64()}

    def role_delta(self) -> dict[str, str]:
        return {self.name: self.role}

    # ---------------- chunk-merge protocol (kernels/chunked.py) ----------- #
    @property
    def chunk_mergeable(self) -> bool:
        return True

    def chunk_state(self, pdf, gid):
        s = pdf[self._seq_col]
        g = s.groupby(gid, sort=False, observed=True)
        gap = pd.Timedelta(self.gap) if self._seq_temporal else self.gap
        brk = (g.diff() > gap).groupby(gid, sort=False).sum()
        out = pd.DataFrame(
            {"first": g.first(), "last": g.last(),
             "brk": brk.astype(np.float64)}
        )
        return out

    def fold_chunk_states(self, states):
        gkey = pd.Series(np.zeros(len(states), dtype=np.int64),
                         index=states.index)
        return self.fold_chunk_states_grouped(states, gkey)

    def fold_chunk_states_grouped(self, states, gkey):
        key = gkey.to_numpy()
        gap = pd.Timedelta(self.gap) if self._seq_temporal else self.gap
        # boundary break between consecutive chunks of the group
        prev_last = states["last"].groupby(key, sort=False).shift(1)
        boundary = ((states["first"] - prev_last) > gap).astype(np.float64)
        brk = states["brk"]
        offset = (
            brk.groupby(key, sort=False).cumsum() - brk
            + boundary.groupby(key, sort=False).cumsum()
        )
        return pd.DataFrame({"off": offset}, index=states.index)

    def apply_chunk_prefix(self, pdf, gid, prefix):
        off = gid.map(prefix["off"]).fillna(0.0)
        pdf[self.name] = (pdf[self.name] + off).astype(np.int64)
        return pdf
