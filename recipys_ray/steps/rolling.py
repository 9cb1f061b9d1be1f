"""StepRolling — per-group SLIDING-window aggregates (north-rule windowed
aggregation; no reference counterpart — the reference only has expanding
aggregates, StepHistorical).

``window`` is either an integer (last N rows including the current one) or a
time string (e.g. "30m": all rows with sequence timestamp in
``(t - window, t]``). Backed by pandas' C-implemented grouped rolling
kernels — a monotonic-deque algorithm for min/max, rolling sums for
mean/sum/count — inside the shared hash-partition + sorted-scan shuffle, so
it fuses with the other order-dependent steps into one exchange. Row t sees
only rows ≤ t: zero temporal leakage.
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
from recipys_ray.steps.historical import Accumulator

_FUNS = {
    Accumulator.MAX: "max",
    Accumulator.MIN: "min",
    Accumulator.MEAN: "mean",
    Accumulator.MEDIAN: "median",
    Accumulator.COUNT: "count",
    Accumulator.VAR: "var",
    Accumulator.SUM: "sum",
}


class StepRolling(Step):
    def __init__(
        self,
        sel: Selector = None,
        window: Union[int, str] = 10,
        fun: Accumulator = Accumulator.MEAN,
        suffix: str = None,
        role: str = "predictor",
    ):
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if not isinstance(fun, Accumulator) or fun not in _FUNS:
            raise TypeError(
                f"Expected a supported Accumulator, got {fun!r}"
            )
        self.window = window
        self.fun = fun
        self.suffix = (
            suffix if suffix is not None else f"roll_{fun.value}_{window}"
        )
        self.role = role
        self.desc = f"Rolling {fun.value} over {window}"
        self._seq_col: str = None

    @property
    def kind(self) -> str:
        return "grouped"

    def _new_columns(self) -> list[str]:
        return [f"{c}_{self.suffix}" for c in self.columns]

    def frame_inputs(self) -> list[str]:
        extra = [self._seq_col] if isinstance(self.window, str) else []
        return list(self.columns) + extra

    def frame_outputs(self) -> list[str]:
        return self._new_columns()

    def resolve(self, ing: Ingredients) -> None:
        super().resolve(ing)
        if isinstance(self.window, str):
            seq = sequence_or_error(ing, "time-windowed rolling step")
            temporal = [c for c in seq if is_temporal(ing.dtypes[c])]
            if not temporal:
                raise ValueError(
                    f"Rolling window {self.window!r} is time-based but no "
                    f"temporal sequence column exists (sequences: {seq})"
                )
            self._seq_col = temporal[0]

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        gid = pdf["__gid__"]
        cols = [c for c in self.columns if c in pdf.columns]
        if not cols:
            return pdf
        for c in cols:
            if pdf[c].dtype == object:  # all-null arrow → object
                pdf[c] = pdf[c].astype(np.float64)
        fn = _FUNS[self.fun]
        if isinstance(self.window, int):
            roll = pdf.groupby(gid, sort=False, observed=True)[cols].rolling(
                window=self.window, min_periods=1
            )
            res = getattr(roll, fn)().reset_index(drop=True)
        else:
            # time-based window on the temporal sequence column
            sub = pdf[[self._seq_col] + cols].set_index(self._seq_col)
            roll = sub.groupby(gid.to_numpy(), sort=False)[cols].rolling(
                window=pd.Timedelta(self.window), min_periods=1
            )
            res = getattr(roll, fn)().reset_index(drop=True)
        vals = res.to_numpy()
        if self.fun is Accumulator.COUNT:
            vals = vals.astype(np.int64)
        pdf[self._new_columns()] = vals
        return pdf

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        if self.fun is Accumulator.COUNT:
            return {c: pa.int64() for c in self._new_columns()}
        return {c: pa.float64() for c in self._new_columns()}

    # ---------------- chunk-merge protocol (kernels/chunked.py) ----------- #
    @property
    def chunk_mergeable(self) -> bool:
        # row windows carry the previous window-1 raw values; time windows
        # would need a time-span carry (unbuilt) → whole-group fallback
        return isinstance(self.window, int)

    def chunk_state(self, pdf, gid):
        from recipys_ray.kernels.chunked import boundary_chunk_state

        cols = [c for c in self.columns if c in pdf.columns]
        return boundary_chunk_state(
            pdf, gid, cols, max(1, self.window - 1), from_end=True
        )

    def fold_chunk_states(self, states):
        from recipys_ray.kernels.chunked import fold_boundary_states

        return fold_boundary_states(states, max(1, self.window - 1))

    def fold_chunk_states_grouped(self, states, gkey):
        from recipys_ray.kernels.chunked import fold_boundary_states_grouped

        return fold_boundary_states_grouped(
            states, gkey, max(1, self.window - 1)
        )

    def apply_chunk_prefix(self, pdf, gid, prefix):
        """Recompute the first window−1 rows of each hot chunk over the
        carried tail + chunk head (same pandas rolling kernel, so the
        semantics — min_periods=1, ddof — match exactly)."""
        w = self.window
        if w <= 1:
            return pdf
        cols = [c for c in self.columns if c in pdf.columns]
        hot = gid.isin(prefix.index)
        if not hot.any():
            return pdf
        fn = {
            Accumulator.MAX: "max", Accumulator.MIN: "min",
            Accumulator.MEAN: "mean", Accumulator.MEDIAN: "median",
            Accumulator.COUNT: "count", Accumulator.VAR: "var",
            Accumulator.SUM: "sum",
        }[self.fun]
        pos = pdf.loc[hot].groupby(gid[hot], sort=False).cumcount()
        head = hot.copy()
        head[hot] = pos < (w - 1)
        if not head.any():
            return pdf
        for key, idx in pdf.index[head].to_series().groupby(
            gid[head], sort=False
        ).groups.items():
            avail = int(prefix.at[key, "avail"])
            if avail == 0:
                continue
            nh = len(idx)
            for c in cols:
                tail = np.array(
                    [prefix.at[key, f"t{j}_{c}"] for j in range(avail, 0, -1)]
                )
                seq = pd.Series(
                    np.r_[tail, pdf.loc[idx, c].astype(np.float64).to_numpy()]
                )
                res = getattr(
                    seq.rolling(window=w, min_periods=1), fn
                )().to_numpy()[-nh:]
                oc = f"{c}_{self.suffix}"
                if self.fun is Accumulator.COUNT:
                    res = res.astype(np.int64)
                pdf.loc[idx, oc] = res
        return pdf

    def role_delta(self) -> dict[str, str]:
        return {c: self.role for c in self._new_columns()}
