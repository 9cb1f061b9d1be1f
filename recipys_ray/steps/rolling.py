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
        max_carry_rows: int = 4096,
    ):
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if not isinstance(fun, Accumulator) or fun not in _FUNS:
            raise TypeError(
                f"Expected a supported Accumulator, got {fun!r}"
            )
        self.window = window
        # time-window chunk carry: rows inside one window span at a chunk
        # boundary are carried as state; this caps that state (a clear
        # error beats silent memory blowup on pathological densities)
        self.max_carry_rows = max_carry_rows
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
        # carry the rows inside one window span at each boundary (capped by
        # max_carry_rows — a clean error on pathological densities)
        return True

    def chunk_state(self, pdf, gid):
        if isinstance(self.window, str):
            return self._chunk_state_time(pdf, gid)
        from recipys_ray.kernels.chunked import boundary_chunk_state

        cols = [c for c in self.columns if c in pdf.columns]
        return boundary_chunk_state(
            pdf, gid, cols, max(1, self.window - 1), from_end=True
        )

    def _chunk_state_time(self, pdf, gid):
        """Per chunk: the trailing rows with ts within one window span of
        the chunk's end — (ts, value…) arrays as object cells."""
        seq = self._seq_col
        W = pd.Timedelta(self.window)
        cols = [c for c in self.columns if c in pdf.columns]
        g = pdf.groupby(gid, sort=False, observed=True)
        cmax = g[seq].transform("max")
        tail = pdf[pdf[seq] > (cmax - W)]
        if len(tail) and tail.groupby(
            gid[tail.index], sort=False
        ).size().max() > self.max_carry_rows:
            raise ValueError(
                f"time-window rolling carry exceeds max_carry_rows="
                f"{self.max_carry_rows} for a salted chunk boundary; raise "
                f"max_carry_rows or disable salting for this step"
            )
        out = pd.DataFrame(index=g.size().index)
        cts_map: dict = {}
        cv_maps: dict = {c: {} for c in cols}
        for k, grp in tail.groupby(gid[tail.index], sort=False):
            cts_map[k] = grp[seq].astype(np.int64).to_numpy()
            for c in cols:
                cv_maps[c][k] = grp[c].astype(np.float64).to_numpy()
        out["cts"] = pd.Series(cts_map, dtype=object).reindex(out.index)
        for c in cols:
            out[f"cv_{c}"] = pd.Series(
                cv_maps[c], dtype=object
            ).reindex(out.index)
        out["cmin"] = g[seq].min().astype(np.int64)
        out["cmax"] = g[seq].max().astype(np.int64)
        out["unit"] = pdf[seq].dtype.str  # e.g. <M8[us] / <m8[us]
        return out

    def fold_chunk_states(self, states):
        if isinstance(self.window, str):
            return self._fold_time(states)
        from recipys_ray.kernels.chunked import fold_boundary_states

        return fold_boundary_states(states, max(1, self.window - 1))

    def _fold_time(self, states):
        """Sequential buffer of rows within one window span of the running
        frontier; each chunk's prefix is the buffer filtered to its own
        relevance window (ts > chunk_min − W)."""
        dt_str = states["unit"].iloc[0]
        unit = np.datetime_data(np.dtype(dt_str))[0]
        W = np.timedelta64(
            pd.Timedelta(self.window).to_timedelta64()
        ).astype(f"timedelta64[{unit}]").astype(np.int64)
        vcols = [c for c in states.columns if c.startswith("cv_")]
        buf_ts = np.array([], dtype=np.int64)
        buf_v = {c: np.array([], dtype=np.float64) for c in vcols}
        out_rows = []
        for idx in states.index:
            cmin = int(states.at[idx, "cmin"])
            keep = buf_ts > (cmin - W)
            out_rows.append(
                (buf_ts[keep],
                 {c: buf_v[c][keep] for c in vcols})
            )
            cts = states.at[idx, "cts"]
            cmax = int(states.at[idx, "cmax"])
            if cts is None or (isinstance(cts, float) and np.isnan(cts)):
                cts = np.array([], dtype=np.int64)
                cvals = {c: np.array([]) for c in vcols}
            else:
                cvals = {c: np.asarray(states.at[idx, c]) for c in vcols}
            buf_ts = np.r_[buf_ts, np.asarray(cts, dtype=np.int64)]
            for c in vcols:
                buf_v[c] = np.r_[buf_v[c], cvals[c]]
            live = buf_ts > (cmax - W)
            buf_ts = buf_ts[live]
            for c in vcols:
                buf_v[c] = buf_v[c][live]
        out = pd.DataFrame(index=states.index)
        out["pts"] = [r[0] for r in out_rows]
        for c in vcols:
            out[f"p{c}"] = [r[1][c] for r in out_rows]
        out["unit"] = dt_str
        return out

    def _apply_time(self, pdf, gid, prefix):
        seq = self._seq_col
        W = pd.Timedelta(self.window)
        cols = [c for c in self.columns if c in pdf.columns]
        fn = _FUNS[self.fun]
        hot = gid.isin(prefix.index)
        if not hot.any():
            return pdf
        dt_str = prefix["unit"].iloc[0]
        cmin = pdf.loc[hot].groupby(gid[hot], sort=False)[seq].transform(
            "min"
        )
        head = hot.copy()
        head[hot] = pdf.loc[hot, seq] < (cmin + W)
        if not head.any():
            return pdf
        for key, idx in pdf.index[head].to_series().groupby(
            gid[head], sort=False
        ).groups.items():
            pts = prefix.at[key, "pts"]
            if pts is None or len(np.atleast_1d(pts)) == 0:
                continue
            carried_ts = pd.Series(np.asarray(pts)).astype(
                np.dtype(dt_str)
            )
            nh = len(idx)
            for c in cols:
                cv = np.asarray(prefix.at[key, f"pcv_{c}"])
                seq_vals = pd.concat(
                    [
                        pd.Series(cv, index=pd.Index(carried_ts)),
                        pd.Series(
                            pdf.loc[idx, c].astype(np.float64).to_numpy(),
                            index=pd.Index(pdf.loc[idx, seq]),
                        ),
                    ]
                )
                res = getattr(
                    seq_vals.rolling(window=W, min_periods=1), fn
                )().to_numpy()[-nh:]
                oc = f"{c}_{self.suffix}"
                if self.fun is Accumulator.COUNT:
                    res = res.astype(np.int64)
                pdf.loc[idx, oc] = res
        return pdf

    def fold_chunk_states_grouped(self, states, gkey):
        if isinstance(self.window, str):
            # variable-width state → per-group sequential fold
            parts = []
            for _, grp in states.groupby(gkey.to_numpy(), sort=False):
                parts.append(self._fold_time(grp))
            return pd.concat(parts)
        from recipys_ray.kernels.chunked import fold_boundary_states_grouped

        return fold_boundary_states_grouped(
            states, gkey, max(1, self.window - 1)
        )

    def apply_chunk_prefix(self, pdf, gid, prefix):
        """Recompute each hot chunk's boundary rows over the carried tail +
        chunk head (same pandas rolling kernel, so the semantics —
        min_periods=1, ddof, window closure — match exactly)."""
        if isinstance(self.window, str):
            return self._apply_time(pdf, gid, prefix)
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
