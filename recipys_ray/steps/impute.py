"""Imputation steps.

Re-expression of the reference imputers (reference: recipys/step.py:121-260)
for distributed execution:

- constant / zero / one fills are stateless vectorized Arrow ``map_batches``
  bodies (no shuffle);
- forward / backward / per-group mean/min/max fills are frame kernels inside
  the shared hash-partition + sorted-scan shuffle (kernels/grouped.py), using
  pandas' C-implemented grouped ffill/transform — semantics verified equal to
  polars ``fill_null(strategy).over(groups)``;
- whole-column mean/min/max fills (no group role) take a driver-side fit pass
  (one streaming aggregate) and then a stateless fill.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from recipys_ray.aggregates import MINMAX, MOMENTS, column_stats
from recipys_ray.ingredients import Ingredients
from recipys_ray.selector import Selector, all_predictors
from recipys_ray.steps.base import Step

_GLOBAL_STRATS = {"mean": MOMENTS, "min": MINMAX, "max": MINMAX}
_ORDER_STRATS = {"forward", "backward", "linear"}
_CONST_STRATS = {"zero", "one"}


class StepImputeFill(Step):
    """Null-fill selected columns with a constant ``value`` or a ``strategy``
    in {forward, backward, linear, mean, zero, one, min, max}; per group when
    a group role exists (reference: step.py:121-155, polars ``fill_null``
    semantics; ``linear`` is an engine extension — time-weighted
    interpolation between the surrounding non-null values, leaving leading /
    trailing nulls in place).

    ``limit`` caps the number of consecutive fills for forward/backward.
    """

    def __init__(
        self,
        sel: Selector = None,
        value=None,
        strategy: Optional[str] = None,
        limit: Optional[int] = None,
        duckdb_parity_stats: bool = False,
    ):
        super().__init__(sel if sel is not None else all_predictors())
        if (value is None) == (strategy is None):
            raise ValueError("Provide exactly one of value / strategy")
        if strategy == "linear" and limit is not None:
            raise ValueError("limit is not supported with strategy='linear'")
        if strategy is not None and strategy not in (
            _ORDER_STRATS | _CONST_STRATS | set(_GLOBAL_STRATS)
        ):
            raise ValueError(f"Unknown fill strategy: {strategy}")
        self.desc = f"Impute with {strategy if strategy else value}"
        self.value = value
        self.strategy = strategy
        self.limit = limit
        # oracle-verification mode: per-group means accumulated EXACTLY as
        # DuckDB's avg() (plain sequential float64 in scan order — see
        # kernels/duckdb_parity.py seq_group_sums). Assumes within-group
        # scan order equals the sort-key order (true for time-ordered event
        # streams); production default keeps pandas' compensated means.
        self.duckdb_parity_stats = duckdb_parity_stats
        self._fill_values: dict[str, float] = {}

    # ------------------------------------------------------------------ #
    @property
    def kind(self) -> str:
        if self.strategy in _ORDER_STRATS:
            return "grouped"
        if self.strategy in _GLOBAL_STRATS and self.group_cols:
            return "grouped"
        return "batch"

    @property
    def requires_fit(self) -> bool:
        # whole-column mean/min/max need a global aggregate
        return self.strategy in _GLOBAL_STRATS and not self.group_cols

    def fit(self, ing: Ingredients) -> None:
        if self.requires_fit:
            stat = _GLOBAL_STRATS[self.strategy]
            stats = column_stats(ing.dataset, self.columns, {stat})
            for c in self.columns:
                s = stats[c]
                self._fill_values[c] = (
                    s.mean() if self.strategy == "mean" else getattr(s, self.strategy)
                )
        self._trained = True

    # ------------------------------------------------------------------ #
    def transform_batch(self, tbl: pa.Table) -> pa.Table:
        for c in self.columns:
            if c not in tbl.column_names:
                continue
            col = tbl.column(c)
            if self.strategy is None:
                fill = self.value
            elif self.strategy == "zero":
                fill = 0
            elif self.strategy == "one":
                fill = 1
            else:  # fitted global mean/min/max
                fill = self._fill_values.get(c)
            if fill is None:
                continue
            try:
                scalar = pa.scalar(fill, type=col.type)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                col = col.cast(pa.float64())
                scalar = pa.scalar(float(fill), type=pa.float64())
            filled = pc.fill_null(col, scalar)
            tbl = tbl.set_column(tbl.column_names.index(c), c, filled)
        return tbl

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        gid = pdf["__gid__"]
        cols = [c for c in self.columns if c in pdf.columns]
        if not cols:
            return pdf
        g = pdf.groupby(gid, sort=False, observed=True)
        if self.strategy == "linear":
            return self._linear_interp(pdf, gid, cols)
        if self.strategy == "forward":
            pdf[cols] = g[cols].ffill(limit=self.limit)
        elif self.strategy == "backward":
            pdf[cols] = g[cols].bfill(limit=self.limit)
        else:  # per-group mean/min/max (whole-group stat — matches polars
            # fill_null(strategy).over(groups), which includes future rows;
            # reference behavior, see SURVEY.md §2.5.2)
            if self.strategy == "mean":
                for c in cols:
                    if pdf[c].dtype == object:  # all-null arrow → object
                        pdf[c] = pdf[c].astype(np.float64)
                if self.duckdb_parity_stats:
                    from recipys_ray.kernels.duckdb_parity import (
                        seq_group_sums,
                    )

                    garr = gid.to_numpy()
                    for c in cols:
                        starts, s, n = seq_group_sums(
                            pdf[c].to_numpy(np.float64), garr
                        )
                        means = s / np.where(n > 0, n, np.nan)
                        fill = gid.map(
                            pd.Series(means, index=garr[starts])
                        )
                        pdf[c] = pdf[c].fillna(fill)
                    return pdf
                g = pdf.groupby(pdf["__gid__"], sort=False, observed=True)
            stat = g[cols].transform(self.strategy)
            pdf[cols] = pdf[cols].fillna(stat)
        return pdf

    def _linear_interp(
        self, pdf: pd.DataFrame, gid: pd.Series, cols: list[str]
    ) -> pd.DataFrame:
        """Time-weighted linear interpolation between the surrounding
        non-null values of each null run, per group.

        Time axis: the first TEMPORAL sequence column (epoch-µs int64 —
        exact), else within-partition position (groups are contiguous and
        sorted, so positional differences are within-group row distances).
        The fill expression mirrors the SQL tree exactly —
        ``pv + (nv - pv) * (Δt_int64_as_double / span_int64_as_double)`` —
        one subtract, one divide, one multiply, one add, so values are
        bit-equal to the windowed-SQL statement; a zero span (duplicate
        timestamps around the gap) yields NULL (SQL x/0.0 semantics).
        Vectorized across ALL groups: two grouped C fills recover the
        surrounding non-null row indices, then one fancy-indexed kernel.
        """
        t = None
        for sc in self.seq_cols:
            if sc in pdf.columns and pd.api.types.is_datetime64_any_dtype(
                pdf[sc]
            ):
                t = (
                    pdf[sc].astype("datetime64[us]").astype(np.int64)
                    .to_numpy()
                )
                break
        n = len(pdf)
        if t is None:
            t = np.arange(n, dtype=np.int64)
        idxf = np.arange(n, dtype=np.float64)
        garr = gid.to_numpy()
        for c in cols:
            v = pdf[c].astype(np.float64).to_numpy()
            notna = ~np.isnan(v)
            marker = pd.Series(np.where(notna, idxf, np.nan))
            gm = marker.groupby(garr, sort=False)
            prev_i = gm.ffill().to_numpy()
            next_i = gm.bfill().to_numpy()
            m = ~notna & ~np.isnan(prev_i) & ~np.isnan(next_i)
            if not m.any():
                continue
            pi = prev_i[m].astype(np.int64)
            ni = next_i[m].astype(np.int64)
            num = (t[m] - t[pi]).astype(np.float64)
            den = (t[ni] - t[pi]).astype(np.float64)
            pv = v[pi]
            nv = v[ni]
            with np.errstate(divide="ignore", invalid="ignore"):
                fill = pv + (nv - pv) * (num / den)
            fill[den == 0.0] = np.nan
            out = v.copy()
            out[m] = fill
            pdf[c] = out
        return pdf

    # ---------------- chunk-merge protocol (kernels/chunked.py) ----------- #
    @property
    def chunk_mergeable(self) -> bool:
        # forward/backward: after a chunk-local fill the remaining nulls on
        # the leading (trailing) edge are completed from the carried
        # boundary value; ``limit`` additionally carries the value's AGE.
        # per-group mean/min/max: whole-group stats fold as TOTALS and the
        # transform is DEFERRED (chunk_transform_defer) — hot chunks fill
        # straight from the folded group stat, never from chunk stats.
        return self.kind == "grouped" and self.strategy in (
            "forward", "backward", "mean", "min", "max",
        )

    @property
    def chunk_transform_defer(self) -> bool:
        return self.strategy in ("mean", "min", "max")

    @property
    def chunk_fold_reverse(self) -> bool:
        return self.strategy == "backward"

    def chunk_state(self, pdf, gid):
        """Forward/backward: boundary non-null value ``v_c`` (last/first)
        and its AGE ``age_c`` = rows between it and the carrying boundary
        (NaN value → age = chunk rows). Whole-group stats: per-chunk
        partials (count+sum, or min/max)."""
        cols = [c for c in self.columns if c in pdf.columns]
        if self.strategy in ("mean", "min", "max"):
            num = pdf[cols].apply(
                lambda s: s.astype(np.float64) if s.dtype == object else s
            )
            g = num.groupby(gid, sort=False, observed=True)
            if self.strategy == "mean":
                n = g.count().rename(columns=lambda c: f"n_{c}")
                s = g.sum().rename(columns=lambda c: f"s_{c}")
                return pd.concat([n, s], axis=1)
            agg = g.min() if self.strategy == "min" else g.max()
            return agg.rename(columns=lambda c: f"v_{c}")
        g0 = pdf.groupby(gid, sort=False, observed=True)
        fwd = self.strategy == "forward"
        out = g0.size().to_frame("rows").astype(np.float64)
        pos = g0.cumcount(ascending=not fwd)  # 0 = carrying boundary row
        for c in cols:
            x = pdf[c]
            if x.dtype == object:
                x = x.astype(np.float64)
            st = g0[c].last() if fwd else g0[c].first()
            out[f"v_{c}"] = st.astype(np.float64)
            near = pos.where(x.notna())
            age = near.groupby(gid, sort=False).min()
            out[f"age_{c}"] = age.reindex(out.index).fillna(out["rows"])
        return out

    def fold_chunk_states(self, states):
        gkey = pd.Series(np.zeros(len(states), dtype=np.int64),
                         index=states.index)
        return self.fold_chunk_states_grouped(states, gkey)

    def fold_chunk_states_grouped(self, states, gkey):
        """Forward/backward (chunks boundary-ordered; _fold_global reverses
        for backward): carried value = nearest non-null across the leading
        boundary, age = (A_j − cumR_j) + cumR_{i−1} for the latest
        non-null chunk j ≤ i−1 — a grouped ffill + shift. Whole-group
        stats: fold to the group TOTAL, broadcast to every chunk."""
        key = gkey.to_numpy()
        if self.strategy in ("mean", "min", "max"):
            out = pd.DataFrame(index=states.index, dtype=np.float64)
            if self.strategy == "mean":
                for sc in [c for c in states.columns if c.startswith("s_")]:
                    c = sc[2:]
                    n_tot = states[f"n_{c}"].groupby(key, sort=False
                                                     ).transform("sum")
                    s_tot = states[sc].groupby(key, sort=False
                                               ).transform("sum")
                    out[f"v_{c}"] = (s_tot / n_tot.where(n_tot > 0))
                return out
            fn = "min" if self.strategy == "min" else "max"
            for vc in [c for c in states.columns if c.startswith("v_")]:
                out[vc] = states[vc].groupby(key, sort=False).transform(fn)
            return out
        cols = sorted(c[2:] for c in states.columns if c.startswith("v_"))
        cumR = states["rows"].groupby(key, sort=False).cumsum()
        prevR = cumR - states["rows"]
        out = pd.DataFrame(index=states.index, dtype=np.float64)
        for c in cols:
            v = states[f"v_{c}"]
            vf = v.groupby(key, sort=False).ffill()
            out[f"v_{c}"] = vf.groupby(key, sort=False).shift(1)
            s = (states[f"age_{c}"] - cumR).where(v.notna())
            f = s.groupby(key, sort=False).ffill().groupby(
                key, sort=False
            ).shift(1)
            out[f"age_{c}"] = (f + prevR).fillna(np.inf)
        return out

    def apply_chunk_prefix(self, pdf, gid, prefix):
        if self.strategy in ("mean", "min", "max"):
            # deferred whole-group fill: hot rows fill from the group TOTAL
            for c in self.columns:
                if c not in pdf.columns or f"v_{c}" not in prefix.columns:
                    continue
                if pdf[c].dtype == object:
                    pdf[c] = pdf[c].astype(np.float64)
                fill = gid.map(prefix[f"v_{c}"])
                if fill.notna().any():
                    pdf[c] = pdf[c].fillna(fill)
            return pdf
        fwd = self.strategy == "forward"
        hot = gid.isin(prefix.index)
        if not hot.any():
            return pdf
        sgid = gid[hot]
        pos = pdf.loc[hot].groupby(sgid, sort=False).cumcount(
            ascending=fwd
        )
        for c in self.columns:
            if c not in pdf.columns or f"v_{c}" not in prefix.columns:
                continue
            if pdf[c].dtype == object:
                pdf[c] = pdf[c].astype(np.float64)
            v = sgid.map(prefix[f"v_{c}"])
            if not v.notna().any():
                continue
            fill_ok = v.notna()
            if self.limit is not None:
                age = sgid.map(prefix[f"age_{c}"])
                fill_ok &= (pos + 1 + age) <= self.limit
            # remaining nulls after the chunk-local fill on the leading
            # (forward) / trailing (backward) edge are exactly the ones the
            # carry can complete
            mask = hot.copy()
            mask[hot] = pdf.loc[hot, c].isna() & fill_ok
            # only the edge run: positions before the first non-null input
            edge = pdf.loc[hot, c].notna().groupby(sgid, sort=False).cummax()
            if not fwd:
                # reversed cumcount ordering — recompute in boundary order
                rev = pdf.loc[hot, c].iloc[::-1]
                edge = rev.notna().groupby(sgid[::-1], sort=False).cummax()
                edge = edge.iloc[::-1]
            mask[hot] &= ~edge
            pdf.loc[mask, c] = v[mask[hot].reindex(v.index, fill_value=False)]
        return pdf

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        # mean-fill promotes ints to float
        if self.strategy == "mean":
            return {
                c: pa.float64()
                for c in self.columns
                if pa.types.is_integer(ing.dtypes.get(c, pa.float64()))
            }
        return {}


class StepImputeFastZeroFill(StepImputeFill):
    """Ungrouped constant-zero fill (reference: step.py:158-171)."""

    def __init__(self, sel: Selector = None):
        super().__init__(sel, value=0)
        self.desc = "Impute quickly with 0"


class StepImputeFastForwardFill(StepImputeFill):
    """Grouped forward-fill without limit (reference: step.py:174-199)."""

    def __init__(self, sel: Selector = None):
        super().__init__(sel, strategy="forward")
        self.desc = "Impute with fast ffill"


class StepImputeModel(Step):
    """Impute with a pretrained model callable (reference: step.py:244-260).

    ``model(frame[cols + groups], groups)`` must return a DataFrame of the
    selected columns with nulls imputed. The model object is pickled into the
    stage closure — Ray ships it once per worker, not per batch; it sees whole
    conversations (the kernel runs inside the group-partitioned shuffle), so
    group-aware models behave as in the reference.
    """

    def __init__(self, sel: Selector = None, model=None):
        super().__init__(sel if sel is not None else all_predictors())
        self.desc = "Impute with pretrained imputation model"
        self.model = model

    @property
    def kind(self) -> str:
        return "grouped"

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        cols = [c for c in self.columns if c in pdf.columns]
        out = self.model(pdf[cols + group_cols], group_cols)
        pdf[cols] = np.asarray(out)[:, : len(cols)] if not isinstance(
            out, pd.DataFrame
        ) else out[cols].to_numpy()
        return pdf
