"""StepHistorical — per-group expanding (point-in-time) aggregates.

Re-expression of the reference's flagship step (reference:
recipys/step.py:263-363): for each selected numeric column emit
``<col>_<suffix>`` where row *t* aggregates only rows ≤ *t* of the same group
(zero temporal leakage by construction). Runs as a frame kernel inside the
shared hash-partition + sorted-scan shuffle.

Kernels are fully vectorized across ALL groups in a partition:
- MAX/MIN  → pandas grouped ``cummax``/``cummin`` (C impl; nulls stay null at
  null positions while the running value skips them — verified identical to
  polars ``cum_max().over(g)``, SURVEY.md §2.5.1);
- COUNT    → grouped cumulative count of non-nulls (``notna().cumsum()``);
- MEAN/VAR → grouped cumulative sums of x and x² with non-null counts
  (Welford-free closed form; ddof=1 for VAR, null until ≥ 2 samples —
  matches polars ``rolling_var(window_size=H, min_periods=0)``);
- MEDIAN   → pandas grouped ``expanding().median()`` (skiplist-based,
  O(n log n) per group) — the one kernel with superlinear cost; documented.

Divergence from the reference (documented): the reference mutates
``self.suffix = "_" + self.suffix`` on every transform call (step.py:311), so
prep-then-bake crashes; here the suffix is applied per invocation.
"""

from __future__ import annotations

from enum import Enum

import numpy as np
import pandas as pd
import pyarrow as pa

from recipys_ray.ingredients import Ingredients
from recipys_ray.selector import Selector, all_numeric_predictors
from recipys_ray.steps.base import Step


class Accumulator(Enum):
    MAX = "max"
    MIN = "min"
    MEAN = "mean"
    MEDIAN = "median"
    COUNT = "count"
    VAR = "var"
    FIRST = "first"
    LAST = "last"
    SUM = "sum"  # engine extension — not in the reference enum


_SUPPORTED = {
    Accumulator.MAX,
    Accumulator.MIN,
    Accumulator.MEAN,
    Accumulator.MEDIAN,
    Accumulator.COUNT,
    Accumulator.VAR,
    Accumulator.SUM,  # engine extension
}


class StepHistorical(Step):
    def __init__(
        self,
        sel: Selector = None,
        fun: Accumulator = Accumulator.MAX,
        suffix: str = None,
        role: str = "predictor",
    ):
        super().__init__(sel if sel is not None else all_numeric_predictors())
        if not isinstance(fun, Accumulator):
            raise TypeError(
                f"Expected Accumulator enum for function, got {fun.__class__}"
            )
        self.desc = f"Create historical {fun}"
        self.fun = fun
        self.suffix = suffix if suffix is not None else fun.value
        self.role = role

    @property
    def kind(self) -> str:
        return "grouped"

    def _new_columns(self) -> list[str]:
        return [f"{c}_{self.suffix}" for c in self.columns]

    def frame_outputs(self) -> list[str]:
        return self._new_columns()

    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        if self.fun not in _SUPPORTED:
            raise TypeError(
                f"Expected Accumulator enum for function, got {self.fun.__class__}"
            )
        gid = pdf["__gid__"]
        cols = [c for c in self.columns if c in pdf.columns]
        new_cols = [f"{c}_{self.suffix}" for c in cols]
        if not cols:
            return pdf
        # an all-null Arrow column surfaces as object dtype in pandas; the
        # selector guaranteed these are numeric, so coerce for the C kernels
        for c in cols:
            if pdf[c].dtype == object:
                pdf[c] = pdf[c].astype(np.float64)
        g = pdf.groupby(gid, sort=False, observed=True)
        if self.fun is Accumulator.MAX:
            res = g[cols].cummax()
        elif self.fun is Accumulator.MIN:
            res = g[cols].cummin()
        elif self.fun is Accumulator.COUNT:
            # uint32 to mirror polars cum_count (u32) — deliberately excluded
            # from the numeric-predictor whitelist, so e.g. StepScale skips
            # count columns exactly like the reference does
            res = (
                pdf[cols].notna().astype(np.int64).groupby(gid, sort=False).cumsum()
            ).astype(np.uint32)
        elif self.fun in (Accumulator.MEAN, Accumulator.VAR, Accumulator.SUM):
            x = pdf[cols].astype(np.float64)
            notna = x.notna()
            n = notna.astype(np.float64).groupby(gid, sort=False).cumsum()
            # Anchor-shift: subtract each group's first non-null value before
            # the cumulative sums. VAR is shift-invariant and MEAN/SUM add the
            # anchor back exactly, but the shifted deviations are small, so the
            # closed-form (s2 - s1^2/n)/(n-1) no longer cancels catastrophically
            # at large-magnitude inputs (e.g. epoch seconds).
            anchor = x.groupby(gid, sort=False).transform("first")
            xs = x - anchor
            s1 = xs.fillna(0.0).groupby(gid, sort=False).cumsum()
            if self.fun is Accumulator.SUM:
                # null until the first non-null (SQL running-SUM semantics)
                res = (s1 + anchor * n).where(n > 0)
            elif self.fun is Accumulator.MEAN:
                res = s1 / n.where(n > 0) + anchor
            else:
                s2 = (xs * xs).fillna(0.0).groupby(gid, sort=False).cumsum()
                n_valid = n.where(n > 1)
                res = (s2 - s1 * s1 / n_valid) / (n_valid - 1.0)
                # guard tiny negative values from residual rounding
                res = res.clip(lower=0.0).where(n > 1)
        elif self.fun is Accumulator.MEDIAN:
            res = (
                g[cols].expanding(min_periods=1).median().reset_index(drop=True)
            )
        res = res.to_numpy() if isinstance(res, pd.DataFrame) else res
        pdf[new_cols] = res
        return pdf

    # ---------------- chunk-merge protocol (kernels/chunked.py) ----------- #
    @property
    def chunk_mergeable(self) -> bool:
        # MEDIAN needs the full history — no O(1) mergeable state
        return self.fun is not Accumulator.MEDIAN

    def _state_cols(self, pdf) -> list[str]:
        return [c for c in self.columns if c in pdf.columns]

    def chunk_state(self, pdf, gid):
        cols = self._state_cols(pdf)
        x = pdf[cols].astype(np.float64)
        g = x.groupby(gid, sort=False, observed=True)
        if self.fun is Accumulator.MAX:
            return g.max().rename(columns=lambda c: f"m_{c}")
        if self.fun is Accumulator.MIN:
            return g.min().rename(columns=lambda c: f"m_{c}")
        if self.fun is Accumulator.COUNT:
            return g.count().rename(columns=lambda c: f"n_{c}")
        if self.fun is Accumulator.SUM:
            n = g.count().rename(columns=lambda c: f"n_{c}")
            s = g.sum().rename(columns=lambda c: f"s_{c}")
            return pd.concat([n, s], axis=1)
        # MEAN / VAR: anchored moments (see transform_frame)
        a = g.transform("first")
        xs = x - a
        n = g.count()
        s1 = xs.fillna(0.0).groupby(gid, sort=False, observed=True).sum()
        s2 = (xs * xs).fillna(0.0).groupby(gid, sort=False, observed=True).sum()
        anchor = g.first()
        return pd.concat(
            [
                n.rename(columns=lambda c: f"n_{c}"),
                s1.rename(columns=lambda c: f"s1_{c}"),
                s2.rename(columns=lambda c: f"s2_{c}"),
                anchor.rename(columns=lambda c: f"a_{c}"),
            ],
            axis=1,
        )

    def fold_chunk_states(self, states):
        gkey = pd.Series(np.zeros(len(states), dtype=np.int64),
                         index=states.index)
        return self.fold_chunk_states_grouped(states, gkey)

    def fold_chunk_states_grouped(self, states, gkey):
        """Vectorized across ALL groups: grouped cummax/cumsum scans."""
        key = gkey.to_numpy()
        g = states.groupby(key, sort=False)
        if self.fun is Accumulator.MAX:
            return g.cummax().pipe(
                lambda df: df.groupby(key, sort=False).shift(1)
            )
        if self.fun is Accumulator.MIN:
            return g.cummin().pipe(
                lambda df: df.groupby(key, sort=False).shift(1)
            )
        if self.fun in (Accumulator.COUNT, Accumulator.SUM):
            return (g.cumsum() - states).fillna(0.0)
        out = pd.DataFrame(index=states.index)
        cols = sorted({c[2:] for c in states.columns if c.startswith("n_")})
        for c in cols:
            n = states[f"n_{c}"]
            a = states[f"a_{c}"]
            a_star = a.groupby(key, sort=False).transform("first")
            d = (a - a_star).fillna(0.0)
            s1 = states[f"s1_{c}"] + n * d
            s2 = states[f"s2_{c}"] + 2 * d * states[f"s1_{c}"] + n * d * d
            out[f"n_{c}"] = n.groupby(key, sort=False).cumsum() - n
            out[f"s1_{c}"] = s1.groupby(key, sort=False).cumsum() - s1
            out[f"s2_{c}"] = s2.groupby(key, sort=False).cumsum() - s2
            out[f"a_{c}"] = a_star  # group anchor, constant per group
        return out

    def apply_chunk_prefix(self, pdf, gid, prefix):
        cols = self._state_cols(pdf)
        for c in cols:
            oc = f"{c}_{self.suffix}"
            if oc not in pdf.columns:
                continue
            if self.fun in (Accumulator.MAX, Accumulator.MIN):
                pm = gid.map(prefix[f"m_{c}"])
                mask = pdf[oc].notna() & pm.notna()
                if mask.any():
                    vals = (
                        np.maximum(pdf.loc[mask, oc], pm[mask])
                        if self.fun is Accumulator.MAX
                        else np.minimum(pdf.loc[mask, oc], pm[mask])
                    )
                    pdf.loc[mask, oc] = vals.astype(pdf[oc].dtype, copy=False)
            elif self.fun is Accumulator.COUNT:
                add = gid.map(prefix[f"n_{c}"]).fillna(0.0)
                pdf[oc] = (
                    pdf[oc].astype(np.int64) + add.astype(np.int64)
                ).astype(np.uint32)
            elif self.fun is Accumulator.SUM:
                ps = gid.map(prefix[f"s_{c}"])
                pn = gid.map(prefix[f"n_{c}"]).fillna(0.0)
                m1 = pdf[oc].notna() & ps.notna()
                pdf.loc[m1, oc] = pdf.loc[m1, oc] + ps[m1]
                m2 = pdf[oc].isna() & (pn > 0)
                pdf.loc[m2, oc] = ps[m2]
            else:  # MEAN / VAR: recompute from inputs + prefix moments
                hot = gid.isin(prefix.index)
                if not hot.any():
                    continue
                sub = pdf.loc[hot, c].astype(np.float64)
                sgid = gid[hot]
                a = sgid.map(prefix[f"a_{c}"])
                pn = sgid.map(prefix[f"n_{c}"]).fillna(0.0)
                ps1 = sgid.map(prefix[f"s1_{c}"]).fillna(0.0)
                ps2 = sgid.map(prefix[f"s2_{c}"]).fillna(0.0)
                # chunks with no group values at all: anchor NaN → use the
                # chunk-local anchor so the arithmetic stays finite
                ca = sub.groupby(sgid, sort=False).transform("first")
                a = a.fillna(ca)
                xs = sub - a
                n_t = (
                    sub.notna().astype(np.float64)
                    .groupby(sgid, sort=False).cumsum() + pn
                )
                s1_t = xs.fillna(0.0).groupby(sgid, sort=False).cumsum() + ps1
                if self.fun is Accumulator.MEAN:
                    val = s1_t / n_t.where(n_t > 0) + a
                else:
                    s2_t = (
                        (xs * xs).fillna(0.0).groupby(sgid, sort=False).cumsum()
                        + ps2
                    )
                    nv = n_t.where(n_t > 1)
                    val = ((s2_t - s1_t * s1_t / nv) / (nv - 1.0)).clip(
                        lower=0.0
                    ).where(n_t > 1)
                pdf.loc[hot, oc] = val
        return pdf

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        if self.fun is Accumulator.COUNT:
            t = pa.uint32()  # polars cum_count parity (excluded from numeric sel)
            return {f"{c}_{self.suffix}": t for c in self.columns}
        if self.fun in (
            Accumulator.MEAN,
            Accumulator.MEDIAN,
            Accumulator.VAR,
            Accumulator.SUM,
        ):
            return {f"{c}_{self.suffix}": pa.float64() for c in self.columns}
        # MAX/MIN keep the source dtype (floats once nulls appear)
        return {
            f"{c}_{self.suffix}": ing.dtypes.get(c, pa.float64())
            for c in self.columns
        }

    def role_delta(self) -> dict[str, str]:
        return {f"{c}_{self.suffix}": self.role for c in self.columns}
