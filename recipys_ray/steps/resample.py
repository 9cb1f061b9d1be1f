"""StepResampling — re-grid each group to a regular time resolution.

Polars-parity semantics (the authoritative reference branch, reference:
recipys/step.py:537-563, verified in SURVEY.md §2.1 #7): per group, generate
the regular time grid anchored at the group's min sequence value with step
``new_resolution``; KEEP only rows whose timestamp lies exactly on the grid
(off-grid rows are dropped, no aggregation); inserted grid rows get nulls,
then per the accumulator map: LAST → per-group forward fill, MEAN / MAX →
fill with the WHOLE-COLUMN mean/max of the post-grid column (the reference
applies ``fill_null(strategy=...)`` without ``.over(group)``, so the fill
statistic is global — reproduced here via a post-pass global aggregate).
All other accumulators are left unfilled, as in the reference.

``mode="agg"`` is the engine's extension (the reference's *pandas* branch,
step.py:566-570): true windowed aggregation into epoch-anchored buckets of
width ``new_resolution`` — one output row per (group, bucket).

Implementation: a row-count-changing frame kernel inside the shared
hash-partition + sorted-scan shuffle. Grid generation is vectorized across
ALL groups in a partition (repeat/arange arithmetic + one exact merge), never
a Python loop per group.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from recipys_ray.aggregates import MINMAX, MOMENTS, column_stats
from recipys_ray.dtypes import is_temporal
from recipys_ray.ingredients import Ingredients
from recipys_ray.selector import Selector, all_predictors
from recipys_ray.steps.base import Step, sequence_or_error
from recipys_ray.steps.historical import Accumulator

_AGG_FN = {
    Accumulator.LAST: "last",
    Accumulator.FIRST: "first",
    Accumulator.MEAN: "mean",
    Accumulator.MAX: "max",
    Accumulator.MIN: "min",
    Accumulator.COUNT: "count",
    Accumulator.MEDIAN: "median",
    Accumulator.VAR: "var",
}


class _PostGlobalFill(Step):
    """Internal node: fill nulls of given columns with the whole-column
    mean/max computed over the current dataset (one aggregate pass)."""

    # the reference computes these fills at TRANSFORM time (step.py:550-553),
    # so bake() on new data must recompute them — never reuse fitted state
    always_refit = True

    def __init__(self, col_stat: dict[str, str]):
        super().__init__(Selector(description="post-fill", names=[]))
        self.col_stat = col_stat  # col -> "mean" | "max"
        self.desc = f"Global fill {col_stat}"
        self._fill: dict[str, float] = {}

    @property
    def requires_fit(self) -> bool:
        return True

    @property
    def kind(self) -> str:
        return "batch"

    def resolve(self, ing: Ingredients) -> None:
        self.columns = [c for c in self.col_stat if c in ing.columns]

    def fit(self, ing: Ingredients) -> None:
        stats = column_stats(ing.dataset, self.columns, {MOMENTS, MINMAX})
        for c in self.columns:
            s = stats[c]
            self._fill[c] = s.mean() if self.col_stat[c] == "mean" else s.max
        self._trained = True

    def transform_batch(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for c in self.columns:
            v = self._fill.get(c)
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            col = tbl.column(c)
            try:
                scalar = pa.scalar(v, type=col.type)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                col = col.cast(pa.float64())
                scalar = pa.scalar(float(v), type=pa.float64())
            tbl = tbl.set_column(
                tbl.column_names.index(c), c, pc.fill_null(col, scalar)
            )
        return tbl

    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        return {
            c: pa.float64()
            for c in self.columns
            if self.col_stat[c] == "mean"
            and pa.types.is_integer(ing.dtypes.get(c, pa.float64()))
        }


class StepResampling(Step):
    def __init__(
        self,
        new_resolution: str = "1h",
        accumulator_dict: Optional[Dict[Selector, Accumulator]] = None,
        default_accumulator: Accumulator = Accumulator.LAST,
        mode: str = "grid",
    ):
        super().__init__(Selector(description="resample", names=None))
        if mode not in ("grid", "agg"):
            raise ValueError(f"Unknown resampling mode {mode}")
        self.new_resolution = new_resolution
        self.acc_dict = (
            accumulator_dict
            if accumulator_dict is not None
            else {all_predictors(): Accumulator.LAST}
        )
        self.default_accumulator = default_accumulator
        self.mode = mode
        self.desc = f"Resample to {new_resolution} ({mode})"
        self._seq_col: str = None
        self._col_acc: dict[str, Accumulator] = {}
        self._expansion: Optional[list[Step]] = None

    @property
    def kind(self) -> str:
        return "grouped"

    @property
    def changes_rowcount(self) -> bool:
        return True

    @property
    def salt_grid_capable(self) -> bool:
        """Grid mode has a dedicated chunk-merge path
        (kernels/chunked.run_salted_resample_grid) when it is the only step
        in its grouped chain."""
        return self.mode == "grid"

    # ------------------------------------------------------------------ #
    def resolve(self, ing: Ingredients) -> None:
        super().resolve(ing)
        seq = sequence_or_error(ing, "resampling step")
        self._seq_col = seq[0]
        if not is_temporal(ing.dtypes[self._seq_col]):
            raise ValueError(
                f"Expected Timedelta or Timestamp object, got "
                f"{ing.dtypes[self._seq_col]}"
            )
        col_acc: dict[str, Accumulator] = {}
        for selector, acc in self.acc_dict.items():
            for col in selector(ing):
                col_acc[col] = acc
        for col in ing.columns:
            if col in col_acc or col in seq or col in self.group_cols:
                continue
            col_acc[col] = self.default_accumulator
        self._col_acc = col_acc

    def expand(self, ing: Ingredients) -> list[Step]:
        if self.mode != "grid":
            return [self]
        if self._expansion is None:  # cache so bake() reuses the fitted node
            post = {
                c: acc.value
                for c, acc in self._col_acc.items()
                if acc in (Accumulator.MEAN, Accumulator.MAX)
            }
            self._expansion = [self] + ([_PostGlobalFill(post)] if post else [])
        return self._expansion

    # ---------------- shuffle combiner (agg mode) ------------------------ #
    @property
    def combinable(self) -> bool:
        """agg-mode with distributive/algebraic accumulators only: rows are
        pre-aggregated per (group, bucket) INSIDE each read block, so the
        shuffle moves one partial row per bucket instead of every raw row —
        the memory bound per partition becomes #buckets, not #rows."""
        return self.mode == "agg" and bool(self._col_acc) and all(
            acc in (Accumulator.MEAN, Accumulator.MAX, Accumulator.MIN,
                    Accumulator.COUNT, Accumulator.VAR)
            for acc in self._col_acc.values()
        )

    def pre_aggregate_batch(self, tbl: pa.Table) -> pa.Table:
        """Raw block → one partial row per (group, bucket): MAX/MIN keep the
        column (same merge fn), MEAN carries (Σx, n), VAR (Σx, Σx², n),
        COUNT n."""
        seq = self._seq_col
        res = pd.Timedelta(self.new_resolution)
        cols = [
            c for c in self._col_acc
            if c not in self.group_cols and c != seq
        ]
        pdf = tbl.select(
            [c for c in dict.fromkeys(
                self.group_cols + self.seq_cols + [seq] + cols
            ) if c in tbl.column_names]
        ).to_pandas()
        pdf[seq] = pdf[seq].dt.floor(res)
        g = pdf.groupby(self.group_cols + [seq], sort=False, observed=True,
                        dropna=False)
        pieces = {}
        # carry any extra sequence (sort) columns as per-bucket minima —
        # they only order rows downstream, the accumulators don't read them
        for extra in self.seq_cols:
            if extra != seq and extra in pdf.columns:
                pieces[extra] = g[extra].min()
        for c in cols:
            if c not in pdf.columns:
                continue
            acc = self._col_acc[c]
            if acc is Accumulator.MAX:
                pieces[c] = g[c].max()
            elif acc is Accumulator.MIN:
                pieces[c] = g[c].min()
            elif acc is Accumulator.COUNT:
                pieces[f"__pn_{c}"] = g[c].count()
            elif acc is Accumulator.MEAN:
                pieces[f"__ps_{c}"] = g[c].sum()
                pieces[f"__pn_{c}"] = g[c].count()
            else:  # VAR
                x = pdf[c].astype(np.float64)
                pieces[f"__ps_{c}"] = x.groupby(
                    [pdf[k] for k in self.group_cols + [seq]], sort=False,
                    dropna=False,
                ).sum()
                pieces[f"__p2_{c}"] = (x * x).groupby(
                    [pdf[k] for k in self.group_cols + [seq]], sort=False,
                    dropna=False,
                ).sum()
                pieces[f"__pn_{c}"] = g[c].count()
        out = pd.DataFrame(pieces).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    # ------------------------------------------------------------------ #
    def transform_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        if self.mode == "grid":
            return self._grid_frame(pdf, group_cols)
        if any(c.startswith("__pn_") for c in pdf.columns):
            return self._agg_merge_partials(pdf, group_cols)
        return self._agg_frame(pdf, group_cols)

    def _agg_merge_partials(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        """Merge the per-block partials emitted by pre_aggregate_batch."""
        seq = self._seq_col
        keys = ["__gid__", seq] + group_cols
        g = pdf.groupby(keys, sort=False, observed=True, dropna=False)
        out = pd.DataFrame(index=g.size().index)
        for c, acc in self._col_acc.items():
            if acc is Accumulator.MAX and c in pdf.columns:
                out[c] = g[c].max()
            elif acc is Accumulator.MIN and c in pdf.columns:
                out[c] = g[c].min()
            elif acc is Accumulator.COUNT and f"__pn_{c}" in pdf.columns:
                out[c] = g[f"__pn_{c}"].sum().astype(np.int64)
            elif acc is Accumulator.MEAN and f"__ps_{c}" in pdf.columns:
                n = g[f"__pn_{c}"].sum()
                out[c] = g[f"__ps_{c}"].sum() / n.where(n > 0)
            elif acc is Accumulator.VAR and f"__p2_{c}" in pdf.columns:
                n = g[f"__pn_{c}"].sum()
                s1 = g[f"__ps_{c}"].sum()
                s2 = g[f"__p2_{c}"].sum()
                nv = n.where(n > 1)
                out[c] = ((s2 - s1 * s1 / nv) / (nv - 1.0)).clip(lower=0.0)
        out = out.reset_index()
        out = out.sort_values(["__gid__", seq], kind="stable",
                              ignore_index=True)
        return out

    def _grid_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        seq = self._seq_col
        res = pd.Timedelta(self.new_resolution)
        gid = pdf["__gid__"].to_numpy()
        s = pdf[seq]
        # per-group min/max (frame is sorted by gid, seq)
        firsts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        lasts = np.r_[firsts[1:] - 1, len(gid) - 1]
        gmin = s.iloc[firsts].to_numpy()
        gmax = s.iloc[lasts].to_numpy()
        res64 = np.timedelta64(res.to_timedelta64())
        counts = ((gmax - gmin) // res64).astype(np.int64) + 1
        total = int(counts.sum())
        # vectorized grid: per group gmin + [0..count) * res
        offsets = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(counts)[:-1]], counts
        )
        grid_ts = np.repeat(gmin, counts) + offsets * res64
        grid = pd.DataFrame(
            {"__gid__": np.repeat(gid[firsts], counts), seq: grid_ts}
        )
        # carry group columns directly from the per-group first rows
        for c in group_cols:
            grid[c] = np.repeat(pdf[c].iloc[firsts].to_numpy(), counts)
        right = pdf.drop_duplicates(subset=["__gid__", seq], keep="first")
        right = right.drop(columns=[c for c in group_cols])
        merged = grid.merge(right, on=["__gid__", seq], how="left")
        # per-group forward fill for LAST-mapped columns (first grid row is
        # always an original row, so the fill never crosses groups)
        last_cols = [
            c
            for c, acc in self._col_acc.items()
            if acc is Accumulator.LAST and c in merged.columns
        ]
        if last_cols:
            merged[last_cols] = merged.groupby("__gid__", sort=False)[
                last_cols
            ].ffill()
        # MEAN/MAX are filled globally by the _PostGlobalFill node; all other
        # accumulators stay null (reference consults only last/mean/max keys)
        return merged[
            ["__gid__"]
            + [c for c in pdf.columns if c in merged.columns and c != "__gid__"]
        ]

    def _agg_frame(
        self, pdf: pd.DataFrame, group_cols: list[str]
    ) -> pd.DataFrame:
        seq = self._seq_col
        res = pd.Timedelta(self.new_resolution)
        s = pdf[seq]
        if pd.api.types.is_timedelta64_dtype(s):
            bucket = s.dt.floor(res)
        else:
            bucket = s.dt.floor(res)  # epoch-anchored bucket left edge
        agg_map = {
            c: _AGG_FN[acc]
            for c, acc in self._col_acc.items()
            if c in pdf.columns and c != "__gid__"
        }
        grouped = pdf.assign(**{seq: bucket}).groupby(
            ["__gid__", seq] + group_cols, sort=False, observed=True, dropna=False
        )
        out = grouped.agg(agg_map).reset_index()
        out = out.sort_values(["__gid__", seq], kind="stable", ignore_index=True)
        return out

    # ------------------------------------------------------------------ #
    def schema_delta(self, ing: Ingredients) -> dict[str, pa.DataType]:
        if self.mode != "agg":
            return {}
        delta = {}
        for c, acc in self._col_acc.items():
            if acc is Accumulator.COUNT:
                delta[c] = pa.int64()
            elif acc in (Accumulator.MEAN, Accumulator.VAR, Accumulator.MEDIAN):
                delta[c] = pa.float64()
        return delta
