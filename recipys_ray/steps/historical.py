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
        duckdb_parity: bool = False,
        approx_median_chunked: bool = False,
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
        # duckdb_parity=True makes MEAN/VAR/SUM reproduce DuckDB 1.0's
        # windowed-aggregate float64 rounding BIT-EXACTLY (verification mode
        # for the driver's value-hash gate; kernels/duckdb_parity.py). The
        # default path uses longdouble segmented cumsums — numerically
        # tighter and cheaper, but rounded differently from any SQL engine.
        self.duckdb_parity = duckdb_parity
        # approx_median_chunked=True opts expanding MEDIAN into the bounded
        # chunk-local salted path with a t-digest carry (aggregates.
        # expanding_median_approx): hot mega-groups stream through bounded
        # tasks at rank error O(q(1−q)/δ) instead of requiring one
        # whole-group task (or hitting SaltConfig.max_carry_rows). Cold
        # groups and unsalted execution stay EXACT — only hot chunks of a
        # salted run are approximated.
        self.approx_median_chunked = approx_median_chunked
        self._parity_offsets: dict | None = None
        self._parity_chunk_offsets: dict | None = None
        self._parity_group_col: str | None = None

    def set_parity_offsets(self, offsets: dict) -> None:
        """key -> duckdb hash-group row offset (compute_duckdb_offsets)."""
        self._parity_offsets = offsets

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
            if self.duckdb_parity and len(group_cols) == 1:
                from recipys_ray.kernels.duckdb_parity import (
                    prefix_frame_duckdb,
                )

                fmap = {
                    Accumulator.MEAN: "mean",
                    Accumulator.VAR: "var",
                    Accumulator.SUM: "sum",
                }
                vals = prefix_frame_duckdb(
                    pdf, cols, gid, pdf[group_cols[0]],
                    self._parity_offsets or {}, [fmap[self.fun]],
                )
                res = np.column_stack(
                    [vals[(c, fmap[self.fun])] for c in cols]
                )
            else:
                res = self._msv_longdouble(pdf, cols, gid)
        elif self.fun is Accumulator.MEDIAN:
            res = (
                g[cols].expanding(min_periods=1).median().reset_index(drop=True)
            )
        res = res.to_numpy() if isinstance(res, pd.DataFrame) else res
        pdf[new_cols] = res
        return pdf

    # -------------- extended-precision expanding moments ------------------ #
    def _msv_longdouble(self, pdf, cols, gid) -> np.ndarray:
        """MEAN/VAR/SUM via anchored cumulative sums accumulated in
        ``np.longdouble`` (80-bit) over the contiguous sorted group
        segments, cast to float64 at the end: residual drift vs exact
        arithmetic ~1e-15 relative, dominated by the oracle engine's own
        rounding rather than ours. Falls back to float64 pandas kernels if
        the frame isn't group-contiguous (never the case inside the
        partition runner, which sorts by (group, seq))."""
        x = pdf[cols].astype(np.float64)
        notna = x.notna()
        n = notna.astype(np.float64).groupby(gid, sort=False).cumsum()
        anchor = x.groupby(gid, sort=False).transform("first")
        codes = gid.to_numpy()
        if len(codes) and (np.diff(codes) < 0).any():
            return self._msv_float64(x, n, anchor, gid)
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        reps = np.diff(np.r_[starts, len(codes)])

        def seg_cumsum(mat: np.ndarray) -> np.ndarray:
            c = np.cumsum(mat, axis=0, dtype=np.longdouble)
            if len(starts) > 1:
                off = np.repeat(c[starts[1:] - 1], reps[1:], axis=0)
                c[starts[1]:] -= off
            return c

        xs = x.to_numpy().astype(np.longdouble) - anchor.to_numpy()
        np.nan_to_num(xs, copy=False, nan=0.0)
        nn = n.to_numpy()
        av = anchor.to_numpy()
        s1 = seg_cumsum(xs)
        with np.errstate(invalid="ignore", divide="ignore"):
            if self.fun is Accumulator.SUM:
                # null until the first non-null (SQL running-SUM semantics)
                res = np.asarray(s1 + av * nn, dtype=np.float64)
                res[nn <= 0] = np.nan
            elif self.fun is Accumulator.MEAN:
                res = np.asarray(
                    s1 / np.where(nn > 0, nn, np.nan) + av, dtype=np.float64
                )
            else:
                s2 = seg_cumsum(xs * xs)
                nv = np.where(nn > 1, nn, np.nan).astype(np.longdouble)
                res = np.asarray(
                    (s2 - s1 * s1 / nv) / (nv - 1.0), dtype=np.float64
                )
                # guard tiny negative values from residual rounding
                res = np.where(nn > 1, np.maximum(res, 0.0), np.nan)
        return res

    def _msv_float64(self, x, n, anchor, gid):
        """Float64 pandas fallback (anchor-shifted closed form)."""
        xs = x - anchor
        s1 = xs.fillna(0.0).groupby(gid, sort=False).cumsum()
        if self.fun is Accumulator.SUM:
            res = (s1 + anchor * n).where(n > 0)
        elif self.fun is Accumulator.MEAN:
            res = s1 / n.where(n > 0) + anchor
        else:
            s2 = (xs * xs).fillna(0.0).groupby(gid, sort=False).cumsum()
            n_valid = n.where(n > 1)
            res = (s2 - s1 * s1 / n_valid) / (n_valid - 1.0)
            res = res.clip(lower=0.0).where(n > 1)
        return res.to_numpy()

    # ---------------- chunk-merge protocol (kernels/chunked.py) ----------- #
    @property
    def chunk_mergeable(self) -> bool:
        # MEDIAN needs the full history — no exact O(1) mergeable state;
        # approx_median_chunked opts into a t-digest carry instead
        if self.fun is Accumulator.MEDIAN:
            return self.approx_median_chunked
        return True

    @property
    def _parity_chunked(self) -> bool:
        return self.duckdb_parity and self.fun in (
            Accumulator.MEAN, Accumulator.VAR, Accumulator.SUM
        )

    @property
    def chunk_transform_defer(self) -> bool:
        # parity mode: the chunk-local transform would produce values the
        # prefix correction cannot repair bit-exactly; cold groups get the
        # ordinary (whole-group parity) transform, hot chunks are computed
        # entirely in apply_chunk_prefix from the carried tree context.
        # Approx-median: same shape — a chunk-local expanding median can't
        # be "corrected" by a prefix, so hot chunks are computed whole in
        # apply_chunk_prefix from the carried digest; cold groups stay exact
        return self._parity_chunked or (
            self.fun is Accumulator.MEDIAN and self.approx_median_chunked
        )

    def set_parity_chunk_offsets(self, group_col: str, chunk_map: dict):
        """(key, salt) -> (group duckdb offset o, chunk row offset r0);
        stashed by run_salted_chunked's parity pre-pass."""
        self._parity_group_col = group_col
        self._parity_chunk_offsets = chunk_map

    def _state_cols(self, pdf) -> list[str]:
        return [c for c in self.columns if c in pdf.columns]

    def chunk_state(self, pdf, gid):
        if self._parity_chunked:
            return self._parity_chunk_state(pdf, gid)
        if self.fun is Accumulator.MEDIAN:
            return self._median_chunk_state(pdf, gid)
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
        # MEAN / VAR: anchored moments (see transform_frame), accumulated in
        # longdouble so the chunk-merged result drifts ≤~1e-15 relative from
        # the unsalted longdouble kernel (float128 survives pandas concat /
        # pickle through the fold round-trip)
        a = g.transform("first")
        n = g.count()
        anchor = g.first()
        codes = gid.to_numpy()
        xs = x.to_numpy().astype(np.longdouble) - a.to_numpy()
        np.nan_to_num(xs, copy=False, nan=0.0)
        if len(codes) and (np.diff(codes) < 0).any():
            # non-contiguous groups (never inside the chunked runner, which
            # sorts by (group, salt, seq)) — order rows by group first
            order = np.argsort(codes, kind="stable")
            codes = codes[order]
            xs = xs[order]
        starts = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(
            codes
        ) else np.array([], dtype=np.int64)
        out = {}
        for ci, c in enumerate(cols):
            out[f"s1_{c}"] = (
                np.add.reduceat(xs[:, ci], starts)
                if len(starts) else np.zeros(0, dtype=np.longdouble)
            )
            out[f"s2_{c}"] = (
                np.add.reduceat(xs[:, ci] * xs[:, ci], starts)
                if len(starts) else np.zeros(0, dtype=np.longdouble)
            )
        st = pd.DataFrame(out, index=n.index)
        return pd.concat(
            [
                n.rename(columns=lambda c: f"n_{c}"),
                st,
                anchor.rename(columns=lambda c: f"a_{c}"),
            ],
            axis=1,
        )

    # -------- approx-median chunked protocol (aggregates t-digest) -------- #
    def _median_chunk_state(self, pdf, gid):
        """Per (group, salt) chunk: one t-digest of the chunk's non-null
        values per column — the bounded (≤ δ centroids) mergeable carry."""
        from recipys_ray.aggregates import digest_of

        cols = self._state_cols(pdf)
        codes = gid.to_numpy()
        first = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(
            codes
        ) else np.array([], dtype=np.int64)
        bounds = np.r_[first, len(codes)]
        out: dict = {f"td_{c}": [] for c in cols}
        for c in cols:
            v = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
            for i in range(len(first)):
                out[f"td_{c}"].append(
                    digest_of(v[bounds[i]:bounds[i + 1]])
                )
        idx = pd.Index(codes[first]) if len(first) else pd.Index([])
        return pd.DataFrame(out, index=idx)

    def _median_fold_grouped(self, states, gkey):
        """Per group in salt order: EXCLUSIVE prefix merge of the chunk
        digests — chunk k carries the digest of everything before it
        (None for the first chunk). O(#chunks × δ) driver work."""
        from recipys_ray.aggregates import merge_digests

        key = gkey.to_numpy()
        cols = sorted(c[3:] for c in states.columns if c.startswith("td_"))
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]]) if len(
            key
        ) else np.array([], dtype=np.int64)
        bounds = np.r_[starts, len(key)]
        out = pd.DataFrame(index=states.index)
        for c in cols:
            chunk_ds = states[f"td_{c}"].tolist()
            pref: list = []
            for i in range(len(starts)):
                acc = None
                for j in range(bounds[i], bounds[i + 1]):
                    pref.append(acc)
                    acc = merge_digests(acc, chunk_ds[j])
            out[f"td_{c}"] = pref
        return out

    def _median_apply_chunks(self, pdf, gid, prefix):
        """Hot chunks: approximate expanding median seeded with the carried
        prefix digest (aggregates.expanding_median_approx)."""
        from recipys_ray.aggregates import expanding_median_approx

        cols = self._state_cols(pdf)
        hot = gid.isin(prefix.index)
        if not hot.any():
            return pdf
        codes = gid.to_numpy()
        hotm = hot.to_numpy()
        idx_hot = np.flatnonzero(hotm)
        hcodes = codes[idx_hot]
        first = np.flatnonzero(np.r_[True, hcodes[1:] != hcodes[:-1]])
        bounds = np.r_[first, len(hcodes)]
        for c in cols:
            oc = f"{c}_{self.suffix}"
            seed_ser = prefix[f"td_{c}"]
            vals_full = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
            res = np.empty(len(idx_hot))
            for i in range(len(first)):
                lo, hi = bounds[i], bounds[i + 1]
                rows = idx_hot[lo:hi]
                res[lo:hi] = expanding_median_approx(
                    vals_full[rows], seed=seed_ser.loc[hcodes[lo]]
                )
            if oc not in pdf.columns:
                pdf[oc] = np.nan
            pdf.loc[hotm, oc] = res
        return pdf

    # -------- duckdb-parity chunked protocol (kernels/duckdb_parity) ------ #
    def _parity_chunk_state(self, pdf, gid):
        """Per (group, salt) chunk: the bounded segment-tree boundary
        payload (head/tail raws + per-level edge nodes) the driver walk
        assembles carried contexts from."""
        from recipys_ray.kernels.chunked import SALT
        from recipys_ray.kernels.duckdb_parity import chunk_parity_payload

        cols = self._state_cols(pdf)
        codes = gid.to_numpy()
        first = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]]) if len(
            codes
        ) else np.array([], dtype=np.int64)
        bounds = np.r_[first, len(codes)]
        keys = pdf[self._parity_group_col].to_numpy()[first]
        salts = pdf[SALT].to_numpy()[first]
        cmap = self._parity_chunk_offsets or {}
        out: dict = {f"ctx_{c}": [] for c in cols}
        for i in range(len(first)):
            lo, hi = bounds[i], bounds[i + 1]
            key = keys[i]
            o, r0 = cmap[(int(key), int(salts[i]))]
            for c in cols:
                v = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)[lo:hi]
                out[f"ctx_{c}"].append(chunk_parity_payload(v, o, r0))
        idx = pd.Index(codes[first]) if len(first) else pd.Index([])
        return pd.DataFrame(out, index=idx)

    def _parity_fold_grouped(self, states, gkey):
        """Driver walk per group (salt order): payloads -> carried ctx per
        chunk. O(#chunks × levels × 16) scalar work on tiny states."""
        from recipys_ray.kernels.duckdb_parity import fold_parity_payloads

        key = gkey.to_numpy()
        cols = sorted(c[4:] for c in states.columns if c.startswith("ctx_"))
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]]) if len(
            key
        ) else np.array([], dtype=np.int64)
        bounds = np.r_[starts, len(key)]
        offsets = self._parity_offsets or {}
        out = pd.DataFrame(index=states.index)
        for c in cols:
            payloads_all = states[f"ctx_{c}"].tolist()
            ctx_col: list = []
            for i in range(len(starts)):
                lo, hi = bounds[i], bounds[i + 1]
                o = int(offsets.get(key[lo], 0))
                ctxs = fold_parity_payloads(payloads_all[lo:hi], o)
                r0 = 0
                for j, ctx in enumerate(ctxs):
                    n = payloads_all[lo + j]["n"]
                    if ctx is None:
                        ctx = {"first": True}
                    ctx["r0"] = r0
                    ctx["o"] = o
                    ctx_col.append(ctx)
                    r0 += n
            out[f"ctx_{c}"] = ctx_col
        return out

    def _parity_apply_chunks(self, pdf, gid, prefix):
        """Hot chunks: bit-exact duckdb eval from the carried tree ctx."""
        from recipys_ray.kernels.duckdb_parity import (
            eval_chunk_with_ctx,
            finalize_mean,
            finalize_sum,
            finalize_var_samp,
        )

        cols = self._state_cols(pdf)
        hot = gid.isin(prefix.index)
        if not hot.any():
            return pdf
        codes = gid.to_numpy()
        hotm = hot.to_numpy()
        idx_hot = np.flatnonzero(hotm)
        hcodes = codes[idx_hot]
        first = np.flatnonzero(np.r_[True, hcodes[1:] != hcodes[:-1]])
        bounds = np.r_[first, len(hcodes)]
        want_var = self.fun is Accumulator.VAR
        for c in cols:
            oc = f"{c}_{self.suffix}"
            ctx_ser = prefix[f"ctx_{c}"]
            vals_full = pdf[c].to_numpy(dtype=np.float64, na_value=np.nan)
            res = np.empty(len(idx_hot))
            for i in range(len(first)):
                lo, hi = bounds[i], bounds[i + 1]
                rows = idx_hot[lo:hi]
                ctx = ctx_ser.loc[hcodes[lo]]
                o, r0 = int(ctx["o"]), int(ctx["r0"])
                cc = None if ctx.get("first") else ctx
                cnt, s, mean, dsq = eval_chunk_with_ctx(
                    vals_full[rows], o, r0, cc, want_var
                )
                if self.fun is Accumulator.SUM:
                    res[lo:hi] = finalize_sum(cnt, s)
                elif self.fun is Accumulator.MEAN:
                    res[lo:hi] = finalize_mean(cnt, s)
                else:
                    res[lo:hi] = finalize_var_samp(cnt, dsq)
            if oc not in pdf.columns:
                pdf[oc] = np.nan
            pdf.loc[hotm, oc] = res
        return pdf

    def fold_chunk_states(self, states):
        gkey = pd.Series(np.zeros(len(states), dtype=np.int64),
                         index=states.index)
        return self.fold_chunk_states_grouped(states, gkey)

    def fold_chunk_states_grouped(self, states, gkey):
        """Vectorized across ALL groups: grouped cummax/cumsum scans."""
        if self._parity_chunked:
            return self._parity_fold_grouped(states, gkey)
        if self.fun is Accumulator.MEDIAN:
            return self._median_fold_grouped(states, gkey)
        key = gkey.to_numpy()
        g = states.groupby(key, sort=False)
        if self.fun in (Accumulator.MAX, Accumulator.MIN):
            # an all-NaN chunk leaves NaN at its state row after the grouped
            # cumulative scan; forward-fill WITHIN the group before shifting
            # so the carried running max/min flows across the NaN hole
            # (otherwise the next chunk would compute from local values only)
            scan = g.cummax() if self.fun is Accumulator.MAX else g.cummin()
            scan = scan.groupby(key, sort=False).ffill()
            return scan.groupby(key, sort=False).shift(1)
        if self.fun in (Accumulator.COUNT, Accumulator.SUM):
            return (g.cumsum() - states).fillna(0.0)
        # MEAN / VAR: re-anchor each chunk's longdouble moments to the
        # group's first chunk anchor, then per-group EXCLUSIVE prefix sums —
        # all in longdouble numpy (pandas groupby C kernels don't take
        # float128). ``states`` arrives sorted by (group, salt): runs are
        # contiguous.
        out = pd.DataFrame(index=states.index)
        cols = sorted({c[2:] for c in states.columns if c.startswith("n_")})
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]]) if len(
            key
        ) else np.array([], dtype=np.int64)
        reps = np.diff(np.r_[starts, len(key)])

        def seg_excl_cumsum(vec: np.ndarray) -> np.ndarray:
            c = np.cumsum(vec, dtype=np.longdouble)
            if len(starts) > 1:
                off = np.repeat(c[starts[1:] - 1], reps[1:])
                c[starts[1]:] -= off
            return c - vec

        for c in cols:
            n = states[f"n_{c}"].to_numpy().astype(np.longdouble)
            a = states[f"a_{c}"].to_numpy(dtype=np.float64)
            a_star = np.repeat(
                pd.Series(a).groupby(key, sort=False).first().to_numpy(),
                reps,
            ) if len(key) else a
            # groupby.first skips NaN: a_star = first chunk WITH data
            d = (a - a_star).astype(np.longdouble)
            np.nan_to_num(d, copy=False, nan=0.0)
            s1 = np.asarray(states[f"s1_{c}"], dtype=np.longdouble)
            s2_shift = (
                np.asarray(states[f"s2_{c}"], dtype=np.longdouble)
                + 2 * d * s1 + n * d * d
            )
            s1_shift = s1 + n * d
            out[f"n_{c}"] = np.asarray(seg_excl_cumsum(n), dtype=np.float64)
            out[f"s1_{c}"] = pd.Series(
                seg_excl_cumsum(s1_shift), index=states.index
            )
            out[f"s2_{c}"] = pd.Series(
                seg_excl_cumsum(s2_shift), index=states.index
            )
            out[f"a_{c}"] = a_star  # group anchor, constant per group
        return out

    def apply_chunk_prefix(self, pdf, gid, prefix):
        if self._parity_chunked:
            return self._parity_apply_chunks(pdf, gid, prefix)
        if self.fun is Accumulator.MEDIAN:
            return self._median_apply_chunks(pdf, gid, prefix)
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
                sg = sgid.to_numpy()
                # gather longdouble prefix states via positional reindex
                # (Series.map would round float128 through object boxing)
                pre = prefix.reindex(sg)
                a = pre[f"a_{c}"].to_numpy(dtype=np.float64)
                pn = np.asarray(pre[f"n_{c}"], dtype=np.longdouble)
                ps1 = np.asarray(pre[f"s1_{c}"], dtype=np.longdouble)
                ps2 = np.asarray(pre[f"s2_{c}"], dtype=np.longdouble)
                np.nan_to_num(pn, copy=False, nan=0.0)
                np.nan_to_num(ps1, copy=False, nan=0.0)
                np.nan_to_num(ps2, copy=False, nan=0.0)
                # chunks with no group values at all: anchor NaN → use the
                # chunk-local anchor so the arithmetic stays finite
                ca = sub.groupby(sgid, sort=False).transform("first")
                a = np.where(np.isnan(a), ca.to_numpy(), a)
                xv = sub.to_numpy()
                xs = xv.astype(np.longdouble) - a
                np.nan_to_num(xs, copy=False, nan=0.0)
                starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
                reps = np.diff(np.r_[starts, len(sg)])

                def seg_cumsum(vec):
                    cc = np.cumsum(vec, dtype=np.longdouble)
                    if len(starts) > 1:
                        off = np.repeat(cc[starts[1:] - 1], reps[1:])
                        cc[starts[1]:] -= off
                    return cc

                n_t = seg_cumsum(
                    (~np.isnan(xv)).astype(np.longdouble)
                ) + pn
                s1_t = seg_cumsum(xs) + ps1
                with np.errstate(invalid="ignore", divide="ignore"):
                    if self.fun is Accumulator.MEAN:
                        val = np.asarray(
                            s1_t / np.where(n_t > 0, n_t, np.nan) + a,
                            dtype=np.float64,
                        )
                    else:
                        s2_t = seg_cumsum(xs * xs) + ps2
                        nv = np.where(n_t > 1, n_t, np.nan).astype(
                            np.longdouble
                        )
                        val = np.asarray(
                            (s2_t - s1_t * s1_t / nv) / (nv - 1.0),
                            dtype=np.float64,
                        )
                        val = np.where(
                            n_t > 1, np.maximum(val, 0.0), np.nan
                        )
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
