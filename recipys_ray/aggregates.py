"""Distributed fit-time column statistics.

One streaming ``map_batches`` pass emits a tiny partial-stats row per input
block (count / sum / sumsq / min / max, optional value-counts for vocab and
exact weighted quantiles); the driver merges the partials. This is the
partial-aggregate + broadcast pattern: no shuffle, output is O(#blocks), and
the merged result is broadcast back into transform stages as plain Python
state (reference analogue: sklearn transformer ``fit`` in StepSklearn,
reference step.py:393-413 — there a single-process whole-table fit).

Scale notes (100 TB): the moments/minmax path is O(#blocks) rows of a few
floats — free at any scale. The vocab / quantile path merges per-block
value-counts; that is exact and cheap for categorical-cardinality columns
(vocabularies), and for continuous columns it degrades gracefully: when a
block's distinct count exceeds ``max_exact_distinct`` we bin the block values
into a fixed-width histogram between the block min/max (deterministic), which
bounds partial size while keeping quantile error ≤ bin width. A t-digest
would be the next refinement.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MOMENTS = "moments"  # count, sum, sumsq → mean/var/std
MINMAX = "minmax"
VOCAB = "vocab"  # sorted distinct non-null values
QUANTILES = "quantiles"  # merged value-counts → weighted percentiles


class TDigest:
    """Merging t-digest (Dunning & Ertl) with the k1 arcsine scale function,
    built and merged fully vectorized: sorted (value, weight) pairs are
    clustered at FIXED quantile boundaries q_j = (1 + sin(2πj/δ))/2 — the
    uniform-k-step inverse of k1(q) = (δ/2π)·asin(2q−1) — so tails get
    proportionally finer centroids. Size ≤ δ centroids; rank error is
    O(q(1−q)/δ) (validated in tests/test_aggregates_tdigest.py).
    """

    __slots__ = ("means", "weights", "vmin", "vmax", "delta")

    def __init__(self, means, weights, vmin, vmax, delta=256):
        self.means = np.asarray(means, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.vmin = float(vmin)
        self.vmax = float(vmax)
        self.delta = delta

    @staticmethod
    def _boundaries(delta: int) -> np.ndarray:
        j = np.arange(-delta // 4, delta // 4 + 1)
        return (1.0 + np.sin(2.0 * np.pi * j / delta)) / 2.0

    @classmethod
    def from_weighted(cls, values, weights, delta: int = 256) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        w = np.asarray(weights, dtype=np.float64)
        order = np.argsort(v, kind="stable")
        v, w = v[order], w[order]
        total = w.sum()
        qmid = (np.cumsum(w) - w / 2.0) / total
        bounds = cls._boundaries(delta)
        bucket = np.searchsorted(bounds, qmid, side="right")
        nb = len(bounds) + 1
        bw = np.zeros(nb)
        bs = np.zeros(nb)
        np.add.at(bw, bucket, w)
        np.add.at(bs, bucket, v * w)
        keep = bw > 0
        return cls(bs[keep] / bw[keep], bw[keep], v[0], v[-1], delta)

    def merged_with(self, other: "TDigest") -> "TDigest":
        d = self.from_weighted(
            np.r_[self.means, other.means],
            np.r_[self.weights, other.weights],
            self.delta,
        )
        d.vmin = min(self.vmin, other.vmin)
        d.vmax = max(self.vmax, other.vmax)
        return d

    def quantile(self, q) -> np.ndarray:
        """Linear interpolation between centroid midpoints, clamped to the
        observed [min, max]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        total = self.weights.sum()
        centers = (np.cumsum(self.weights) - self.weights / 2.0) / total
        xs = np.r_[0.0, centers, 1.0]
        ys = np.r_[self.vmin, self.means, self.vmax]
        return np.interp(qs, xs, ys)


@dataclass
class ColStats:
    count: int = 0  # non-null count
    total: int = 0  # row count incl. nulls
    sum: float = 0.0
    sumsq: float = 0.0
    min: Optional[float] = None
    max: Optional[float] = None
    # value → weight (exact when cardinality permits, histogram-binned else)
    value_counts: Optional[dict] = None
    exact: bool = True
    # merged t-digest — the quantile source once cardinality exceeds the
    # exact threshold (tighter tail bounds than the histogram fallback)
    tdigest: Optional[TDigest] = None

    # ---------------- derived ----------------
    @property
    def n_null(self) -> int:
        return self.total - self.count

    def mean(self) -> float:
        return self.sum / self.count if self.count else float("nan")

    def var(self, ddof: int = 0) -> float:
        if self.count <= ddof:
            return float("nan")
        m = self.mean()
        v = self.sumsq / self.count - m * m
        v = max(v, 0.0)
        if ddof:
            v = v * self.count / (self.count - ddof)
        return v

    def std(self, ddof: int = 0) -> float:
        return float(np.sqrt(self.var(ddof)))

    def vocabulary(self) -> list:
        """Sorted distinct non-null values (sklearn category ordering)."""
        if self.value_counts is None:
            return []
        return sorted(self.value_counts.keys())

    def quantile(self, q) -> np.ndarray:
        """Weighted percentile with linear interpolation — equals
        ``np.percentile`` on the expanded multiset when stats are exact;
        t-digest interpolation (rank error O(q(1−q)/δ)) when not."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if not self.exact and self.tdigest is not None:
            return self.tdigest.quantile(qs)
        if not self.value_counts:
            return np.full(len(qs), np.nan)
        vals = np.array(sorted(self.value_counts.keys()), dtype=np.float64)
        wts = np.array([self.value_counts[v] for v in vals], dtype=np.float64)
        cum = np.cumsum(wts)
        n = cum[-1]
        if n == 1:
            return np.full(len(qs), vals[0])
        # positions of each distinct value in the sorted expanded array:
        # value i occupies ranks [cum[i-1], cum[i]-1] (0-based)
        first_rank = cum - wts  # first 0-based rank of each distinct value
        last_rank = cum - 1
        out = np.empty(len(qs))
        for j, qq in enumerate(qs):
            h = qq * (n - 1)  # fractional rank, numpy 'linear' interpolation
            # snap ulp-level float error to the integer rank — otherwise a
            # grid value lands epsilon away from the true data value and
            # exact-match interpolation (QuantileTransformer ties) breaks
            if abs(h - round(h)) < 1e-9 * max(1.0, abs(h)):
                h = float(round(h))
            lo = int(np.floor(h))
            hi = int(np.ceil(h))
            # map ranks to values via searchsorted on last_rank
            v_lo = vals[np.searchsorted(last_rank, lo)]
            v_hi = vals[np.searchsorted(last_rank, hi)]
            out[j] = v_lo + (h - lo) * (v_hi - v_lo)
        _ = first_rank  # documented invariant; not needed in the lookup
        return out


def digest_of(values: np.ndarray, delta: int = 256) -> Optional[TDigest]:
    """TDigest over the non-NaN values; None when no observations (the
    carry representation for an all-null chunk)."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return None
    return TDigest.from_weighted(v, np.ones(len(v)), delta)


def merge_digests(a: Optional[TDigest], b: Optional[TDigest]):
    if a is None:
        return b
    if b is None:
        return a
    return a.merged_with(b)


def expanding_median_approx(
    values: np.ndarray,
    seed: Optional[TDigest] = None,
    delta: int = 256,
    block: int = 1024,
) -> np.ndarray:
    """Approximate per-row expanding median with a bounded carry — the
    chunk-mergeable formulation expanding MEDIAN lacks exactly.

    Row *i* gets the (weighted, interpolated) q=0.5 point of the multiset
    ``seed ∪ values[:i+1]`` (NaNs skipped; rows with an empty history get
    NaN), where ``seed`` is a t-digest of everything before this chunk.
    Exactness within a block of ``block`` rows, t-digest compression
    (rank error O(q(1−q)/δ)) across blocks and chunks.

    Vectorized per block: the combined CDF is (digest interpolated rank) +
    (exact rank among the block prefix, from one (block × obs) dominance
    table), and the per-row median is a 60-step vectorized bisection on
    that monotone CDF. Memory and state are O(block² + δ) regardless of
    total history length — a 10⁸-row group streams through in bounded
    tasks instead of one unbounded carry."""
    v = np.asarray(values, dtype=np.float64)
    out = np.full(len(v), np.nan)
    D = seed
    for lo in range(0, len(v), block):
        b = v[lo:lo + block]
        K = len(b)
        obs = ~np.isnan(b)
        m = int(obs.sum())
        w_d = float(D.weights.sum()) if D is not None else 0.0
        cnt = np.cumsum(obs)
        wtot = w_d + cnt
        have = wtot > 0
        if not have.any():
            continue
        if m:
            pos_obs = np.flatnonzero(obs)
            order = np.argsort(b[pos_obs], kind="stable")
            sv = b[pos_obs][order]
            orig = pos_obs[order]
            pr = np.zeros((K, m + 1), dtype=np.int32)
            np.cumsum(
                orig[None, :] <= np.arange(K)[:, None], axis=1, out=pr[:, 1:]
            )
        else:
            sv = np.empty(0)
            pr = np.zeros((K, 1), dtype=np.int32)
        if D is not None:
            # inverse of TDigest.quantile's piecewise-linear map: value →
            # cumulative weight in the digest
            centers = (
                np.cumsum(D.weights) - D.weights / 2.0
            ) / w_d
            xs_d = np.r_[D.vmin, D.means, D.vmax]
            ys_d = np.r_[0.0, centers, 1.0]
            x_lo = min(D.vmin, sv[0]) if m else D.vmin
            x_hi = max(D.vmax, sv[-1]) if m else D.vmax
        else:
            x_lo, x_hi = sv[0], sv[-1]
        rows = np.arange(K)
        target = wtot / 2.0
        # median = midpoint of x1 = inf{x: C(x) ≥ W/2} and x2 = inf{x:
        # C(x) > W/2}: on the exact step-CDF part this reproduces pandas'
        # average-of-two-middles for even counts (x1 = lower middle, x2 =
        # upper middle) and the single middle value for odd counts
        if D is None:
            # no digest yet → C is a pure step CDF over the block prefix:
            # read x1/x2 straight off the rank table (argmax over the
            # nondecreasing pr rows), bit-exact incl. median == min value
            j1 = (pr >= target[:, None]).argmax(axis=1)
            j2 = (pr > target[:, None]).argmax(axis=1)
            res = 0.5 * (
                sv[np.maximum(j1, 1) - 1] + sv[np.maximum(j2, 1) - 1]
            )
        else:
            # digest present → mixed step + piecewise-linear CDF; a 60-step
            # vectorized bisection (error ≤ range·2⁻⁶⁰, far below the
            # digest's own rank error) finds both infima
            lo1 = np.full(K, x_lo)
            hi1 = np.full(K, x_hi)
            lo2 = lo1.copy()
            hi2 = hi1.copy()
            for _ in range(60):
                for blo, bhi, strict in ((lo1, hi1, False), (lo2, hi2, True)):
                    mid = 0.5 * (blo + bhi)
                    rank = pr[
                        rows, np.searchsorted(sv, mid, side="right")
                    ].astype(np.float64)
                    rank += w_d * np.interp(mid, xs_d, ys_d)
                    go_hi = (rank <= target) if strict else (rank < target)
                    np.copyto(blo, mid, where=go_hi)
                    np.copyto(bhi, mid, where=~go_hi)
            res = 0.25 * (lo1 + hi1 + lo2 + hi2)
        out[lo:lo + K][have] = res[have]
        if m:
            D = merge_digests(
                D, TDigest.from_weighted(sv, np.ones(m), delta)
            )
    return out


def _partial_for_column(
    arr: pa.ChunkedArray | pa.Array,
    want: set[str],
    max_exact_distinct: int,
    hist_bins: int,
) -> dict:
    out: dict = {"total": len(arr)}
    is_num = pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type)
    out["count"] = len(arr) - arr.null_count
    if is_num and (MOMENTS in want or MINMAX in want or QUANTILES in want):
        # nulls become NaN in the numpy view; skip both (sklearn NaN policy)
        np_arr = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(np_arr)
        out["count"] = int(valid.sum())
        if MOMENTS in want:
            out["sum"] = float(np.nansum(np_arr))
            out["sumsq"] = float(np.nansum(np_arr * np_arr))
        if (MINMAX in want or QUANTILES in want) and out["count"]:
            out["min"] = float(np.nanmin(np_arr))
            out["max"] = float(np.nanmax(np_arr))
    if VOCAB in want or QUANTILES in want:
        if pa.types.is_dictionary(arr.type):
            if isinstance(arr, pa.ChunkedArray):
                arr2 = arr.combine_chunks()
            else:
                arr2 = arr
            arr2 = arr2.cast(arr.type.value_type)
        else:
            arr2 = arr
        vc = pc.value_counts(arr2.drop_null())
        values = vc.field("values").to_pylist()
        counts = vc.field("counts").to_pylist()
        if QUANTILES in want and is_num and len(values):
            # t-digest partial from EVERY block (cheap, ≤ δ centroids): the
            # merged digest must cover all rows even when only some blocks
            # exceed the exact-cardinality threshold
            v0 = np.asarray(values, dtype=np.float64)
            c0 = np.asarray(counts, dtype=np.float64)
            td = TDigest.from_weighted(v0, c0)
            out["tdigest"] = (td.means, td.weights, td.vmin, td.vmax)
        if QUANTILES in want and is_num and len(values) > max_exact_distinct:
            # deterministic histogram binning for value_counts compatibility
            v = np.asarray(values, dtype=np.float64)
            c = np.asarray(counts, dtype=np.float64)
            lo, hi = out.get("min"), out.get("max")
            if hi is not None and lo is not None and hi > lo:
                edges = np.linspace(lo, hi, hist_bins + 1)
                centers = (edges[:-1] + edges[1:]) / 2
                idx = np.clip(
                    np.searchsorted(edges, v, side="right") - 1, 0, hist_bins - 1
                )
                binned = np.zeros(hist_bins)
                np.add.at(binned, idx, c)
                keep = binned > 0
                values = centers[keep].tolist()
                counts = binned[keep].tolist()
                out["exact"] = False
        out["value_counts"] = dict(zip(values, counts))
    return out


class _PartialStats:
    """Per-block partial-stats emitter (plain function → stateless tasks)."""

    def __init__(self, cols, want, max_exact_distinct, hist_bins):
        self.cols = cols
        self.want = want
        self.max_exact_distinct = max_exact_distinct
        self.hist_bins = hist_bins

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = {
            c: _partial_for_column(
                tbl.column(c), self.want, self.max_exact_distinct, self.hist_bins
            )
            for c in self.cols
            if c in tbl.column_names
        }
        return pa.table({"partial": pa.array([pickle.dumps(payload)], pa.binary())})


def _merge_partial(agg: ColStats, p: dict) -> None:
    agg.total += p.get("total", 0)
    agg.count += p.get("count", 0)
    agg.sum += p.get("sum", 0.0)
    agg.sumsq += p.get("sumsq", 0.0)
    for key, fn in (("min", min), ("max", max)):
        v = p.get(key)
        if v is not None:
            cur = getattr(agg, key)
            setattr(agg, key, v if cur is None else fn(cur, v))
    vc = p.get("value_counts")
    if vc is not None:
        if agg.value_counts is None:
            agg.value_counts = {}
        for val, cnt in vc.items():
            agg.value_counts[val] = agg.value_counts.get(val, 0) + cnt
    if not p.get("exact", True):
        agg.exact = False
    td = p.get("tdigest")
    if td is not None:
        d = TDigest(*td)
        agg.tdigest = d if agg.tdigest is None else agg.tdigest.merged_with(d)


def column_stats(
    ds,
    cols: Iterable[str],
    want: set[str],
    max_exact_distinct: int = 100_000,
    hist_bins: int = 4096,
) -> dict[str, ColStats]:
    """Compute merged column statistics over a Dataset in one streaming pass."""
    cols = list(cols)
    if not cols:
        return {}
    partials = ds.select_columns(
        [c for c in cols]
    ).map_batches(
        _PartialStats(cols, set(want), max_exact_distinct, hist_bins),
        batch_format="pyarrow",
    )
    merged = {c: ColStats() for c in cols}
    # one tiny row per input block — safe to take_all
    for row in partials.take_all():
        payload = pickle.loads(row["partial"])
        for c, p in payload.items():
            _merge_partial(merged[c], p)
    return merged
