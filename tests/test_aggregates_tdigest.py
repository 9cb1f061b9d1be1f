"""T-digest quantile sketch: documented rank-error bound and integration
with the streaming column_stats pass."""

import numpy as np
import pandas as pd
import ray.data as rd

from recipys_ray.aggregates import QUANTILES, TDigest, column_stats


def rank_of(sorted_vals: np.ndarray, x: float) -> float:
    return np.searchsorted(sorted_vals, x) / len(sorted_vals)


QS = [0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


class TestTDigest:
    def test_rank_error_bound_lognormal(self):
        """Documented bound: rank error ≤ max(0.005, 6·q(1−q)/δ) at δ=256 —
        in particular ≤ 0.6% at the median and far tighter in the tails."""
        rng = np.random.RandomState(0)
        x = rng.lognormal(mean=0, sigma=2, size=500_000)
        td = TDigest.from_weighted(x, np.ones_like(x))
        xs = np.sort(x)
        for q in QS:
            est = float(td.quantile(q)[0])
            err = abs(rank_of(xs, est) - q)
            bound = max(0.005, 6 * q * (1 - q) / td.delta)
            assert err <= bound, (q, err, bound)

    def test_merge_preserves_accuracy(self):
        """A digest merged from 64 block digests stays within 2× the
        single-shot bound (merging loses at most a constant factor)."""
        rng = np.random.RandomState(1)
        x = rng.standard_cauchy(size=200_000)  # heavy tails
        parts = np.array_split(x, 64)
        digest = None
        for p in parts:
            d = TDigest.from_weighted(p, np.ones_like(p))
            digest = d if digest is None else digest.merged_with(d)
        xs = np.sort(x)
        for q in QS:
            est = float(digest.quantile(q)[0])
            err = abs(rank_of(xs, est) - q)
            assert err <= 2 * max(0.005, 6 * q * (1 - q) / digest.delta), (
                q, err,
            )

    def test_column_stats_uses_digest_above_threshold(self):
        rng = np.random.RandomState(2)
        x = rng.normal(size=50_000)
        ds = rd.from_pandas(pd.DataFrame({"x": x})).repartition(8)
        stats = column_stats(ds, ["x"], {QUANTILES}, max_exact_distinct=100)
        st = stats["x"]
        assert not st.exact and st.tdigest is not None
        xs = np.sort(x)
        for q in (0.1, 0.5, 0.9):
            est = float(st.quantile(q)[0])
            assert abs(rank_of(xs, est) - q) < 0.01

    def test_exact_path_unchanged_below_threshold(self):
        """Low-cardinality columns keep the EXACT weighted-percentile path
        (bit-identical to np.percentile on the expanded multiset)."""
        vals = np.repeat(np.arange(10, dtype=np.float64), 100)
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(4)
        st = column_stats(ds, ["x"], {QUANTILES})["x"]
        assert st.exact
        for q in (0.0, 0.25, 0.5, 0.77, 1.0):
            assert float(st.quantile(q)[0]) == np.percentile(vals, q * 100)
