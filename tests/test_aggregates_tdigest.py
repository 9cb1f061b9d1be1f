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


class TestExpandingMedianApprox:
    """aggregates.expanding_median_approx — the bounded t-digest carry that
    makes expanding MEDIAN chunk-mergeable (StepHistorical
    approx_median_chunked)."""

    def test_first_block_exact(self):
        """Within the first block (no digest yet) the result is the exact
        pandas expanding median to float rounding."""
        from recipys_ray.aggregates import expanding_median_approx

        rng = np.random.RandomState(7)
        v = rng.normal(size=1000)
        v[rng.rand(1000) < 0.15] = np.nan
        exact = pd.Series(v).expanding(min_periods=1).median().to_numpy()
        approx = expanding_median_approx(v, block=1024)
        np.testing.assert_allclose(
            approx, exact, rtol=0, atol=1e-12, equal_nan=True
        )

    def test_duplicates_exact_in_block(self):
        from recipys_ray.aggregates import expanding_median_approx

        rng = np.random.RandomState(3)
        v = rng.randint(0, 5, 800).astype(float)
        exact = pd.Series(v).expanding(min_periods=1).median().to_numpy()
        np.testing.assert_array_equal(
            expanding_median_approx(v, block=1024), exact
        )

    def test_nan_prefix_and_skip(self):
        from recipys_ray.aggregates import expanding_median_approx

        v = np.array([np.nan, np.nan, 3.0, np.nan, 1.0])
        got = expanding_median_approx(v)
        np.testing.assert_allclose(
            got, [np.nan, np.nan, 3.0, 3.0, 2.0], equal_nan=True
        )

    def test_rank_error_bound_across_blocks(self):
        """Across many blocks the digest compounds; per-row rank error of
        the reported median vs the true history stays < 2% at p99."""
        import bisect

        from recipys_ray.aggregates import expanding_median_approx

        rng = np.random.RandomState(11)
        v = rng.normal(size=30_000) * 3 + rng.rand(30_000)
        approx = expanding_median_approx(v, block=1024)
        running, errs = [], []
        for x, m in zip(v, approx):
            bisect.insort(running, x)
            if len(running) >= 100:
                r = bisect.bisect_left(running, m) / len(running)
                errs.append(abs(r - 0.5))
        assert np.quantile(errs, 0.99) < 0.02

    def test_seeded_continuation_consistent(self):
        """Chunk carry: seeding with digest_of(prefix) ≈ running the whole
        series through — the chunk boundary adds no systematic error."""
        from recipys_ray.aggregates import digest_of, expanding_median_approx

        rng = np.random.RandomState(5)
        v = rng.normal(size=8000)
        whole = expanding_median_approx(v)[4000:]
        cont = expanding_median_approx(v[4000:], seed=digest_of(v[:4000]))
        sd = np.std(v)
        assert np.max(np.abs(cont - whole)) < 0.05 * sd

    def test_empty_and_all_nan(self):
        from recipys_ray.aggregates import digest_of, expanding_median_approx

        assert digest_of(np.array([np.nan, np.nan])) is None
        out = expanding_median_approx(np.array([np.nan, np.nan]))
        assert np.isnan(out).all()
        assert len(expanding_median_approx(np.empty(0))) == 0
