"""ops/rangejoin.py — interval join + windowed aggregate vs brute force."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import recipys_ray.ops.rangejoin as rj
from recipys_ray.ops.rangejoin import _window_bounds, range_agg, range_join

LO, HI = "-100s", "50s"
LO_TD, HI_TD = pd.Timedelta("-100s"), pd.Timedelta("50s")


def _frames(seed, nl=300, nr=500, n_keys=12, null_keys=True):
    rs = np.random.RandomState(seed)
    lf = pd.DataFrame({
        "g": rs.randint(0, n_keys, nl).astype(float),
        "t": pd.to_datetime(rs.randint(0, 5000, nl), unit="s"),
        "lv": rs.normal(size=nl),
    })
    rf = pd.DataFrame({
        "g": rs.randint(0, n_keys, nr).astype(float),
        "t": pd.to_datetime(rs.randint(0, 5000, nr), unit="s"),
        "rv": rs.normal(size=nr),
        "rid": np.arange(nr, dtype=np.int64),
    })
    if null_keys:
        lf.loc[lf.sample(frac=0.1, random_state=seed).index, "g"] = np.nan
        rf.loc[rf.sample(frac=0.1, random_state=seed).index, "g"] = np.nan
    return lf, rf


def _brute_pairs(lf, rf):
    rows = []
    for i, (g, t) in enumerate(zip(lf.g, lf.t)):
        if pd.isna(g):
            continue
        m = (rf.g == g) & (rf.t >= t + LO_TD) & (rf.t <= t + HI_TD)
        for j in np.flatnonzero(m.to_numpy()):
            rows.append((i, j))
    return rows


def _norm(df):
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


class TestWindowBounds:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_brute_force(self, seed):
        lf, rf = _frames(seed, nl=60, nr=90, n_keys=5)
        start, end, order = _window_bounds(lf, rf, ["g"], "t", LO, HI)
        exp = _brute_pairs(lf, rf)
        got = [
            (i, j)
            for i in range(len(lf))
            for j in order[start[i]:end[i]]
        ]
        assert sorted(got) == sorted(exp)

    def test_chunked_composite_path_identical(self, monkeypatch):
        lf, rf = _frames(3, nl=400, nr=800, n_keys=9, null_keys=False)
        s1, e1, o1 = _window_bounds(lf, rf, ["g"], "t", LO, HI)
        # force ~2 groups per composite chunk — must be bit-identical
        span = int(
            rf.t.values.view("i8").max() - rf.t.values.view("i8").min()
        ) + 1
        monkeypatch.setattr(rj, "_I64_MAX", span * 2 * 2)
        s2, e2, o2 = _window_bounds(lf, rf, ["g"], "t", LO, HI)
        assert (s1 == s2).all() and (e1 == e2).all() and (o1 == o2).all()

    def test_numeric_axis_and_empty_sides(self):
        lf = pd.DataFrame({"g": [1, 2], "t": [10, 20], "lv": [0.0, 1.0]})
        rf = pd.DataFrame({"g": [1, 1, 3], "t": [8, 16, 10],
                           "rv": [1.0, 2.0, 3.0]})
        start, end, order = _window_bounds(lf, rf, ["g"], "t", -3, 0)
        assert list(order[start[0]:end[0]]) == [0]   # t=8 in [7,10] g=1
        assert list(order[start[1]:end[1]]) == []    # g=2 absent
        s, e, o = _window_bounds(lf.iloc[:0], rf, ["g"], "t", -3, 0)
        assert len(s) == 0
        s, e, o = _window_bounds(lf, rf.iloc[:0], ["g"], "t", -3, 0)
        assert (s == e).all()

    def test_lower_above_upper_raises(self):
        lf, rf = _frames(0, nl=5, nr=5)
        with pytest.raises(ValueError):
            _window_bounds(lf, rf, ["g"], "t", "50s", "-100s")


class TestRangeJoin:
    def test_matches_brute_force_and_partition_invariance(self):
        lf, rf = _frames(7)
        left = rd.from_pandas(lf).repartition(5)
        right = rd.from_pandas(rf).repartition(3)
        pairs = _brute_pairs(lf, rf)
        exp = pd.DataFrame({
            "g": lf.g.values[[i for i, _ in pairs]],
            "t": lf.t.values[[i for i, _ in pairs]],
            "lv": lf.lv.values[[i for i, _ in pairs]],
            "rv": rf.rv.values[[j for _, j in pairs]],
            "rid": rf.rid.values[[j for _, j in pairs]],
        })
        outs = []
        for p in (3, 13):
            out = range_join(
                left, right, on="t", by="g", lower=LO, upper=HI,
                num_partitions=p,
            ).to_pandas()
            assert list(out.columns) == ["g", "t", "lv", "rv", "rid"]
            assert out.rid.dtype == np.int64  # no float64 null-padding leak
            outs.append(_norm(out))
        pd.testing.assert_frame_equal(outs[0], outs[1])
        pd.testing.assert_frame_equal(outs[0], _norm(exp))

    def test_collision_suffix_and_right_on(self):
        lf = pd.DataFrame({"g": [1], "t": [100], "lv": [1.0]})
        rf = pd.DataFrame({"g": [1, 1], "rt": [99, 50],
                           "lv": [5.0, 6.0]})
        out = range_join(
            rd.from_pandas(lf), rd.from_pandas(rf), on="t", by="g",
            right_on="rt", lower=-5, upper=0, num_partitions=2,
        ).to_pandas()
        assert list(out.columns) == ["g", "t", "lv", "lv_r"]
        assert out.lv_r.tolist() == [5.0]


class TestRangeAgg:
    def test_matches_pandas_windows(self):
        lf, rf = _frames(11)
        # right-side value nulls: count/sum must skip them (SQL COUNT/SUM)
        rf.loc[rf.sample(frac=0.15, random_state=1).index, "rv"] = np.nan
        left = rd.from_pandas(lf).repartition(4)
        right = rd.from_pandas(rf).repartition(2)
        out = range_agg(
            left, right, on="t", by="g", lower=LO, upper=HI,
            aggs={
                "n_hits": (None, "count"),
                "n_rv": ("rv", "count"),
                "rv_sum": ("rv", "sum"),
                "rv_mean": ("rv", "mean"),
                "rid_sum": ("rid", "sum"),
            },
        ).to_pandas()
        assert len(out) == len(lf)  # left-join semantics: every left row
        assert out.n_hits.dtype == np.int64
        assert out.n_rv.dtype == np.int64
        got = _norm(out)

        rows = []
        for g, t, lv in zip(lf.g, lf.t, lf.lv):
            if pd.isna(g):
                w = rf.iloc[:0]
            else:
                w = rf[(rf.g == g) & (rf.t >= t + LO_TD) & (rf.t <= t + HI_TD)]
            nrv = int(w.rv.notna().sum())
            rows.append({
                "g": g, "t": t, "lv": lv,
                "n_hits": len(w),
                "n_rv": nrv,
                "rv_sum": w.rv.sum() if nrv else np.nan,
                "rv_mean": w.rv.mean() if nrv else np.nan,
                "rid_sum": float(w.rid.sum()) if len(w) else np.nan,
            })
        exp = _norm(pd.DataFrame(rows))
        pd.testing.assert_frame_equal(
            got.astype({"rid_sum": float}), exp, check_dtype=False,
            atol=1e-9, rtol=1e-9,
        )

    def test_agg_on_key_column_rejected(self):
        lf, rf = _frames(0, nl=5, nr=5)
        with pytest.raises(KeyError):
            range_agg(
                rd.from_pandas(lf), rd.from_pandas(rf), on="t", by="g",
                lower=LO, upper=HI, aggs={"bad": ("t", "sum")},
            )
