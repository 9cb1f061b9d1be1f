"""Per-step semantic tests, ported from the reference suite
(reference: tests/test_steps.py) plus the null-semantics edge fixture
(FIXTURES.md) and the engine's temporal extensions."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recipys_ray import (
    Accumulator,
    Recipe,
    StepDiff,
    StepHistorical,
    StepImputeFastForwardFill,
    StepImputeFastZeroFill,
    StepImputeFill,
    StepImputeModel,
    StepLag,
    StepLead,
    StepResampling,
    StepScale,
    StepSessionize,
    all_numeric_predictors,
    all_of,
)

from .conftest import f1_datetime, f1_pandas, make_recipe, sorted_pdf


def null_fixture():
    pdf = pd.DataFrame(
        {
            "id": [1, 1, 1, 1, 2, 2, 2],
            "t": pd.to_datetime([0, 1, 2, 3, 0, 1, 2], unit="h"),
            "x": [np.nan, 1.0, np.nan, 4.0, np.nan, 2.0, np.nan],
        }
    )
    return Recipe(
        rd.from_pandas(pdf),
        predictors=["x"],
        groups=["id"],
        sequences=["t"],
        partitions=2,
    )


class TestNullSemantics:
    """FIXTURES.md edge fixture — exact expected outputs."""

    def test_ffill(self):
        rec = null_fixture().add_step(StepImputeFill(strategy="forward"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(
            out["x"], [np.nan, 1, 1, 4, np.nan, 2, 2], equal_nan=True
        )

    def test_bfill(self):
        rec = null_fixture().add_step(StepImputeFill(strategy="backward"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(
            out["x"], [1, 1, 4, 4, 2, 2, np.nan], equal_nan=True
        )

    def test_linear(self):
        # id1 x=[NaN,1,NaN,4] at t=0..3h → interior null = 1+(4-1)·(1/2);
        # leading null stays; id2 x=[NaN,2,NaN] → both edges stay null
        rec = null_fixture().add_step(StepImputeFill(strategy="linear"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(
            out["x"], [np.nan, 1, 2.5, 4, np.nan, 2, np.nan], equal_nan=True
        )

    def test_linear_is_time_weighted(self):
        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1],
                "t": pd.to_datetime([0, 1, 10], unit="h"),
                "x": [0.0, np.nan, 10.0],
            }
        )
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["x"], groups=["id"],
            sequences=["t"],
        ).add_step(StepImputeFill(strategy="linear"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        # Δt weighting: 0 + 10·(1/10) = 1.0, NOT the positional midpoint 5
        np.testing.assert_allclose(out["x"], [0.0, 1.0, 10.0])

    def test_linear_zero_span_is_null(self):
        # duplicate timestamps around the gap → span 0 → SQL x/0.0 = NULL
        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1],
                "t": pd.to_datetime([5, 5, 5], unit="h"),
                "e": [1, 2, 3],
                "x": [1.0, np.nan, 3.0],
            }
        )
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["x"], groups=["id"],
            sequences=["t", "e"],
        ).add_step(StepImputeFill(strategy="linear"))
        out = sorted_pdf(rec.prep(), by=("id", "e"))
        np.testing.assert_allclose(
            out["x"], [1.0, np.nan, 3.0], equal_nan=True
        )

    def test_linear_rejects_limit(self):
        import pytest

        with pytest.raises(ValueError, match="limit"):
            StepImputeFill(strategy="linear", limit=2)

    def test_group_mean_fill(self):
        rec = null_fixture().add_step(StepImputeFill(strategy="mean"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(out["x"], [2.5, 1, 2.5, 4, 2, 2, 2])

    def test_historical_all(self):
        rec = null_fixture()
        for fun in (
            Accumulator.MAX,
            Accumulator.MIN,
            Accumulator.COUNT,
            Accumulator.MEAN,
            Accumulator.VAR,
            Accumulator.MEDIAN,
        ):
            rec.add_step(StepHistorical(sel=all_of(["x"]), fun=fun))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(
            out["x_max"], [np.nan, 1, np.nan, 4, np.nan, 2, np.nan], equal_nan=True
        )
        np.testing.assert_allclose(
            out["x_min"], [np.nan, 1, np.nan, 1, np.nan, 2, np.nan], equal_nan=True
        )
        np.testing.assert_allclose(out["x_count"], [0, 1, 1, 2, 0, 1, 1])
        np.testing.assert_allclose(
            out["x_mean"], [np.nan, 1, 1, 2.5, np.nan, 2, 2], equal_nan=True
        )
        np.testing.assert_allclose(
            out["x_var"],
            [np.nan, np.nan, np.nan, 4.5, np.nan, np.nan, np.nan],
            equal_nan=True,
        )
        np.testing.assert_allclose(
            out["x_median"], [np.nan, 1, 1, 2.5, np.nan, 2, 2], equal_nan=True
        )

    def test_global_mean_fill_without_groups(self):
        pdf = pd.DataFrame(
            {"t": pd.to_datetime(range(7), unit="h"),
             "x": [np.nan, 1.0, np.nan, 4.0, np.nan, 2.0, np.nan]}
        )
        rec = Recipe(rd.from_pandas(pdf), predictors=["x"], sequences=["t"])
        rec.add_step(StepImputeFill(strategy="mean"))
        out = sorted_pdf(rec.prep(), by=("t",))
        m = np.nanmean([1, 4, 2])
        np.testing.assert_allclose(out["x"], [m, 1, m, 4, m, 2, m])


class TestImputeSteps:
    """Port of reference TestImputeSteps (test_steps.py:157-203)."""

    def test_impute_fill(self):
        rec = make_recipe(f1_pandas(nan_x2=True))
        rec.add_step(StepImputeFill(strategy="forward"))
        out = sorted_pdf(rec.prep())
        np.testing.assert_allclose(
            out["x2"], [0, 1, 1, 0, 0, 0, np.nan, 0, 0, 1], equal_nan=True
        )
        rec.add_step(StepImputeFill(sel=all_numeric_predictors(), value=0))
        out = sorted_pdf(rec.prep())
        np.testing.assert_allclose(out["x2"], [0, 1, 1, 0, 0, 0, 0, 0, 0, 1])

    def test_fast_zero_fill(self):
        rec = make_recipe(f1_pandas(nan_x2=True))
        rec.add_step(StepImputeFastZeroFill(sel=all_numeric_predictors()))
        out = sorted_pdf(rec.prep())
        np.testing.assert_allclose(out["x2"], [0, 1, 0, 0, 0, 0, 0, 0, 0, 1])

    def test_fast_forward_fill(self):
        rec = make_recipe(f1_pandas(nan_x2=True))
        rec.add_step(StepImputeFastForwardFill(sel=all_numeric_predictors()))
        out = sorted_pdf(rec.prep())
        np.testing.assert_allclose(
            out["x2"], [0, 1, 1, 0, 0, 0, np.nan, 0, 0, 1], equal_nan=True
        )

    def test_impute_model(self):
        def model(frame, groups):
            # a "model" that fills with a constant 9
            return frame.drop(columns=groups).fillna(9.0)

        rec = make_recipe(f1_pandas(nan_x2=True))
        rec.add_step(StepImputeModel(sel=all_of(["x2"]), model=model))
        out = sorted_pdf(rec.prep())
        np.testing.assert_allclose(out["x2"], [0, 1, 9, 0, 9, 0, 9, 0, 0, 1])


class TestStepHistorical:
    def test_last_row_equals_group_aggregate(self):
        """Reference test_steps.py:128-154."""
        rec = make_recipe(f1_pandas())
        for fun, sfx in [
            (Accumulator.MIN, "min"),
            (Accumulator.MAX, "max"),
            (Accumulator.MEAN, "mean"),
            (Accumulator.MEDIAN, "median"),
            (Accumulator.COUNT, "count"),
            (Accumulator.VAR, "var"),
        ]:
            rec.add_step(
                StepHistorical(sel=all_of(["x1", "x2"]), fun=fun, suffix=sfx)
            )
        out = sorted_pdf(rec.prep())
        g2 = out[out["id"] == 2]
        assert out["x1_min"].iloc[-1] == g2["x1"].min()
        assert out["x1_max"].iloc[-1] == g2["x1"].max()
        np.testing.assert_allclose(out["x1_mean"].iloc[-1], g2["x1"].mean())
        np.testing.assert_allclose(out["x1_median"].iloc[-1], g2["x1"].median())
        assert out["x1_count"].iloc[-1] == g2["x1"].count()
        np.testing.assert_allclose(out["x1_var"].iloc[-1], g2["x1"].var())

    def test_rejects_first_last(self):
        rec = null_fixture().add_step(
            StepHistorical(sel=all_of(["x"]), fun=Accumulator.LAST)
        )
        with pytest.raises(Exception):
            rec.prep().to_pandas()


class TestTemporalSteps:
    def test_lag_lead_diff(self):
        rec = null_fixture()
        rec.add_step(StepLag(sel=all_of(["x"]), shifts=[1, 2]))
        rec.add_step(StepLead(sel=all_of(["x"]), shifts=[1]))
        rec.add_step(StepDiff(sel=all_of(["x"]), shifts=[1]))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(
            out["x_lag1"],
            [np.nan, np.nan, 1, np.nan, np.nan, np.nan, 2],
            equal_nan=True,
        )
        np.testing.assert_allclose(
            out["x_lag2"],
            [np.nan, np.nan, np.nan, 1, np.nan, np.nan, np.nan],
            equal_nan=True,
        )
        np.testing.assert_allclose(
            out["x_lead1"],
            [1, np.nan, 4, np.nan, 2, np.nan, np.nan],
            equal_nan=True,
        )
        # x - lag1(x) over [nan,1,nan,4] is null everywhere (nan operands)
        assert out["x_diff1"].isna().all()

    def test_diff_dense(self):
        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1, 2, 2],
                "t": pd.to_datetime([0, 1, 2, 0, 1], unit="h"),
                "x": [1.0, 3.0, 6.0, 10.0, 14.0],
            }
        )
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["x"], groups=["id"],
            sequences=["t"], partitions=2,
        )
        rec.add_step(StepDiff(sel=all_of(["x"]), shifts=[1]))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(
            out["x_diff1"], [np.nan, 2, 3, np.nan, 4], equal_nan=True
        )

    def test_sessionize(self):
        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1, 1, 2, 2],
                "ts": pd.to_datetime(
                    ["2020-01-01 00:00", "2020-01-01 00:10",
                     "2020-01-01 01:00", "2020-01-01 01:05",
                     "2020-01-01 00:00", "2020-01-01 09:00"]
                ),
                "x": [1.0, 2, 3, 4, 5, 6],
            }
        )
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["x"], groups=["id"],
            sequences=["ts"], partitions=2,
        )
        rec.add_step(StepSessionize(gap="30m"))
        out = sorted_pdf(rec.prep(), by=("id", "ts"))
        assert out["session_id"].tolist() == [0, 0, 1, 1, 0, 1]


class TestStepResampling:
    def test_grid_halves_rows(self):
        """Reference test_steps.py:61-124 — '2h' on hourly data halves rows."""
        rec = make_recipe(f1_datetime())
        rec.add_step(
            StepResampling(
                "2h", accumulator_dict={all_numeric_predictors(): Accumulator.MEAN}
            )
        )
        out = rec.prep().to_pandas()
        assert len(out) == 5

    def test_grid_without_selectors(self):
        rec = make_recipe(f1_datetime())
        rec.add_step(StepResampling("2h"))
        out = rec.prep().to_pandas()
        assert len(out) == 5

    def test_grid_inserts_and_fills(self):
        # group 1 with a hole at 2h: grid must insert it; LAST → ffill
        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1],
                "time": pd.to_datetime(["2020-01-01 00:00",
                                        "2020-01-01 01:00",
                                        "2020-01-01 04:00"]),
                "x1": [1.0, 2.0, 5.0],
            }
        )
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["x1"], groups=["id"],
            sequences=["time"], partitions=2,
        )
        rec.add_step(StepResampling("1h"))  # default LAST
        out = sorted_pdf(rec.prep(), by=("id", "time"))
        assert len(out) == 5
        np.testing.assert_allclose(out["x1"], [1, 2, 2, 2, 5])

    def test_agg_mode(self):
        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1, 1],
                "time": pd.to_datetime(["2020-01-01 00:00", "2020-01-01 00:30",
                                        "2020-01-01 01:00", "2020-01-01 01:30"]),
                "x1": [1.0, 3.0, 5.0, 7.0],
            }
        )
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["x1"], groups=["id"],
            sequences=["time"], partitions=2,
        )
        rec.add_step(
            StepResampling(
                "1h",
                accumulator_dict={all_of(["x1"]): Accumulator.MEAN},
                mode="agg",
            )
        )
        out = sorted_pdf(rec.prep(), by=("id", "time"))
        np.testing.assert_allclose(out["x1"], [2.0, 6.0])

    def test_requires_sequence(self):
        pdf = f1_pandas().drop(columns=["time"])
        rec = Recipe(rd.from_pandas(pdf), predictors=["x1"], groups=["id"])
        rec.add_step(StepResampling("2h"))
        with pytest.raises(AssertionError):
            rec.prep()


class TestScaleStep:
    def test_scale_default(self):
        rec = make_recipe(f1_pandas(nan_x1=True, nan_x2=True))
        rec.add_step(StepScale(all_numeric_predictors()))
        out = sorted_pdf(rec.prep())
        assert abs(np.nanmean(out["x1"])) < 1e-5
        assert abs(np.nanmean(out["x2"])) < 1e-5

    def test_scale_w_args(self):
        rec = make_recipe(f1_pandas())
        rec.add_step(
            StepScale(all_numeric_predictors(), with_mean=False, with_std=False)
        )
        out = sorted_pdf(rec.prep())
        assert abs(out["x1"].mean()) > 1
        assert abs(out["x1"].var()) > 1.5

    def test_scale_w_sel(self):
        rec = make_recipe(f1_pandas())
        rec.add_step(StepScale(sel=all_of(["x2"])))
        out = sorted_pdf(rec.prep())
        assert abs(out["x2"].mean()) < 1e-5
        assert abs(out["x1"].mean()) > 1


class TestStepRolling:
    def test_row_window(self):
        from recipys_ray import StepRolling

        pdf = pd.DataFrame(
            {
                "id": [1, 1, 1, 1, 2, 2],
                "t": pd.to_datetime([0, 1, 2, 3, 0, 1], unit="h"),
                "x": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0],
            }
        )
        rec = Recipe(rd.from_pandas(pdf), predictors=["x"], groups=["id"],
                     sequences=["t"], partitions=2)
        rec.add_step(StepRolling(sel=all_of(["x"]), window=2,
                                 fun=Accumulator.MEAN, suffix="r2mean"))
        rec.add_step(StepRolling(sel=all_of(["x"]), window=3,
                                 fun=Accumulator.MAX, suffix="r3max"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(out["x_r2mean"], [1, 1.5, 2.5, 3.5, 10, 15])
        np.testing.assert_allclose(out["x_r3max"], [1, 2, 3, 4, 10, 20])

    def test_time_window(self):
        from recipys_ray import StepRolling

        pdf = pd.DataFrame(
            {
                "id": [1] * 4,
                "t": pd.to_datetime(["2020-01-01 00:00", "2020-01-01 00:10",
                                     "2020-01-01 00:50", "2020-01-01 02:00"]),
                "x": [1.0, 2.0, 3.0, 4.0],
            }
        )
        rec = Recipe(rd.from_pandas(pdf), predictors=["x"], groups=["id"],
                     sequences=["t"], partitions=2)
        rec.add_step(StepRolling(sel=all_of(["x"]), window="1h",
                                 fun=Accumulator.MEAN, suffix="tw"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        # windows: [1], [1,2], [2,3] (00:50-1h < 00:00 excl? (t-1h, t] → 1,2,3? t=00:50 window (23:50..00:50] includes all 3), [4]
        np.testing.assert_allclose(out["x_tw"], [1, 1.5, 2, 4])

    def test_leakage_free(self):
        """row t must not see rows > t."""
        from recipys_ray import StepRolling

        pdf = pd.DataFrame(
            {"id": [1, 1], "t": pd.to_datetime([0, 1], unit="h"),
             "x": [1.0, 100.0]}
        )
        rec = Recipe(rd.from_pandas(pdf), predictors=["x"], groups=["id"],
                     sequences=["t"], partitions=2)
        rec.add_step(StepRolling(sel=all_of(["x"]), window=5,
                                 fun=Accumulator.MAX, suffix="m"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        assert out["x_m"].tolist() == [1.0, 100.0]


class TestAccumulatorSum:
    def test_historical_sum(self):
        rec = null_fixture().add_step(
            StepHistorical(sel=all_of(["x"]), fun=Accumulator.SUM)
        )
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        # null until first non-null, then running sum (SQL semantics)
        np.testing.assert_allclose(
            out["x_sum"], [np.nan, 1, 1, 5, np.nan, 2, 2], equal_nan=True
        )

    def test_rolling_sum(self):
        from recipys_ray import StepRolling

        pdf = pd.DataFrame(
            {"id": [1] * 4, "t": pd.to_datetime(range(4), unit="h"),
             "x": [1.0, 2.0, np.nan, 4.0]}
        )
        rec = Recipe(rd.from_pandas(pdf), predictors=["x"], groups=["id"],
                     sequences=["t"], partitions=2)
        rec.add_step(StepRolling(sel=all_of(["x"]), window=2,
                                 fun=Accumulator.SUM, suffix="r2sum"))
        out = sorted_pdf(rec.prep(), by=("id", "t"))
        np.testing.assert_allclose(out["x_r2sum"], [1, 3, 2, 4])


def test_resample_agg_combiner_engages_and_matches():
    """agg-mode resampling pre-aggregates per (group, bucket) inside each
    block (shuffle combiner); results must equal the uncombined kernel."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    import recipys_ray as rr
    from recipys_ray.selector import all_of
    from recipys_ray.steps.historical import Accumulator
    from recipys_ray.steps.resample import StepResampling

    rng = np.random.RandomState(0)
    n = 4000
    pdf = pd.DataFrame(
        {
            "g": rng.randint(0, 20, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 3 * 86400, n), unit="s"),
            "v_mean": rng.normal(size=n),
            "v_max": rng.normal(size=n),
            "v_cnt": np.where(rng.rand(n) < 0.1, np.nan, rng.normal(size=n)),
            "v_var": rng.normal(size=n),
        }
    )

    def run(force_uncombined):
        step = StepResampling(
            "1h",
            accumulator_dict={
                all_of(["v_mean"]): Accumulator.MEAN,
                all_of(["v_max"]): Accumulator.MAX,
                all_of(["v_cnt"]): Accumulator.COUNT,
                all_of(["v_var"]): Accumulator.VAR,
            },
            mode="agg",
        )
        if force_uncombined:
            type(step).combinable.fget  # noqa: B018 — sanity the prop exists
            step.__class__ = type(
                "Uncombined", (StepResampling,), {"combinable": False}
            )
        rec = rr.Recipe(
            rd.from_pandas(pdf).repartition(8),
            predictors=["v_mean", "v_max", "v_cnt", "v_var"],
            groups=["g"],
            sequences=["ts"],
        )
        rec.add_step(step)
        return (
            rec.prep().to_pandas()
            .sort_values(["g", "ts"], kind="stable")
            .reset_index(drop=True)
        )

    a = run(False)
    b = run(True)[["g", "ts", "v_mean", "v_max", "v_cnt", "v_var"]]
    a = a[b.columns]
    assert len(a) == len(b)
    for c in ("v_mean", "v_max", "v_cnt", "v_var"):
        np.testing.assert_allclose(
            a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float),
            equal_nan=True, err_msg=c, rtol=1e-9, atol=1e-12,
        )


def test_historical_production_longdouble_close_to_oracle(ray_session):
    """Guard for the PRODUCTION (non-parity) MEAN/VAR/SUM path: longdouble
    segmented cumsums must stay within 1e-11 of DuckDB's expanding
    aggregates (the parity mode is bit-exact; this pins the default)."""
    import duckdb
    import ray.data as rd

    import recipys_ray as rr
    from recipys_ray.selector import all_of
    from recipys_ray.steps.historical import Accumulator

    rng = np.random.default_rng(17)
    n = 4000
    pdf = pd.DataFrame({
        "g": np.sort(rng.integers(0, 40, n)),
        "t": np.arange(n, dtype=np.int64),
        "v": rng.standard_normal(n) * (10.0 ** rng.integers(-3, 4, n)),
    })
    pdf.loc[rng.random(n) < 0.15, "v"] = np.nan
    rec = rr.Recipe(rd.from_pandas(pdf), predictors=["v"], groups=["g"],
                    sequences=["t"])
    for fun in (Accumulator.MEAN, Accumulator.VAR, Accumulator.SUM):
        rec.add_step(rr.StepHistorical(sel=all_of(["v"]), fun=fun))
    out = rec.prep().to_pandas().sort_values(["g", "t"], ignore_index=True)
    con = duckdb.connect()
    con.register("t_in", pdf)
    ref = con.execute("""
        SELECT g, t, avg(v) OVER w AS v_mean, var_samp(v) OVER w AS v_var,
               sum(v) OVER w AS v_sum
        FROM t_in WINDOW w AS (PARTITION BY g ORDER BY t
                               ROWS UNBOUNDED PRECEDING)
        ORDER BY g, t""").df()
    for c in ("v_mean", "v_var", "v_sum"):
        np.testing.assert_allclose(
            out[c].to_numpy(), ref[c].to_numpy(),
            rtol=1e-11, atol=1e-11, equal_nan=True, err_msg=c,
        )
