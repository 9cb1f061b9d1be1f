"""Fine-grained reference-parity details: fill limits, StepSklearn naming
rules, ungrouped resampling, refit semantics, reprs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from recipys_ray import (
    Accumulator,
    Recipe,
    StepHistorical,
    StepImputeFill,
    StepResampling,
    StepScale,
    StepSklearn,
    all_numeric_predictors,
    all_of,
)
from recipys_ray.transformers import MinMaxScaler, OneHotEncoder

from .conftest import f1_datetime, f1_pandas, make_recipe, sorted_pdf


def test_ffill_limit():
    pdf = pd.DataFrame(
        {
            "id": [1] * 5,
            "t": pd.to_datetime(range(5), unit="h"),
            "x": [1.0, np.nan, np.nan, np.nan, 5.0],
        }
    )
    rec = Recipe(rd.from_pandas(pdf), predictors=["x"], groups=["id"],
                 sequences=["t"], partitions=2)
    rec.add_step(StepImputeFill(strategy="forward", limit=1))
    out = sorted_pdf(rec.prep(), by=("id", "t"))
    np.testing.assert_allclose(
        out["x"], [1, 1, np.nan, np.nan, 5], equal_nan=True
    )


def test_bfill_limit():
    pdf = pd.DataFrame(
        {
            "id": [1] * 5,
            "t": pd.to_datetime(range(5), unit="h"),
            "x": [1.0, np.nan, np.nan, np.nan, 5.0],
        }
    )
    rec = Recipe(rd.from_pandas(pdf), predictors=["x"], groups=["id"],
                 sequences=["t"], partitions=2)
    rec.add_step(StepImputeFill(strategy="backward", limit=2))
    out = sorted_pdf(rec.prep(), by=("id", "t"))
    np.testing.assert_allclose(
        out["x"], [1, np.nan, 5, 5, 5], equal_nan=True
    )


def test_sklearn_columnwise_new_column_naming():
    """Reference naming: columnwise + in_place=False → <Cls>_<col>_<i+1>
    (step.py:430-434)."""
    rec = make_recipe(f1_pandas())
    rec.add_step(
        StepSklearn(MinMaxScaler(), sel=all_of(["x1", "x2"]),
                    columnwise=True, in_place=False)
    )
    out = sorted_pdf(rec.prep())
    assert "MinMaxScaler_x1_1" in out.columns
    assert "MinMaxScaler_x2_1" in out.columns
    # originals untouched
    assert out["x1"].equals(f1_pandas().sort_values(["id", "time"])["x1"]
                            .reset_index(drop=True))


def test_sklearn_table_new_column_naming_same_width():
    """Table mode + in_place=False, output width == input width →
    <Cls>_<col> (step.py:453-461)."""
    rec = make_recipe(f1_pandas())
    rec.add_step(
        StepSklearn(MinMaxScaler(), sel=all_of(["x1", "x2"]), in_place=False)
    )
    out = sorted_pdf(rec.prep())
    assert "MinMaxScaler_x1" in out.columns and "MinMaxScaler_x2" in out.columns


def test_new_columns_receive_role():
    rec = make_recipe(f1_pandas())
    step = StepSklearn(
        OneHotEncoder(), sel=all_of(["x3"]), in_place=False, role="onehot"
    )
    rec.add_step(step)
    rec.prep()
    roles = rec._last_ingredients.roles
    assert roles["OneHotEncoder_1"] == ["onehot"]


def test_resample_ungrouped():
    """Reference test_step_ungrouped (test_steps.py:102-124): no group role,
    dedup'd time column, halves the rows."""
    pdf = f1_datetime().drop(columns=["id"])
    pdf = pdf.drop_duplicates(subset="time", keep="first")
    rec = Recipe(rd.from_pandas(pdf), outcomes=["y"], predictors=["x1", "x2"])
    rec.update_roles("time", "sequence")
    rec.add_step(
        StepResampling(
            "2h", accumulator_dict={all_numeric_predictors(): Accumulator.MEAN}
        )
    )
    out = rec.prep().to_pandas()
    assert len(out) == len(pdf) / 2


def test_prep_refit_recomputes():
    rec = make_recipe(f1_pandas())
    rec.add_step(StepScale(sel=all_of(["x1"])))
    rec.prep()
    mean1 = rec.steps[0].transformer.mean_[0]
    shifted = f1_pandas()
    shifted["x1"] += 50
    rec.prep(rd.from_pandas(shifted), refit=True)
    mean2 = rec.steps[0].transformer.mean_[0]
    assert abs(mean2 - mean1 - 50) < 1e-9


def test_reprs():
    rec = make_recipe(f1_pandas())
    step = StepHistorical(sel=all_of(["x1"]), fun=Accumulator.MAX)
    rec.add_step(step)
    assert "Create historical" in repr(step)
    assert "Operations" in repr(rec)
    rec.prep()
    assert "[trained]" in repr(step)


def test_historical_rejects_non_accumulator():
    with pytest.raises(TypeError, match="Accumulator"):
        StepHistorical(fun="max")


class _ScoreActor:
    """Test actor: 'loads' state once in __init__, scores per batch."""

    init_count = 0

    def __init__(self, factor: float):
        self.factor = factor

    def __call__(self, tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        scored = pc.multiply(tbl.column("x1").cast("double"), self.factor)
        return tbl.append_column("x1_scored", scored)


def test_actor_pool_step():
    from recipys_ray import StepActorPool
    import pyarrow as pa

    rec = make_recipe(f1_pandas())
    rec.add_step(
        StepActorPool(
            _ScoreActor,
            fn_constructor_kwargs={"factor": 2.0},
            concurrency=2,
            new_columns={"x1_scored": pa.float64()},
        )
    )
    rec.add_step(StepHistorical(sel=all_of(["x1_scored"]), fun=Accumulator.MAX))
    out = sorted_pdf(rec.prep())
    np.testing.assert_allclose(out["x1_scored"], out["x1"] * 2.0)
    assert "x1_scored_max" in out.columns  # new column got predictor role


def test_flagship_plan_has_single_shuffle():
    """Fusion evidence: the whole order-dependent chain (ffill + 4×historical
    + lag + sessionize) must cost exactly ONE all-to-all exchange."""
    import ray.data as rd

    from recipys_ray.pipelines.transcripts import flagship_recipe, make_transcripts

    tbl = make_transcripts(n_turns=1500, seed=5)
    rec = flagship_recipe(rd.from_arrow(tbl), partitions=2)
    out = rec.prep()
    out.to_pandas()
    stats = out.stats()
    # Ray renders each all-to-all exchange as a "Sort" operator; the 7
    # order-dependent steps must have fused into exactly ONE
    n_shuffles = sum(
        1 for line in stats.splitlines()
        if line.strip().startswith("Operator") and "Sort" in line
    )
    assert n_shuffles == 1, stats
    grouped = [s for s in rec.steps if s.kind == "grouped"]
    assert len(grouped) == 7


def test_step_function_formats():
    from recipys_ray import StepFunction
    import pyarrow as pa

    pdf = f1_pandas()

    def add_one_pd(df):
        df = df.copy()
        df["x1"] = df["x1"] + 1
        return df

    rec = make_recipe(pdf)
    rec.add_step(StepFunction(all_of(["x1"]), add_one_pd, batch_format="pandas"))
    out = sorted_pdf(rec.prep())
    np.testing.assert_allclose(
        out["x1"],
        f1_pandas().sort_values(["id", "time"])["x1"].to_numpy() + 1,
    )

    def add_col_arrow(tbl):
        return tbl.append_column(
            "flag", pa.array(np.ones(len(tbl), dtype=np.int64))
        )

    rec = make_recipe(pdf)
    rec.add_step(StepFunction(all_of(["x1"]), add_col_arrow,
                              batch_format="pyarrow"))
    out = sorted_pdf(rec.prep())
    assert (out["flag"] == 1).all()

    def group_mean_col(frame, group_cols):
        frame["x1_gmean"] = frame.groupby("__gid__")["x1"].transform("mean")
        return frame

    rec = make_recipe(pdf)
    rec.add_step(StepFunction(all_of(["x1"]), group_mean_col, grouped=True))
    out = sorted_pdf(rec.prep())
    exp = f1_pandas().groupby("id")["x1"].transform("mean")
    np.testing.assert_allclose(out["x1_gmean"], exp.to_numpy())


def test_resample_on_timedelta_sequence():
    """F1's native sequence is a timedelta (duration) column; the grid
    kernel must handle it like polars upsample does temporal types."""
    rec = make_recipe(f1_pandas())  # time is timedelta64
    rec.add_step(StepResampling("2h"))
    out = rec.prep().to_pandas()
    assert len(out) == 5


class TestGroupedAggParity:
    """duckdb grouped/global aggregate parity primitives: plain sequential
    scan-order sums (avg) and one-pass Welford (var_pop/stddev_pop), as
    verified bit-exact vs DuckDB 1.0 on all 1500 sf0.1 user groups."""

    def test_seq_sum_and_var_match_duckdb(self):
        import duckdb

        from recipys_ray.kernels.duckdb_parity import seq_sum, seq_var_pop

        rng = np.random.default_rng(2)
        x = rng.lognormal(2, 1.5, 20_000)
        x[rng.random(20_000) < 0.1] = np.nan
        ref = duckdb.execute(
            "SELECT sum(v), avg(v), var_pop(v), stddev_pop(v) "
            "FROM (SELECT unnest(?) v)", [
                [None if np.isnan(t) else t for t in x.tolist()]
            ],
        ).fetchone()
        n = int(np.sum(~np.isnan(x)))
        assert seq_sum(x) == ref[0]
        assert seq_sum(x) / n == ref[1]
        assert seq_var_pop(x) == ref[2]
        assert float(np.sqrt(seq_var_pop(x))) == ref[3]

    def test_seq_group_sums_match_duckdb(self):
        import duckdb

        from recipys_ray.kernels.duckdb_parity import seq_group_sums

        rng = np.random.default_rng(9)
        n = 30_000
        g = np.sort(rng.integers(0, 300, n))
        v = rng.normal(0, 1e3, n)
        v[rng.random(n) < 0.15] = np.nan
        ref = duckdb.execute(
            "SELECT g, sum(v) s, avg(v) a FROM (SELECT unnest(?) g, "
            "unnest(?) v) GROUP BY g ORDER BY g",
            [g.tolist(),
             [None if np.isnan(t) else t for t in v.tolist()]],
        ).df()
        starts, s, cnt = seq_group_sums(v, g)
        keys = g[starts]
        ref = ref.set_index("g")
        for k, sv, c in zip(keys, s, cnt):
            rs = ref.loc[k, "s"]
            if c == 0:
                assert rs is None or np.isnan(rs)
            else:
                assert sv == rs and sv / c == ref.loc[k, "a"], k
