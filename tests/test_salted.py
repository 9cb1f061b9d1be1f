"""Property test: salted sub-partitioning ≡ unsalted results, including
per-turn text byte-equality for mega-conversations (SURVEY.md §4, north rule
boundary-carry guarantee)."""

import numpy as np
import pandas as pd
import ray.data as rd

from recipys_ray import (
    Accumulator,
    Recipe,
    StepHistorical,
    StepImputeFill,
    StepLag,
    StepLead,
    StepSessionize,
    all_of,
)
from recipys_ray.kernels.salted import SaltConfig, find_hot_groups
from recipys_ray.pipelines.transcripts import make_transcripts


def build_recipe(ds, salt=None):
    rec = Recipe(
        ds,
        predictors=["n_chars", "latency_s", "score"],
        groups=["conv_id"],
        sequences=["turn_idx", "ts"],
        partitions=4,
        salt=salt,
    )
    rec.add_step(StepImputeFill(sel=all_of(["latency_s"]), strategy="forward"))
    rec.add_step(StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MAX))
    rec.add_step(StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MEAN))
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.COUNT))
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.VAR))
    # MEDIAN is NOT chunk-mergeable — keeps this chain on the legacy
    # whole-group carry path so both salted paths stay covered
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.MEDIAN))
    rec.add_step(StepLag(sel=all_of(["n_chars"]), shifts=[1, 2]))
    rec.add_step(StepLead(sel=all_of(["n_chars"]), shifts=[1]))
    rec.add_step(StepSessionize(gap="30m"))
    return rec


def run(salt):
    tbl = make_transcripts(n_turns=3000, seed=13, mega_conv_turns=1200)
    out = build_recipe(rd.from_arrow(tbl), salt=salt).prep().to_pandas()
    return out.sort_values(
        ["conv_id", "turn_idx"], kind="stable"
    ).reset_index(drop=True)


def test_find_hot_groups():
    tbl = make_transcripts(n_turns=2000, seed=13, mega_conv_turns=1200)
    ds = rd.from_arrow(tbl)
    hot = find_hot_groups(ds, ["conv_id"], threshold=800)
    # the two forced mega-convs (1200 turns each) and nothing else
    assert len(hot) == 2
    assert all(v >= 1200 for v in hot.values())


def test_salted_equals_unsalted():
    unsalted = run(None)
    salted = run(SaltConfig(threshold=500, chunk_span=200))
    assert list(unsalted.columns) == list(salted.columns)
    salted = salted[unsalted.columns]
    for c in unsalted.columns:
        a, b = unsalted[c], salted[c]
        if pd.api.types.is_numeric_dtype(a) and not pd.api.types.is_bool_dtype(a):
            np.testing.assert_allclose(
                a.to_numpy(dtype=float),
                b.to_numpy(dtype=float),
                equal_nan=True,
                err_msg=f"column {c}",
            )
        else:
            # per-turn text equality under stable turn ordering
            assert a.astype(str).tolist() == b.astype(str).tolist(), c


def test_salt_noop_when_no_hot_groups():
    unsalted = run(None)
    salted_high = run(SaltConfig(threshold=10_000_000, chunk_span=200))
    pd.testing.assert_frame_equal(unsalted, salted_high)


def build_mergeable_recipe(ds, salt=None):
    """Chain where EVERY step supports the chunk-merge protocol — routes to
    kernels/chunked.py (no whole-group task anywhere)."""
    from recipys_ray import StepDiff

    rec = Recipe(
        ds,
        predictors=["n_chars", "latency_s", "score"],
        groups=["conv_id"],
        sequences=["turn_idx", "ts"],
        partitions=4,
        salt=salt,
    )
    rec.add_step(StepImputeFill(sel=all_of(["latency_s"]), strategy="forward"))
    rec.add_step(
        StepImputeFill(sel=all_of(["score"]), strategy="forward", limit=2)
    )
    rec.add_step(StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MAX))
    rec.add_step(StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MIN))
    rec.add_step(StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MEAN))
    rec.add_step(StepHistorical(sel=all_of(["latency_s"]), fun=Accumulator.VAR))
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.COUNT))
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.SUM))
    rec.add_step(StepLag(sel=all_of(["n_chars"]), shifts=[1, 3]))
    rec.add_step(StepLead(sel=all_of(["n_chars"]), shifts=[1, 2]))
    rec.add_step(StepDiff(sel=all_of(["score"]), shifts=[1]))
    rec.add_step(
        StepImputeFill(sel=all_of(["score"]), strategy="backward")
    )
    from recipys_ray import StepRolling

    rec.add_step(
        StepRolling(sel=all_of(["n_chars"]), window=7, fun=Accumulator.MEAN,
                    suffix="r7mean")
    )
    rec.add_step(
        StepRolling(sel=all_of(["n_chars"]), window=4, fun=Accumulator.MAX,
                    suffix="r4max")
    )
    rec.add_step(StepSessionize(gap="30m"))
    return rec


def run_mergeable(salt):
    tbl = make_transcripts(n_turns=3000, seed=13, mega_conv_turns=1200)
    out = build_mergeable_recipe(rd.from_arrow(tbl), salt=salt).prep().to_pandas()
    return out.sort_values(
        ["conv_id", "turn_idx"], kind="stable"
    ).reset_index(drop=True)


def test_chunked_path_is_selected(monkeypatch):
    """An all-mergeable chain must route to run_salted_chunked."""
    import recipys_ray.kernels.chunked as chunked
    import recipys_ray.kernels.salted as salted_mod

    calls = []
    orig = chunked.run_salted_chunked

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(chunked, "run_salted_chunked", spy)
    run_mergeable(SaltConfig(threshold=500, chunk_span=200))
    assert calls, "chunk-merge path was not taken"
    _ = salted_mod


def test_chunked_salted_equals_unsalted():
    """Salted ≡ unsalted through the chunk-local path: ffill, historical
    max/min/mean/var/count/sum, lag 1+3, diff, sessionize — with chunks
    far smaller than the mega-conversations (chunk_span=200 vs 1200 turns,
    so each mega-group spans ≥6 chunks)."""
    unsalted = run_mergeable(None)
    salted = run_mergeable(SaltConfig(threshold=500, chunk_span=200))
    assert list(unsalted.columns) == list(salted.columns)
    salted = salted[unsalted.columns]
    for c in unsalted.columns:
        a, b = unsalted[c], salted[c]
        if pd.api.types.is_numeric_dtype(a) and not pd.api.types.is_bool_dtype(a):
            np.testing.assert_allclose(
                a.to_numpy(dtype=float),
                b.to_numpy(dtype=float),
                equal_nan=True,
                err_msg=f"column {c}",
                atol=1e-10,
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), c


def test_chunked_tiny_chunks_many_boundaries():
    """Stress the fold with very small chunks (every chunk boundary hits
    the lag/ffill/sessionize carry logic)."""
    unsalted = run_mergeable(None)
    salted = run_mergeable(SaltConfig(threshold=300, chunk_span=37))
    salted = salted[unsalted.columns]
    for c in unsalted.columns:
        a, b = unsalted[c], salted[c]
        if pd.api.types.is_numeric_dtype(a) and not pd.api.types.is_bool_dtype(a):
            np.testing.assert_allclose(
                a.to_numpy(dtype=float), b.to_numpy(dtype=float),
                equal_nan=True, err_msg=f"column {c}", atol=1e-10,
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), c


def test_chunked_chunk_smaller_than_lag():
    """chunk_span=2 with lag shift 3: every carried value crosses MULTIPLE
    chunk boundaries — exercises the tail merge where a chunk has fewer
    rows than the max shift."""
    tbl = make_transcripts(n_turns=800, seed=5, mega_conv_turns=300)
    ds = rd.from_arrow(tbl)

    def mk(salt):
        rec = Recipe(
            ds, predictors=["n_chars", "score"], groups=["conv_id"],
            sequences=["turn_idx", "ts"], partitions=4, salt=salt,
        )
        rec.add_step(StepLag(sel=all_of(["n_chars"]), shifts=[3]))
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    b = mk(SaltConfig(threshold=100, chunk_span=2))[a.columns]
    np.testing.assert_allclose(
        a["n_chars_lag3"].to_numpy(dtype=float),
        b["n_chars_lag3"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_global_ungrouped_chain_parallel_equals_serial():
    """Ungrouped order-dependent chains now range-chunk on the sort column
    and run in parallel (run_global_chunked); results must equal the
    single-partition serial scan."""
    from recipys_ray import StepDiff

    tbl = make_transcripts(n_turns=4000, seed=9)
    import pyarrow as pa

    # drop conv grouping: one global ordered sequence by ts
    def mk(partitions):
        ds = rd.from_arrow(tbl)
        rec = Recipe(
            ds, predictors=["n_chars", "latency_s", "score"],
            sequences=["ts", "turn_idx"], partitions=partitions,
        )
        rec.add_step(
            StepImputeFill(sel=all_of(["latency_s"]), strategy="forward")
        )
        rec.add_step(
            StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MEAN)
        )
        rec.add_step(
            StepHistorical(sel=all_of(["score"]), fun=Accumulator.VAR)
        )
        rec.add_step(StepLag(sel=all_of(["n_chars"]), shifts=[2]))
        rec.add_step(StepDiff(sel=all_of(["score"]), shifts=[1]))
        rec.add_step(StepSessionize(gap="30m"))
        out = rec.prep().to_pandas()
        return out.sort_values(
            ["ts", "turn_idx", "conv_id"], kind="stable"
        ).reset_index(drop=True)

    serial = mk(1)
    parallel = mk(8)[serial.columns]
    assert len(parallel) == len(serial)
    for c in serial.columns:
        a, b = serial[c], parallel[c]
        if pd.api.types.is_numeric_dtype(a) and not pd.api.types.is_bool_dtype(a):
            np.testing.assert_allclose(
                a.to_numpy(dtype=float), b.to_numpy(dtype=float),
                equal_nan=True, err_msg=f"column {c}", atol=1e-10,
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), c


def test_chunked_limited_ffill_ages_across_chunks():
    """ffill(limit=3) with chunk_span=2: the carried value's AGE must
    accumulate across chunk boundaries so the distance cap holds exactly."""
    tbl = make_transcripts(n_turns=600, seed=21, mega_conv_turns=250)
    ds = rd.from_arrow(tbl)

    def mk(salt):
        rec = Recipe(
            ds, predictors=["score"], groups=["conv_id"],
            sequences=["turn_idx", "ts"], partitions=4, salt=salt,
        )
        rec.add_step(
            StepImputeFill(sel=all_of(["score"]), strategy="forward", limit=3)
        )
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    b = mk(SaltConfig(threshold=100, chunk_span=2))[a.columns]
    np.testing.assert_allclose(
        a["score"].to_numpy(dtype=float),
        b["score"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_chunked_group_mean_fill_defers_to_totals():
    """Per-group mean/min/max fills under salting: hot chunks must fill
    from the GROUP total (incl. future chunks), never from chunk stats."""
    tbl = make_transcripts(n_turns=1500, seed=8, mega_conv_turns=600)
    ds = rd.from_arrow(tbl)

    def mk(salt, strategy):
        rec = Recipe(
            ds, predictors=["score", "latency_s"], groups=["conv_id"],
            sequences=["turn_idx", "ts"], partitions=4, salt=salt,
        )
        rec.add_step(StepImputeFill(sel=all_of(["score"]), strategy=strategy))
        rec.add_step(
            StepHistorical(sel=all_of(["score"]), fun=Accumulator.MEAN)
        )
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    for strategy in ("mean", "min", "max"):
        a = mk(None, strategy)
        b = mk(SaltConfig(threshold=300, chunk_span=100), strategy)[a.columns]
        for c in ("score", "score_mean"):
            np.testing.assert_allclose(
                a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float),
                equal_nan=True, err_msg=f"{strategy}/{c}", atol=1e-10,
            )


def test_find_hot_groups_distributed_fallback():
    """Forcing driver_merge_cap=0 exercises the hash-partitioned
    distributed sum+filter path; results must equal the driver merge."""
    tbl = make_transcripts(n_turns=2000, seed=13, mega_conv_turns=1200)
    ds = rd.from_arrow(tbl)
    a = find_hot_groups(ds, ["conv_id"], threshold=800)
    b = find_hot_groups(ds, ["conv_id"], threshold=800, driver_merge_cap=0)
    assert a == b and len(a) == 2


def test_chunked_grid_resample_equals_unsalted():
    """Grid-mode resampling through the dedicated salted chunk path: slot
    ownership per chunk + ffill value carry (incl. text columns) must
    reproduce the whole-group kernel exactly."""
    from recipys_ray.steps.resample import StepResampling

    tbl = make_transcripts(n_turns=2500, seed=17, mega_conv_turns=1000)

    def mk(salt):
        rec = Recipe(
            rd.from_arrow(tbl),
            predictors=["n_chars", "latency_s", "score"],
            groups=["conv_id"],
            sequences=["ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(StepResampling("5min"))
        out = rec.prep().to_pandas()
        return out.sort_values(
            ["conv_id", "ts"], kind="stable"
        ).reset_index(drop=True)

    a = mk(None)
    b = mk(SaltConfig(threshold=400, chunk_span=20 * 60 * 1_000_000))
    assert list(a.columns) == sorted(b.columns, key=list(a.columns).index)
    b = b[a.columns]
    assert len(a) == len(b), (len(a), len(b))
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_numeric_dtype(x) and not pd.api.types.is_bool_dtype(x):
            np.testing.assert_allclose(
                x.to_numpy(dtype=float), y.to_numpy(dtype=float),
                equal_nan=True, err_msg=f"column {c}",
            )
        else:
            assert x.astype(str).tolist() == y.astype(str).tolist(), c


def test_chunked_grid_resample_tiny_chunks_and_postfill():
    """Small chunk spans (many boundaries + event-less gap windows) with a
    MEAN-mapped column (global post-fill node) and LAST text carry."""
    from recipys_ray.steps.historical import Accumulator
    from recipys_ray.steps.resample import StepResampling

    tbl = make_transcripts(n_turns=1200, seed=23, mega_conv_turns=500)

    def mk(salt):
        rec = Recipe(
            rd.from_arrow(tbl),
            predictors=["n_chars", "latency_s", "score"],
            groups=["conv_id"],
            sequences=["ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(
            StepResampling(
                "3min",
                accumulator_dict={
                    all_of(["score"]): Accumulator.MEAN,
                    all_of(["n_chars"]): Accumulator.MAX,
                },
            )
        )
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "ts"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    b = mk(SaltConfig(threshold=300, chunk_span=7 * 60 * 1_000_000))[a.columns]
    assert len(a) == len(b)
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_numeric_dtype(x) and not pd.api.types.is_bool_dtype(x):
            np.testing.assert_allclose(
                x.to_numpy(dtype=float), y.to_numpy(dtype=float),
                equal_nan=True, err_msg=f"column {c}",
            )
        else:
            assert x.astype(str).tolist() == y.astype(str).tolist(), c


def test_chunked_time_rolling_equals_unsalted():
    """Time-windowed rolling under salting: the carried window-span rows
    (variable-width state) must reproduce the whole-group kernel, with
    chunk spans smaller than the rolling window so carries span multiple
    boundaries."""
    from recipys_ray import StepRolling

    tbl = make_transcripts(n_turns=1500, seed=31, mega_conv_turns=600)

    def mk(salt):
        rec = Recipe(
            rd.from_arrow(tbl),
            predictors=["n_chars", "score"],
            groups=["conv_id"],
            sequences=["ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(
            StepRolling(sel=all_of(["n_chars"]), window="10min",
                        fun=Accumulator.MEAN, suffix="t10mean")
        )
        rec.add_step(
            StepRolling(sel=all_of(["score"]), window="10min",
                        fun=Accumulator.MAX, suffix="t10max")
        )
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    # chunk span 4 min < window 10 min → every carry crosses >1 boundary
    b = mk(SaltConfig(threshold=400, chunk_span=4 * 60 * 1_000_000))[a.columns]
    for c in ("n_chars_t10mean", "score_t10max"):
        np.testing.assert_allclose(
            a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float),
            equal_nan=True, err_msg=c, atol=1e-10,
        )


def test_salted_minmax_all_nan_chunk():
    """ADVICE r2 regression: a hot group with an ALL-NaN chunk must carry
    the running max/min ACROSS the NaN hole (the grouped cummax/cummin fold
    leaves NaN at that chunk's state row; without the in-group ffill the
    next chunk computed from local values only)."""
    rng = np.random.default_rng(5)
    n_hot, n_cold = 600, 80
    rows = []
    val_hot = rng.normal(10.0, 4.0, n_hot)
    val_hot[100:200] = np.nan          # chunk 1 (span=100) entirely NaN
    val_hot[rng.random(n_hot) < 0.1] = np.nan
    val_hot[0] = 99.5                  # early extreme that must survive
    val_hot[5] = -99.5
    rows.append(pd.DataFrame({
        "conv_id": "mega", "turn_idx": np.arange(n_hot), "val": val_hot}))
    for c in range(3):
        rows.append(pd.DataFrame({
            "conv_id": f"c{c}", "turn_idx": np.arange(n_cold),
            "val": rng.normal(0, 1, n_cold)}))
    pdf = pd.concat(rows, ignore_index=True)

    def run_minmax(salt):
        rec = Recipe(
            rd.from_pandas(pdf), predictors=["val"], groups=["conv_id"],
            sequences=["turn_idx"], partitions=4, salt=salt,
        )
        rec.add_step(StepHistorical(sel=all_of(["val"]), fun=Accumulator.MAX))
        rec.add_step(StepHistorical(sel=all_of(["val"]), fun=Accumulator.MIN))
        out = rec.prep().to_pandas()
        return out.sort_values(
            ["conv_id", "turn_idx"], kind="stable"
        ).reset_index(drop=True)

    unsalted = run_minmax(None)
    salted = run_minmax(SaltConfig(threshold=300, chunk_span=100))
    for c in ("val_max", "val_min"):
        np.testing.assert_allclose(
            unsalted[c].to_numpy(dtype=float),
            salted[c].to_numpy(dtype=float),
            rtol=0, atol=0, equal_nan=True, err_msg=c,
        )


def test_median_mega_group_carry_cap():
    """A non-chunk-mergeable chain (expanding MEDIAN) over a hot group
    larger than SaltConfig.max_carry_rows must error CLEANLY at planning
    time — never an unbounded single task."""
    import pytest

    tbl = make_transcripts(n_turns=3000, seed=13, mega_conv_turns=1200)

    def run(cap):
        rec = Recipe(
            rd.from_arrow(tbl), predictors=["score"], groups=["conv_id"],
            sequences=["turn_idx", "ts"], partitions=4,
            salt=SaltConfig(threshold=500, chunk_span=200,
                            max_carry_rows=cap),
        )
        rec.add_step(
            StepHistorical(sel=all_of(["score"]), fun=Accumulator.MEDIAN)
        )
        return rec.prep().to_pandas()

    with pytest.raises(ValueError, match="max_carry_rows"):
        run(cap=1000)
    out = run(cap=10_000)  # big enough: legacy carry path runs exactly
    assert "score_median" in out.columns and len(out) == len(tbl)


def test_salted_resample_then_historical_chain():
    """ROUND2 gap #2 / r2-VERDICT #8: a fused resample_grid → historical →
    lag chain under FORCED salting must equal the unsalted run. The planner
    splits at the row-count-changing head: salted grid resample (bounded
    slot-ownership chunks), then the salted chunk-local chain re-salted
    over the RESAMPLED rows."""
    from recipys_ray.steps.resample import StepResampling

    tbl = make_transcripts(n_turns=2000, seed=31, mega_conv_turns=900)

    def mk(salt):
        rec = Recipe(
            rd.from_arrow(tbl),
            predictors=["n_chars", "latency_s", "score"],
            groups=["conv_id"],
            sequences=["ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(StepResampling("5min"))
        rec.add_step(
            StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MAX)
        )
        rec.add_step(
            StepHistorical(sel=all_of(["score"]), fun=Accumulator.MEAN)
        )
        rec.add_step(StepLag(sel=all_of(["n_chars"]), shifts=[1]))
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "ts"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    b = mk(SaltConfig(threshold=300, chunk_span=20 * 60 * 1_000_000))
    assert len(a) == len(b)
    b = b[a.columns]
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_numeric_dtype(x) and not pd.api.types.is_bool_dtype(x):
            np.testing.assert_allclose(
                x.to_numpy(dtype=float), y.to_numpy(dtype=float),
                equal_nan=True, err_msg=f"column {c}",
            )
        else:
            assert x.astype(str).tolist() == y.astype(str).tolist(), c


def test_approx_median_chunked_close_to_exact(ray_session, monkeypatch):
    """StepHistorical(MEDIAN, approx_median_chunked=True) routes a hot
    group through the bounded chunk-local path (t-digest carry) and stays
    within the documented rank-error band of the exact expanding median;
    cold groups remain bit-exact (defer mode runs the ordinary transform
    for them)."""
    import recipys_ray.kernels.chunked as chunked

    calls = []
    orig = chunked.run_salted_chunked

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(chunked, "run_salted_chunked", spy)

    tbl = make_transcripts(n_turns=4000, seed=21, mega_conv_turns=2500)

    def mk(salt, approx):
        rec = Recipe(
            rd.from_arrow(tbl),
            predictors=["score"],
            groups=["conv_id"],
            sequences=["turn_idx", "ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(StepHistorical(
            sel=all_of(["score"]), fun=Accumulator.MEDIAN,
            approx_median_chunked=approx,
        ))
        return rec.prep().to_pandas().sort_values(
            ["conv_id", "turn_idx"], kind="stable"
        ).reset_index(drop=True)

    exact = mk(None, False)
    salted = mk(SaltConfig(threshold=500, chunk_span=300), True)
    assert calls, "approx MEDIAN did not take the chunk-merge path"

    hot = find_hot_groups(
        rd.from_arrow(tbl), ["conv_id"], threshold=500
    )
    assert hot, "fixture must contain a mega-group"
    hot_ids = set(hot)
    is_hot = exact["conv_id"].isin(hot_ids).to_numpy()

    e = exact["score_median"].to_numpy()
    a = salted["score_median"].to_numpy()
    # cold groups: fully local, bit-exact
    np.testing.assert_array_equal(a[~is_hot], e[~is_hot])
    # hot group: approximate — assert RANK closeness per row (the t-digest
    # guarantee), measured against the row's own expanding history
    sub = exact.loc[is_hot]
    for conv in sorted(hot_ids):
        g = sub[sub["conv_id"] == conv]
        vals = g["score"].to_numpy(dtype=float)
        approx_m = salted.loc[g.index, "score_median"].to_numpy()
        hist = np.sort(vals[~np.isnan(vals)])
        # per-row: rank of the approx median within the full history prefix
        import bisect
        running = []
        errs = []
        for v, m in zip(vals, approx_m):
            if not np.isnan(v):
                bisect.insort(running, v)
            if len(running) >= 50 and not np.isnan(m):
                r = bisect.bisect_left(running, m) / len(running)
                errs.append(abs(r - 0.5))
        _ = hist
        assert errs and np.quantile(errs, 0.99) < 0.02, (
            f"conv {conv}: p99 rank error {np.quantile(errs, 0.99):.4f}"
        )
    # values must also be finite wherever the exact path is finite
    np.testing.assert_array_equal(np.isnan(a), np.isnan(e))


def test_median_without_approx_still_errors_over_cap(ray_session):
    """The hard max_carry_rows cap still guards the legacy whole-group
    carry when approximation is NOT opted into."""
    import pytest

    tbl = make_transcripts(n_turns=3000, seed=13, mega_conv_turns=1200)
    rec = Recipe(
        rd.from_arrow(tbl),
        predictors=["score"],
        groups=["conv_id"],
        sequences=["turn_idx", "ts"],
        partitions=4,
        salt=SaltConfig(threshold=500, chunk_span=200, max_carry_rows=1000),
    )
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.MEDIAN))
    with pytest.raises(ValueError, match="approx_median_chunked"):
        rec.prep().to_pandas()


def test_fused_resample_chain_single_payload_shuffle(monkeypatch):
    """The resample→mergeable-tail chain must take the FUSED path (one
    payload shuffle, resampled-row state passes) — not the two-shuffle
    split — and still equal the unsalted run on a torture input: several
    hot groups, nulls in carried columns, an impute + historical VAR +
    lag tail, and chunk spans small enough that every boundary carries."""
    import recipys_ray.kernels.chunked as chunked
    from recipys_ray.steps.resample import StepResampling

    fused, split = [], []
    orig_chain = chunked.run_salted_resample_chain
    orig_grid = chunked.run_salted_resample_grid
    monkeypatch.setattr(
        chunked, "run_salted_resample_chain",
        lambda *a, **k: (fused.append(1), orig_chain(*a, **k))[1],
    )
    monkeypatch.setattr(
        chunked, "run_salted_resample_grid",
        lambda *a, **k: (split.append(1), orig_grid(*a, **k))[1],
    )
    import recipys_ray.kernels.salted as salted_mod

    monkeypatch.setattr(
        salted_mod, "run_salted_chain", salted_mod.run_salted_chain
    )

    rng = np.random.default_rng(7)
    rows = []
    for conv, n in [("megaA", 700), ("megaB", 500), ("c0", 60), ("c1", 40)]:
        ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
            np.cumsum(rng.integers(30, 200, n)), unit="s"
        )
        score = rng.normal(0, 3, n)
        score[rng.random(n) < 0.2] = np.nan
        lat = rng.exponential(2.0, n)
        lat[rng.random(n) < 0.15] = np.nan
        rows.append(pd.DataFrame({
            "conv_id": conv, "ts": ts, "turn_idx": np.arange(n),
            "n_chars": rng.integers(1, 500, n).astype(np.int64),
            "latency_s": lat, "score": score,
        }))
    pdf = pd.concat(rows, ignore_index=True)

    def mk(salt):
        rec = Recipe(
            rd.from_pandas(pdf),
            predictors=["n_chars", "latency_s", "score"],
            groups=["conv_id"],
            sequences=["ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(StepResampling("2min"))
        rec.add_step(
            StepImputeFill(sel=all_of(["score"]), strategy="forward")
        )
        rec.add_step(
            StepHistorical(sel=all_of(["score"]), fun=Accumulator.VAR)
        )
        rec.add_step(
            StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MAX)
        )
        rec.add_step(StepLag(sel=all_of(["latency_s"]), shifts=[1, 3]))
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "ts"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    # 5-minute chunk span at 2-min resolution → 2-3 slots per chunk: every
    # chunk boundary exercises the carry, lag-3 spans multiple chunks
    b = mk(SaltConfig(threshold=300, chunk_span=5 * 60 * 1_000_000))
    assert fused, "fused resample chain path was not taken"
    assert not split, "two-shuffle split ran despite a mergeable tail"
    assert len(a) == len(b)
    b = b[a.columns]
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_numeric_dtype(x) and not pd.api.types.is_bool_dtype(x):
            np.testing.assert_allclose(
                x.to_numpy(dtype=float), y.to_numpy(dtype=float),
                equal_nan=True, err_msg=f"column {c}", atol=1e-10,
            )
        else:
            assert x.astype(str).tolist() == y.astype(str).tolist(), c


def test_fused_resample_chain_explain_single_shuffle():
    """explain() must model the fused grid-head chain as ONE shuffle."""
    from recipys_ray.steps.resample import StepResampling

    pdf = pd.DataFrame({
        "conv_id": np.repeat([1, 2], 30),
        "turn_idx": np.tile(np.arange(30), 2),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(np.tile(np.arange(30), 2), unit="min"),
        "score": np.arange(60.0),
    })
    rec = Recipe(
        rd.from_pandas(pdf), predictors=["score"], groups=["conv_id"],
        sequences=["ts"], partitions=2,
        salt=SaltConfig(threshold=10, chunk_span=600_000_000),
    )
    rec.add_step(StepResampling("1min"))
    rec.add_step(StepHistorical(sel=all_of(["score"]), fun=Accumulator.MEAN))
    plan = rec.explain()
    assert "grid head + resampled-row chunk states" in plan
    assert "total grouped shuffles: 1" in plan


def test_resample_then_median_tail_splits(monkeypatch):
    """A NON-chunk-mergeable tail (expanding MEDIAN) behind a grid resample
    must route through the split (grid resample, then legacy re-salted
    tail) and still equal the unsalted run."""
    import recipys_ray.kernels.chunked as chunked
    from recipys_ray.steps.resample import StepResampling

    fused, grid = [], []
    orig_chain = chunked.run_salted_resample_chain
    orig_grid = chunked.run_salted_resample_grid
    monkeypatch.setattr(
        chunked, "run_salted_resample_chain",
        lambda *a, **k: (fused.append(1), orig_chain(*a, **k))[1],
    )
    monkeypatch.setattr(
        chunked, "run_salted_resample_grid",
        lambda *a, **k: (grid.append(1), orig_grid(*a, **k))[1],
    )

    tbl = make_transcripts(n_turns=1500, seed=41, mega_conv_turns=600)

    def mk(salt):
        rec = Recipe(
            rd.from_arrow(tbl),
            predictors=["n_chars", "latency_s", "score"],
            groups=["conv_id"],
            sequences=["ts"],
            partitions=4,
            salt=salt,
        )
        rec.add_step(StepResampling("5min"))
        rec.add_step(
            StepHistorical(sel=all_of(["n_chars"]), fun=Accumulator.MEDIAN)
        )
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "ts"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None)
    b = mk(SaltConfig(threshold=300, chunk_span=20 * 60 * 1_000_000))
    assert grid and not fused, "MEDIAN tail must take the split path"
    b = b[a.columns]
    np.testing.assert_allclose(
        a["n_chars_median"].to_numpy(dtype=float),
        b["n_chars_median"].to_numpy(dtype=float),
        equal_nan=True,
    )


def test_user_function_with_declared_chunk_protocol():
    """ROUND3 gap #2: an arbitrary whole-frame StepFunction cannot salt,
    but a user-DECLARED chunk protocol (state/fold/apply hooks + column
    footprint) rides the bounded chunk-local path. Expanding per-group sum
    as the user function; salted ≡ unsalted must hold bit-exactly here
    (integer sums)."""
    from recipys_ray import ChunkProtocol, StepFunction

    def fn(pdf, group_cols):
        pdf["x_cum"] = pdf.groupby("__gid__", sort=False)["n_chars"].cumsum()
        return pdf

    proto = ChunkProtocol(
        state=lambda pdf, gid:
            pdf.groupby(gid, sort=False)["n_chars"].sum().to_frame("s"),
        fold=lambda states: states["s"].cumsum().shift(1).fillna(0.0)
            .to_frame("s"),
        apply=lambda pdf, gid, pref: pdf.assign(
            x_cum=pdf["x_cum"] + gid.map(pref["s"]).fillna(0.0)
        ),
    )

    tbl = make_transcripts(n_turns=2000, seed=47, mega_conv_turns=900)

    def mk(salt, with_proto):
        rec = Recipe(
            rd.from_arrow(tbl), predictors=["n_chars"], groups=["conv_id"],
            sequences=["turn_idx", "ts"], partitions=4, salt=salt,
        )
        kwargs = dict(
            function=fn, grouped=True,
        )
        if with_proto:
            kwargs.update(
                inputs=["n_chars"], outputs=["x_cum"], chunk_protocol=proto
            )
        rec.add_step(StepFunction(**kwargs))
        return (
            rec.prep().to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )

    a = mk(None, with_proto=False)  # unsalted whole-frame path
    b = mk(SaltConfig(threshold=300, chunk_span=150), with_proto=True)
    np.testing.assert_array_equal(
        a["x_cum"].to_numpy(dtype=float), b["x_cum"].to_numpy(dtype=float)
    )

    # and verify the salted path was genuinely CHUNKED (several chunks of
    # the mega conversation, not one whole-group task): chunk states exist
    from recipys_ray.kernels.salted import find_hot_groups

    hot = find_hot_groups(rd.from_arrow(tbl), ["conv_id"], 300)
    assert hot, "fixture must have a hot group"
