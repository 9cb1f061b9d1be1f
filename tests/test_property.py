"""Property-based tests (hypothesis): the distributed grouped kernels must
equal direct single-process pandas semantics on arbitrary small frames."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from recipys_ray import (
    Accumulator,
    Recipe,
    StepHistorical,
    StepImputeFill,
    StepLag,
    all_of,
)


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    n_groups = draw(st.integers(min_value=1, max_value=5))
    gids = draw(
        st.lists(
            st.integers(min_value=0, max_value=n_groups - 1),
            min_size=n, max_size=n,
        )
    )
    vals = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-1e6, max_value=1e6,
                    allow_nan=False, allow_infinity=False,
                ),
            ),
            min_size=n, max_size=n,
        )
    )
    pdf = pd.DataFrame(
        {
            "g": np.array(gids, dtype=np.int64),
            "x": pd.array(vals, dtype="float64"),
        }
    )
    # unique in-group order key
    pdf["t"] = pdf.groupby("g").cumcount()
    return pdf


def run_engine(pdf, steps):
    rec = Recipe(
        rd.from_pandas(pdf), predictors=["x"], groups=["g"],
        sequences=["t"], partitions=3,
    )
    for s in steps:
        rec.add_step(s)
    out = rec.prep().to_pandas()
    return out.sort_values(["g", "t"], kind="stable").reset_index(drop=True)


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(frames())
def test_grouped_kernels_match_pandas(pdf):
    ours = run_engine(
        pdf,
        [
            StepHistorical(sel=all_of(["x"]), fun=Accumulator.MAX),
            StepHistorical(sel=all_of(["x"]), fun=Accumulator.MEAN),
            StepHistorical(sel=all_of(["x"]), fun=Accumulator.VAR),
            StepHistorical(sel=all_of(["x"]), fun=Accumulator.COUNT),
            StepLag(sel=all_of(["x"]), shifts=[1]),
            StepImputeFill(sel=all_of(["x"]), strategy="forward"),
        ],
    )
    ref = pdf.sort_values(["g", "t"], kind="stable").reset_index(drop=True)
    g = ref.groupby("g")
    np.testing.assert_allclose(
        ours["x_max"], g["x"].cummax(), equal_nan=True)
    # atol is eps-scaled to the data magnitude: any summation order
    # (pandas' included) carries absolute error ~eps·max|x|, so a mean
    # whose true value is near zero from large-magnitude cancelling inputs
    # is only defined to that absolute precision — and for subnormal
    # inputs (~1e-309) relative error is meaningless entirely
    with np.errstate(all="ignore"):
        max_abs = np.nanmax(np.abs(np.r_[ref["x"].to_numpy(dtype=float), 0]))
    tol = max(1e-12, 1e-14 * float(max_abs))
    np.testing.assert_allclose(
        ours["x_mean"],
        g["x"].expanding().mean().reset_index(drop=True),
        equal_nan=True, atol=tol,
    )
    np.testing.assert_allclose(
        ours["x_var"],
        g["x"].expanding().var().reset_index(drop=True),
        equal_nan=True, atol=max(tol, 1e-14 * max_abs * max_abs),
    )
    np.testing.assert_allclose(
        ours["x_count"],
        g["x"].expanding().count().reset_index(drop=True),
    )
    np.testing.assert_allclose(
        ours["x_lag1"], g["x"].shift(1), equal_nan=True)
    np.testing.assert_allclose(
        ours["x"], g["x"].ffill(), equal_nan=True)
