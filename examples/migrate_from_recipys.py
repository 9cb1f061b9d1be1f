"""Migration guide: a ReciPys (polars/pandas) pipeline, 1:1 on recipys_ray.

Every construct from the reference tutorial maps directly — same Recipe /
roles / steps / selector names, same semantics — with the execution swapped
for Ray Data streaming (the input may be a pandas/polars frame, an Arrow
table, a ray.data.Dataset, or a parquet path at any scale).

reference (ReciPys)                      | recipys_ray
-----------------------------------------+------------------------------------
from recipys.recipe import Recipe        | import recipys_ray as rr
Recipe(Ingredients(df), outcomes=[...],  | rr.Recipe(df, outcomes=[...],
  predictors=[...], groups=[...],        |   predictors=[...], groups=[...],
  sequences=[...])                       |   sequences=[...])
rec.add_step(StepSklearn(SimpleImputer())| rec.add_step(rr.StepSklearn(
  , sel=all_numeric_predictors())        |   rr_transformers.SimpleImputer(),
                                         |   sel=rr.all_numeric_predictors())
rec.add_step(StepHistorical(fun=         | rec.add_step(rr.StepHistorical(
  Accumulator.MIN))                      |   fun=rr.Accumulator.MIN))
rec.add_step(StepResampling("2h"))       | rec.add_step(rr.StepResampling("2h"))
rec.add_step(StepImputeFill(strategy=    | rec.add_step(rr.StepImputeFill(
  "forward"))                            |   strategy="forward"))
rec.prep() -> polars frame               | rec.prep() -> ray.data.Dataset
                                         |   (.to_pandas() for a frame)
rec.bake(new_df)                         | rec.bake(new_df)   (same contract)
rec.cache()                              | rec.cache()        (same contract)

sklearn transformers: recipys_ray ships native, distributed-fit
implementations of the whole family the reference exercises (scalers,
imputers incl. KNN/Iterative, encoders, discretizers, Quantile/Power/Spline)
— no sklearn dependency; real sklearn objects still work via the
driver-side escape hatch for anything exotic.
"""

import numpy as np
import pandas as pd


def build_frame() -> pd.DataFrame:
    """The reference tutorial's dataset (two stays, hourly vitals, NaNs)."""
    rng = np.random.RandomState(42)
    ts = list(pd.date_range("2000-01-01 00:00", periods=6, freq="h")) + list(
        pd.date_range("2000-01-01 00:00", periods=4, freq="h")
    )
    df = pd.DataFrame({
        "id": [1] * 6 + [2] * 4,
        "time": ts,
        "y": rng.rand(10),
        "x1": rng.normal(size=(10,)),
        "x2": rng.binomial(1, 0.5, size=(10,)).astype(float),
    })
    df.loc[[2, 4, 6], "x2"] = np.nan
    return df


def main():
    import recipys_ray as rr
    from recipys_ray.selector import all_numeric_predictors, all_of
    from recipys_ray.transformers import SimpleImputer

    df = build_frame()
    rec = rr.Recipe(
        df,
        outcomes=["y"],
        predictors=["x1", "x2"],
        groups=["id"],
        sequences=["time"],
    )
    rec.add_step(rr.StepSklearn(SimpleImputer(strategy="mean"),
                                sel=all_of(["x2"])))
    rec.add_step(rr.StepHistorical(sel=all_numeric_predictors(),
                                   fun=rr.Accumulator.MIN))
    rec.add_step(rr.StepScale(sel=all_of(["x1"])))
    print(rec.explain())
    out = rec.prep().to_pandas()
    print(out.head(10).to_string())
    assert not out["x2"].isna().any()
    assert {"x1_min", "x2_min"} <= set(out.columns)
    return out


if __name__ == "__main__":
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
    main()
    ray.shutdown()
