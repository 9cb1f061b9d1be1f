"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (nor in recipys_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship feature-bake over sf0.001 events: ffill → historical
    min/max/mean/count → lag → sessionize → scale, one grouped shuffle +
    one fit pass. Returns a (lazy) ray.data.Dataset."""
    import ray.data as rd

    import recipys_ray as rr
    from recipys_ray.selector import all_of
    from recipys_ray.steps.historical import Accumulator

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
    rec = rr.Recipe(
        ds,
        predictors=["value"],
        groups=["user_id"],
        sequences=["ts", "event_id"],
    )
    rec.add_step(rr.StepImputeFill(sel=all_of(["value"]), strategy="forward"))
    rec.add_step(rr.StepHistorical(sel=all_of(["value"]), fun=Accumulator.MIN))
    rec.add_step(rr.StepHistorical(sel=all_of(["value"]), fun=Accumulator.MAX))
    rec.add_step(rr.StepHistorical(sel=all_of(["value"]), fun=Accumulator.MEAN))
    rec.add_step(rr.StepHistorical(sel=all_of(["value"]), fun=Accumulator.COUNT))
    rec.add_step(rr.StepLag(sel=all_of(["value"]), shifts=[1]))
    rec.add_step(rr.StepSessionize(gap="30m"))
    rec.add_step(rr.StepScale(sel=all_of(["value"])))
    return rec.prep()


def queries() -> dict[str, Callable[[str], Any]]:
    from recipys_ray.pipelines.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from recipys_ray.pipelines.driver_queries import ORACLES

    return dict(ORACLES)
