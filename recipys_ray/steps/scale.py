"""StepScale — standard scaling (reference: recipys/step.py:581-605).

Fit = one distributed null-skipping mean/std aggregate (ddof=0, matching
sklearn's StandardScaler); transform = stateless vectorized map, nulls
preserved (the reference reverts sklearn's NaN back to null, step.py:601-602
— this engine emits nulls directly).
"""

from __future__ import annotations

from recipys_ray.selector import Selector, all_numeric_predictors
from recipys_ray.steps.sklearn_step import StepSklearn
from recipys_ray.transformers import StandardScaler


class StepScale(StepSklearn):
    def __init__(
        self,
        sel: Selector = None,
        with_mean: bool = True,
        with_std: bool = True,
        duckdb_parity_stats: bool = False,
        *args,
        **kwargs,
    ):
        super().__init__(
            sklearn_transformer=StandardScaler(
                with_mean=with_mean, with_std=with_std,
                duckdb_parity_stats=duckdb_parity_stats,
            ),
            sel=sel if sel is not None else all_numeric_predictors(),
            in_place=True,
            *args,
            **kwargs,
        )
        self.desc = "Scale with StandardScaler"
