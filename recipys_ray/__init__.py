"""recipys_ray — a Ray-Data-native recipe (declarative preprocessing) engine.

A from-scratch re-expression of the capabilities of rvandewater/ReciPys
(reference at /root/reference, cited per-module as file:line) on top of
``ray.data.Dataset``: steps are planned into fused zero-copy Arrow
``map_batches`` stages and a shared hash-partition + sorted-scan shuffle for
order-dependent kernels; fitted state is computed with streaming partial
aggregates and broadcast.
"""

from recipys_ray.ingredients import Ingredients
from recipys_ray.recipe import Recipe
from recipys_ray.selector import (
    Selector,
    all_groups,
    all_numeric_predictors,
    all_of,
    all_outcomes,
    all_predictors,
    all_sequences,
    contains,
    ends_with,
    has_role,
    has_type,
    regex_names,
    select_groups,
    select_sequence,
    starts_with,
)
from recipys_ray.steps import (
    Accumulator,
    Step,
    StepActorPool,
    StepDiff,
    ChunkProtocol,
    StepFunction,
    StepHistorical,
    StepImputeFastForwardFill,
    StepImputeFastZeroFill,
    StepImputeFill,
    StepImputeModel,
    StepLag,
    StepLead,
    StepResampling,
    StepRolling,
    StepScale,
    StepSessionize,
    StepSklearn,
)

__all__ = [
    "Ingredients",
    "Recipe",
    "Selector",
    "Accumulator",
    "Step",
    "StepActorPool",
    "StepDiff",
    "ChunkProtocol",
    "StepFunction",
    "StepHistorical",
    "StepImputeFastForwardFill",
    "StepImputeFastZeroFill",
    "StepImputeFill",
    "StepImputeModel",
    "StepLag",
    "StepLead",
    "StepResampling",
    "StepRolling",
    "StepScale",
    "StepSessionize",
    "StepSklearn",
    "all_groups",
    "all_numeric_predictors",
    "all_of",
    "all_outcomes",
    "all_predictors",
    "all_sequences",
    "contains",
    "ends_with",
    "has_role",
    "has_type",
    "regex_names",
    "select_groups",
    "select_sequence",
    "starts_with",
]
