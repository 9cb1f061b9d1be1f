from recipys_ray.steps.actor import StepActorPool
from recipys_ray.steps.base import Step
from recipys_ray.steps.function import ChunkProtocol, StepFunction
from recipys_ray.steps.historical import Accumulator, StepHistorical
from recipys_ray.steps.impute import (
    StepImputeFastForwardFill,
    StepImputeFastZeroFill,
    StepImputeFill,
    StepImputeModel,
)
from recipys_ray.steps.resample import StepResampling
from recipys_ray.steps.rolling import StepRolling
from recipys_ray.steps.scale import StepScale
from recipys_ray.steps.sklearn_step import StepSklearn
from recipys_ray.steps.temporal import (
    StepDiff,
    StepLag,
    StepLead,
    StepSessionize,
)

__all__ = [
    "Accumulator",
    "Step",
    "StepActorPool",
    "StepDiff",
    "StepFunction",
    "ChunkProtocol",
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
]
