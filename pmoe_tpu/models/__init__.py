from .punet import PredictiveUNet
from .moe import (
    get_model,
    BaseExpert,
    MixtureOfExperts,
    MixtureOfExpertsShared,
    PUNetExpert,
    PMoE,
    MODEL_TYPES,
)
from .replay import ReplayMemory, Transition

__all__ = [
    "PredictiveUNet", "get_model", "BaseExpert", "MixtureOfExperts",
    "MixtureOfExpertsShared", "PUNetExpert", "PMoE", "MODEL_TYPES",
    "ReplayMemory", "Transition",
]
