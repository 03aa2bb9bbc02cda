from . import losses
from .optim import TrainState, make_optimizer, make_lr_schedule, swa_update
from .learner import BaseLearner

__all__ = ["losses", "TrainState", "make_optimizer", "make_lr_schedule",
           "swa_update", "BaseLearner"]
