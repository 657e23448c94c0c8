from .ema import build_rate_tree, ema_update, lookup_longest_prefix
from .loops import (
    ClassifierTrainLoop,
    DiffusionTrainLoop,
    EncoderPredictorTrainLoop,
    TrainLoop,
    VQVAEAddClassesTrainLoop,
    VQVAETrainLoop,
    VQVAEUncondTrainLoop,
)
from .state import TrainState, build_optimizer
from .steps import VQUpdateRule, make_train_step

__all__ = [
    "build_rate_tree",
    "ema_update",
    "lookup_longest_prefix",
    "TrainLoop",
    "DiffusionTrainLoop",
    "VQVAETrainLoop",
    "VQVAEAddClassesTrainLoop",
    "VQVAEUncondTrainLoop",
    "ClassifierTrainLoop",
    "EncoderPredictorTrainLoop",
    "TrainState",
    "build_optimizer",
    "VQUpdateRule",
    "make_train_step",
]
