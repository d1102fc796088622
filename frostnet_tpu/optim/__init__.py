"""Optimizers (StatAssist+GradBoost as optax transforms) and LR schedules."""
from .gradboost import (
    GradBoostState,
    gradboost,
    set_warmup,
    get_optimizer,
    grouped_weight_decay,
    sgd,
    qsgd,
    rmsprop,
    qrmsprop,
    adam,
    qadam,
    adamw,
    qadamw,
    qadamn,
)
from . import schedules
from .schedules import get_lr_scheduler, ReduceLROnPlateau

__all__ = [
    "GradBoostState",
    "gradboost",
    "set_warmup",
    "get_optimizer",
    "grouped_weight_decay",
    "sgd",
    "qsgd",
    "rmsprop",
    "qrmsprop",
    "adam",
    "qadam",
    "adamw",
    "qadamw",
    "qadamn",
    "schedules",
    "get_lr_scheduler",
    "ReduceLROnPlateau",
]
