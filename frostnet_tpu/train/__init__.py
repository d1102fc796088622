"""Training engines (the reference's L3 layer): per-task QAT trainers built
on one QATTrainState + jitted phase steps."""
from .state import (QATTrainState, create_train_state, make_train_step,
                    make_eval_step, recalibrate)

__all__ = [
    "QATTrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "recalibrate",
]
