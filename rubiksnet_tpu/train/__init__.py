from .checkpoint import load_train_state, save_train_state
from .optim import param_labels, sgd_with_shift_mult
from .steps import (
    TrainState,
    create_train_state,
    cross_entropy,
    make_eval_step,
    make_train_step,
)

__all__ = [
    "param_labels", "sgd_with_shift_mult", "TrainState", "create_train_state",
    "cross_entropy", "make_eval_step", "make_train_step",
    "load_train_state", "save_train_state",
]
