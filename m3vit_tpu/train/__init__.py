from m3vit_tpu.train.optim import build_optimizer, poly_lr
from m3vit_tpu.train.state import TrainState, create_train_state
from m3vit_tpu.train.step import make_train_step, make_eval_step

__all__ = [
    "build_optimizer",
    "poly_lr",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
