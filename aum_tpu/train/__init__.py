from aum_tpu.train.optim import TrainHyperParams, make_optimizer, lr_at_step
from aum_tpu.train.metrics import calculate_stats, d_prime
from aum_tpu.train.checkpoints import Checkpointer, average_params
from aum_tpu.train.loop import (
    TrainState,
    make_train_step,
    make_eval_step,
    train_loop,
    evaluate,
)

__all__ = [
    "Checkpointer",
    "average_params",
    "TrainHyperParams",
    "make_optimizer",
    "lr_at_step",
    "calculate_stats",
    "d_prime",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "train_loop",
    "evaluate",
]
