from kanvit.train.metrics import calculate_metrics
from kanvit.train.logging_utils import setup_logging, save_metrics
from kanvit.train.state import TrainState, create_train_state
from kanvit.train.steps import make_train_step, make_eval_step
from kanvit.train.checkpoint import save_checkpoint, restore_checkpoint, latest_checkpoint

__all__ = [
    "calculate_metrics",
    "setup_logging",
    "save_metrics",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
]
