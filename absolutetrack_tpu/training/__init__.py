"""Training: losses, optimizer, sharded train/eval steps.

The reference ships no training loop (inference-only checkpoint loading,
model_loader.py:84-88). This module adds one -- a capability the reference
lacks -- built around the UmeTrack paper's supervision signals: FK landmark
error with predicted per-landmark uncertainty (Gaussian NLL), joint-angle
and wrist-point regression, and skeleton-scale regression for the
unknown-skeleton branch.
"""

from .loss import LossWeights, sequence_loss
from .train import TrainState, make_train_step, make_eval_step

__all__ = [
    "LossWeights",
    "TrainState",
    "make_eval_step",
    "make_train_step",
    "sequence_loss",
]
