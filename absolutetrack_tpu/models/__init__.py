"""The UmeTrack network re-designed as pure-functional JAX modules.

Layout is NHWC (TPU-native); parameters are nested dict pytrees; BatchNorm
is folded into the preceding conv/linear (the reference network is
inference-only -- lib/models/model_loader.py:84-88 loads a frozen state
dict; eval-mode BN is an affine map and folds exactly).
"""

from .config import ModelConfig
from .umetrack import (
    FrameInputs,
    RegressorOutput,
    UmeTrackModel,
    init_umetrack_params,
)

__all__ = [
    "FrameInputs",
    "ModelConfig",
    "RegressorOutput",
    "UmeTrackModel",
    "init_umetrack_params",
]
