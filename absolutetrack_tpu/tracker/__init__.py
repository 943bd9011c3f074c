"""Per-frame tracking runtime: crop-camera generation, warping, inference."""

from .batched import BatchedTracker
from .crop_gen import CropSlots, gen_crop_slots
from .tracker import HandTracker, TrackerConfig, TrackerState, TrackFrameResult

__all__ = [
    "BatchedTracker",
    "CropSlots",
    "HandTracker",
    "TrackFrameResult",
    "TrackerConfig",
    "TrackerState",
    "gen_crop_slots",
]
