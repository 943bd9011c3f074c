"""Per-frame tracking runtime: crop-camera generation, warping, inference."""

from .batched import BatchedTracker
from .crop_gen import CropSlots, gen_crop_slots
from .pipelined import track_chunk_eval
from .tracker import HandTracker, TrackerConfig, TrackerState, TrackFrameResult

__all__ = [
    "BatchedTracker",
    "CropSlots",
    "HandTracker",
    "TrackFrameResult",
    "TrackerConfig",
    "track_chunk_eval",
    "TrackerState",
    "gen_crop_slots",
]
