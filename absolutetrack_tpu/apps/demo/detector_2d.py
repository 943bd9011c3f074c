"""Pluggable per-view 2D hand detectors for the live demo.

The reference runs one MediaPipe Hands process per view
(demo/media_pipe_estimator.py:18-108). Here the detector is an interface:
  * MediaPipeDetector -- wraps mediapipe.solutions.hands when installed;
  * ReplayDetector -- replays precomputed/GT 2D keypoints (hermetic dev).

Output convention (matching the reference): per view, a dict
{hand_idx: (21, 2) window-space keypoints}, where hand_idx is the
egocentric convention (0=left, 1=right) obtained by flipping MediaPipe's
handedness index (media_pipe_estimator.py:85 ``1 - index``).
"""

from __future__ import annotations

from typing import Dict, Optional, Protocol

import numpy as np


class Detector2D(Protocol):
    def detect(self, rgb_view: np.ndarray, view_idx: int) -> Dict[int, np.ndarray]:
        """RGB (H, W, 3) -> {hand_idx: (21, 2) window keypoints}."""
        ...


class MediaPipeDetector:
    """mediapipe.solutions.hands wrapper (one instance per view)."""

    def __init__(
        self,
        num_views: int,
        max_num_hands: int = 2,
        min_detection_confidence: float = 0.3,
        min_tracking_confidence: float = 0.3,
        model_complexity: int = 0,
    ):
        import mediapipe as mp  # deferred: optional dependency

        self._detectors = [
            mp.solutions.hands.Hands(
                max_num_hands=max_num_hands,
                model_complexity=model_complexity,
                min_detection_confidence=min_detection_confidence,
                min_tracking_confidence=min_tracking_confidence,
            )
            for _ in range(num_views)
        ]

    def detect(self, rgb_view: np.ndarray, view_idx: int) -> Dict[int, np.ndarray]:
        h, w = rgb_view.shape[:2]
        res = self._detectors[view_idx].process(rgb_view)
        out: Dict[int, np.ndarray] = {}
        if res.multi_handedness:
            for handedness, lms in zip(res.multi_handedness, res.multi_hand_landmarks):
                # egocentric flip of MediaPipe handedness
                hand_idx = 1 - handedness.classification[0].index
                kp = np.asarray(
                    [[l.x * w, l.y * h] for l in lms.landmark], np.float32
                )
                out[hand_idx] = kp
        return out


class ReplayDetector:
    """Replays precomputed 2D keypoints, e.g. GT projections.

    ``sequence``: (T, V) list/array of {hand_idx: (21, 2)} dicts.
    """

    def __init__(self, sequence):
        self.sequence = sequence
        self._t = 0

    def advance(self):
        self._t += 1

    def detect(self, rgb_view: np.ndarray, view_idx: int) -> Dict[int, np.ndarray]:
        frame = self.sequence[min(self._t, len(self.sequence) - 1)]
        return {k: np.asarray(v, np.float32) for k, v in frame[view_idx].items()}


def keypoints_to_slots(
    per_view: list[Dict[int, np.ndarray]],
    num_hands: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Dict-of-dicts detections -> dense (H, V, 21, 2) + validity (H, V)."""
    v = len(per_view)
    kp = np.zeros((num_hands, v, 21, 2), np.float32)
    valid = np.zeros((num_hands, v), bool)
    for vi, dets in enumerate(per_view):
        for hand_idx, pts in dets.items():
            if 0 <= hand_idx < num_hands:
                kp[hand_idx, vi] = pts[:, :2]
                valid[hand_idx, vi] = True
    return kp, valid
