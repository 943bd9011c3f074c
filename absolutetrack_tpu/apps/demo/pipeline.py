"""The live demo pipeline: capture -> 2D detect -> 3D track -> sinks.

Reference topology (demo/main.py): four processes over shared-memory rings
and queues. This build keeps the same stage decomposition but the 3D stage
is a single jitted TPU step, stages communicate through the native SPSC
frame ring (drop-oldest, so the camera never blocks), and every stage is a
callable so the whole pipeline can also run single-process for tests
(the reference's demo/tests/all_in_one.py mode).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np

from ...kinematics.hand_model import HandModel
from ...models import UmeTrackModel
from ...tracker import HandTracker, TrackerConfig
from ...geometry import camera as cam
from .detector_2d import Detector2D, keypoints_to_slots
from .stereo_rig import IMG_HEIGHT, IMG_WIDTH, build_stereo_cameras
from .unity_udp import UnitySender


@dataclasses.dataclass
class DemoConfig:
    num_views: int = 2
    image_width: int = IMG_WIDTH
    image_height: int = IMG_HEIGHT
    send_udp: bool = True
    visualize: bool = False


class StereoFrameSource:
    """cv2 capture of a side-by-side stereo camera (or a video file).

    Yields (V, H, W) mono + (V, H, W, 3) RGB frames; the reference splits
    the side-by-side frame and converts BGR->RGB + GRAY
    (demo/main.py:74-137).
    """

    def __init__(self, device=0, cfg: DemoConfig = DemoConfig()):
        import cv2

        self.cv2 = cv2
        self.cap = cv2.VideoCapture(device)
        self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, cfg.image_width * cfg.num_views)
        self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, cfg.image_height)
        self.cfg = cfg

    def __iter__(self):
        cv2 = self.cv2
        v = self.cfg.num_views
        while True:
            ok, frame = self.cap.read()
            if not ok:
                return
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            h, w3 = gray.shape
            w = w3 // v
            mono = np.stack([gray[:, i * w : (i + 1) * w] for i in range(v)])
            rgb_views = np.stack([rgb[:, i * w : (i + 1) * w] for i in range(v)])
            yield mono, rgb_views


class LiveTracker:
    """The 3D stage: 2D detections + mono views -> world keypoints.

    One jitted step per frame; keeps functional TrackerState internally.
    """

    def __init__(
        self,
        model: UmeTrackModel,
        hand_model_mm: HandModel,
        cameras: Optional[cam.Camera] = None,
        opts: TrackerConfig = TrackerConfig(),
    ):
        import jax
        import jax.numpy as jnp

        self.jnp = jnp
        self.cameras = cameras if cameras is not None else build_stereo_cameras()
        self.tracker = HandTracker(model, opts)
        self.state = self.tracker.init_state()
        self.hand_model_mm = hand_model_mm

        # FK fuses INTO the tracking step and the result packs into ONE
        # array: over a remote-tunnel device every blocking transfer pays a
        # full round trip (~24 ms RTT measured on this box), so the frame
        # loop is one uint8 image upload + one (2, 64) readback instead of
        # an f32 upload (4x the bytes) + three separate readbacks
        from ...kinematics.skinning import landmarks_from_hand_pose

        hand_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (2,) + x.shape), hand_model_mm
        )

        def step(state, images, kp, valid):
            state, res = self.tracker.track_frame_from_2d(
                state, images, self.cameras, self.hand_model_mm, kp, valid
            )
            lm = landmarks_from_hand_pose(
                hand_b, res.joint_angles, res.wrist_xfs, jnp.arange(2)
            )  # (2, 21, 3) world mm
            packed = jnp.concatenate(
                [res.hand_valid.astype(jnp.float32)[:, None], lm.reshape(2, 63)],
                axis=1,
            )  # (2, 64): [valid, landmarks]
            return state, packed

        self._step = jax.jit(step)

    def reset(self):
        self.state = self.tracker.init_state()

    def __call__(
        self, mono_views: np.ndarray, keypoints_2d: np.ndarray, valid: np.ndarray
    ) -> Dict[int, np.ndarray]:
        jnp = self.jnp
        # uint8 frames transfer as-is (4x less tunnel traffic than f32; the
        # warp kernels sample uint8 sources natively)
        self.state, packed = self._step(
            self.state,
            np.ascontiguousarray(mono_views),
            jnp.asarray(keypoints_2d),
            jnp.asarray(valid),
        )
        packed = np.asarray(packed)  # the frame's single blocking readback
        out: Dict[int, np.ndarray] = {}
        for h in range(2):
            if packed[h, 0] > 0.5:
                out[h] = packed[h, 1:].reshape(21, 3)
        return out

    def project_to_views(self, keypoints: Dict[int, np.ndarray]):
        """Reproject world keypoints into both views for visualization."""
        import jax.numpy as jnp

        out: Dict[int, Dict[int, np.ndarray]] = {0: {}, 1: {}}
        if not keypoints:
            return out
        # one dispatch + one readback for ALL hands (not one per hand)
        hands = sorted(keypoints)
        lm = np.stack([keypoints[h] for h in hands])  # (H, 21, 3)
        win = np.asarray(
            cam.world_to_window(
                self.cameras, jnp.asarray(lm)[:, None], cam.FISHEYE62
            )
        )  # (H, V, 21, 2)
        for hi, hand_idx in enumerate(hands):
            for vi in range(win.shape[1]):
                out[vi][hand_idx] = win[hi, vi]
        return out


def run_pipeline(
    frames: Iterable,
    detector: Detector2D,
    live_tracker: LiveTracker,
    cfg: DemoConfig = DemoConfig(),
    on_result: Optional[Callable] = None,
    max_frames: Optional[int] = None,
):
    """Single-process pipeline loop (the all_in_one mode).

    For the multi-process topology, run the stages in separate processes
    connected by utils.native.FrameRing over multiprocessing shared memory;
    each stage body is exactly one of the callables used here.
    """
    sender = UnitySender() if cfg.send_udp else None
    fps_ema = None
    t_prev = time.perf_counter()
    for i, (mono, rgb) in enumerate(frames):
        if max_frames is not None and i >= max_frames:
            break
        per_view = [detector.detect(rgb[v], v) for v in range(cfg.num_views)]
        if hasattr(detector, "advance"):
            detector.advance()
        kp, valid = keypoints_to_slots(per_view)
        keypoints = live_tracker(mono, kp, valid)
        if sender is not None:
            sender.send(keypoints)
        now = time.perf_counter()
        inst = 1.0 / max(now - t_prev, 1e-6)
        fps_ema = inst if fps_ema is None else 0.9 * fps_ema + 0.1 * inst
        t_prev = now
        if on_result is not None:
            on_result(i, keypoints, fps_ema)
    if sender is not None:
        sender.close()
