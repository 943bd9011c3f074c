"""Recording label loading + frame streams.

Replaces the reference ``lib/tracker/video_pose_data.py``: the label JSON
(cameras, camera_angles, per-frame hand poses + camera_to_world transforms,
inline hand model) loads into dense NumPy arrays; video frames come from an
mp4 (width-stacked mono views, split per video_pose_data.py:123-125) when a
decoder is available, or from a synthetic renderer for hermetic tests.

Host-side code: this is the data boundary; everything device-side is jnp.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..geometry import camera as cam
from ..kinematics.hand_model import HandModel, hand_model_from_dict


@dataclasses.dataclass
class HandPoseLabels:
    """Parsed recording labels (reference video_pose_data.py:23-93)."""

    cameras: cam.Camera  # batch (V,) intrinsics only (identity extrinsics)
    camera_kind: str
    camera_angles: np.ndarray  # (V,)
    camera_to_world: np.ndarray  # (T, V, 4, 4)
    hand_model: HandModel  # millimeters
    joint_angles: np.ndarray  # (T, 2, 22)
    wrist_transforms: np.ndarray  # (T, 2, 4, 4)
    hand_confidences: np.ndarray  # (T, 2)

    def __len__(self) -> int:
        return len(self.joint_angles)

    @property
    def num_views(self) -> int:
        return len(self.camera_angles)

    def cameras_at(self, frame_idx: int) -> cam.Camera:
        """Source cameras with this frame's extrinsics attached."""
        import jax.numpy as jnp

        return self.cameras._replace(
            T_world_from_eye=jnp.asarray(
                self.camera_to_world[frame_idx], jnp.float32
            )
        )


def load_labels(path: str) -> HandPoseLabels:
    with open(path) as f:
        labels = json.load(f)
    cams, kinds = [], []
    for js in labels["cameras"]:
        c, kind = cam.camera_from_json(js)
        cams.append(c)
        kinds.append(kind)
    assert len(set(kinds)) == 1, "mixed camera kinds unsupported"
    return HandPoseLabels(
        cameras=cam.stack_cameras(cams),
        camera_kind=kinds[0],
        camera_angles=np.asarray(labels["camera_angles"], np.float32),
        camera_to_world=np.asarray(labels["camera_to_world_transforms"], np.float32),
        hand_model=hand_model_from_dict(labels["hand_model"]),
        joint_angles=np.asarray(labels["joint_angles"], np.float32),
        wrist_transforms=np.asarray(labels["wrist_transforms"], np.float32),
        hand_confidences=np.asarray(labels["hand_confidences"], np.float32),
    )


def split_stacked_frame(raw_mono: np.ndarray, num_views: int) -> np.ndarray:
    """(H, V*W) width-stacked frame -> (V, H, W) per-view images.

    The raw mp4 stores the 4 views side by side; the reference splits via
    reshape (video_pose_data.py:123-125).
    """
    h = raw_mono.shape[0]
    per_view = raw_mono.reshape(h, num_views, -1)
    return np.moveaxis(per_view, 1, 0)


class VideoFrameSource:
    """Decode a width-stacked mono mp4 into (V, H, W) frames.

    Tries PyAV, then imageio-ffmpeg. Raises ImportError if no decoder
    exists in the environment (tests use SyntheticFrameSource instead).
    """

    def __init__(self, path: str, num_views: int):
        import os

        if not os.path.exists(path):
            # fail loudly here: cv2.VideoCapture on a missing path yields an
            # empty stream, which would silently produce empty eval results
            raise FileNotFoundError(path)
        self.path = path
        self.num_views = num_views

    def __iter__(self) -> Iterator[np.ndarray]:
        try:
            import av  # type: ignore

            container = av.open(self.path)
            stream = container.streams.video[0]
            for frame in container.decode(stream):
                raw = np.asarray(frame.to_image())[..., 0]
                yield split_stacked_frame(raw, self.num_views)
            return
        except ImportError:
            pass
        import cv2  # type: ignore

        cap = cv2.VideoCapture(self.path)
        if not cap.isOpened():
            cap.release()
            raise IOError(f"cv2 cannot decode {self.path}")
        try:
            while True:
                ok, raw = cap.read()
                if not ok:
                    break
                if raw.ndim == 3:
                    raw = raw[..., 0]
                yield split_stacked_frame(raw, self.num_views)
        finally:
            cap.release()


class SyntheticFrameSource:
    """Render simple synthetic views from the GT landmarks: bright gaussian
    blobs at each landmark's projection. Hermetic stand-in for the missing
    mp4s (reference .MISSING_LARGE_BLOBS) -- lets integration tests exercise
    the full crop/warp/network path with structured images."""

    def __init__(
        self,
        labels: HandPoseLabels,
        landmarks_world: np.ndarray,  # (T, 2, 21, 3) mm
        image_size: Optional[Tuple[int, int]] = None,
        blob_sigma: float = 3.0,
    ):
        self.labels = labels
        self.landmarks = landmarks_world
        if image_size is None:
            image_size = (
                int(np.asarray(labels.cameras.width)[0]),
                int(np.asarray(labels.cameras.height)[0]),
            )
        self.image_size = image_size
        self.blob_sigma = blob_sigma
        self._win: Optional[np.ndarray] = None  # (T, V, 2, 21, 2) projections
        self._z: Optional[np.ndarray] = None  # (T, V, 2, 21) eye depths

    def _project_all(self) -> None:
        """Project every frame's landmarks into every view in ONE batched
        call (per-frame jax dispatch made rendering ~25x slower)."""
        import jax
        import jax.numpy as jnp

        from ..utils.runtime import on_cpu

        labels = self.labels
        t, v = len(labels), labels.num_views
        with on_cpu():
            cams_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (t,) + x.shape), labels.cameras
            )._replace(
                T_world_from_eye=jnp.asarray(labels.camera_to_world, jnp.float32)
            )
            lm = jnp.asarray(
                self.landmarks.reshape(t, 1, 2 * 21, 3), jnp.float32
            )
            lm = jnp.broadcast_to(lm, (t, v, 2 * 21, 3))
            eye = cam.world_to_eye(cams_b, lm)  # (T, V, 42, 3)
            win = cam.eye_to_window(cams_b, eye, labels.camera_kind)
            self._win = np.asarray(win).reshape(t, v, 2, 21, 2)
            self._z = np.asarray(eye[..., 2]).reshape(t, v, 2, 21)

    def render_frame(self, frame_idx: int) -> np.ndarray:
        if self._win is None:
            self._project_all()

        labels = self.labels
        w, h = self.image_size
        v = labels.num_views
        out = np.zeros((v, h, w), np.float32)
        r = int(4 * self.blob_sigma) + 1  # local support; beyond 4 sigma ~ 0
        span = np.arange(-r, r + 1, dtype=np.float32)
        for hand in range(2):
            if labels.hand_confidences[frame_idx, hand] <= 0:
                continue
            win = self._win[frame_idx, :, hand]  # (V, 21, 2)
            z = self._z[frame_idx, :, hand]  # (V, 21)
            for vi in range(v):
                # scatter-add every landmark's local gaussian patch at once
                keep = (
                    (z[vi] > 0)
                    & (win[vi, :, 0] >= 0) & (win[vi, :, 0] < w)
                    & (win[vi, :, 1] >= 0) & (win[vi, :, 1] < h)
                )
                if not np.any(keep):
                    continue
                x0 = win[vi, keep, 0]  # (K,)
                y0 = win[vi, keep, 1]
                xi = np.round(x0).astype(np.int64)
                yi = np.round(y0).astype(np.int64)
                xs_l = xi[:, None] + np.arange(-r, r + 1)  # (K, P)
                ys_l = yi[:, None] + np.arange(-r, r + 1)
                dx2 = (xi[:, None] + span - x0[:, None]) ** 2  # (K, P)
                dy2 = (yi[:, None] + span - y0[:, None]) ** 2
                blob = 255.0 * np.exp(
                    -(dy2[:, :, None] + dx2[:, None, :])
                    / (2 * self.blob_sigma**2)
                )  # (K, P, P)
                # drop out-of-image contributions instead of clipping the
                # indices: clipped duplicates used to accumulate brighter
                # pixels along the image border (round-4 advisor finding)
                inside = (
                    (ys_l[:, :, None] >= 0) & (ys_l[:, :, None] < h)
                    & (xs_l[:, None, :] >= 0) & (xs_l[:, None, :] < w)
                )
                np.add.at(
                    out[vi],
                    (
                        np.clip(ys_l[:, :, None], 0, h - 1),
                        np.clip(xs_l[:, None, :], 0, w - 1),
                    ),
                    np.where(inside, blob, 0.0),
                )
        return np.clip(out, 0, 255)

    def __iter__(self) -> Iterator[np.ndarray]:
        for t in range(len(self.labels)):
            yield self.render_frame(t)


def _bary_grid(level: int) -> np.ndarray:
    """(K, 3) barycentric sample grid with i+j+k = level, K = (l+1)(l+2)/2."""
    pts = [
        (i / level, j / level, (level - i - j) / level)
        for i in range(level + 1)
        for j in range(level + 1 - i)
    ]
    return np.asarray(pts, np.float32)


_BARY_LEVELS = (4, 8, 16, 32)  # covers projected triangle edges up to 64 px
_BARY_GRIDS = {lv: _bary_grid(lv) for lv in _BARY_LEVELS}
_PACK_SHADE = 256.0  # packed z-buffer key = z_sixteenths * 256 + shade


class MeshFrameSource:
    """Z-buffered mesh-silhouette renderer: the LBS-skinned 788-vertex hand
    mesh (HandModel.mesh_vertices / dense_bone_weights, reference
    lib/common/hand.py:48-76) projected into every view and rasterized with
    headlamp shading.

    Unlike the landmark-blob renderer (``SyntheticFrameSource``), the hand
    has finite extent and surface structure, so stereo correspondence,
    depth and skeleton scale are observable from the imagery -- identical
    gaussian blobs carry neither (the round-4 oracle's error floor).

    Rasterization is a host-side depth-sorted point splat: each triangle is
    subsampled on a barycentric grid sized to its projected edge length,
    samples are scattered into a per-view z-buffer with a single
    ``np.minimum.at`` over keys packing (quantized depth, shade), and a
    one-pixel grey closing fills residual sub-pixel holes. Shading is
    Lambertian-ish off the eye-space triangle normal toward the camera.
    """

    def __init__(
        self,
        labels: HandPoseLabels,
        image_size: Optional[Tuple[int, int]] = None,
        ambient: float = 60.0,
        diffuse: float = 185.0,
    ):
        self.labels = labels
        if image_size is None:
            image_size = (
                int(np.asarray(labels.cameras.width)[0]),
                int(np.asarray(labels.cameras.height)[0]),
            )
        self.image_size = image_size
        self.ambient = float(ambient)
        self.diffuse = float(diffuse)
        hm = labels.hand_model
        assert hm.mesh_vertices is not None and hm.dense_bone_weights is not None, (
            "labels' hand model carries no mesh; use SyntheticFrameSource"
        )
        self._tris = np.asarray(hm.mesh_triangles, np.int64)  # (Ntri, 3)
        self._win: Optional[np.ndarray] = None  # (T, V, 2, 788, 2)
        self._eye: Optional[np.ndarray] = None  # (T, V, 2, 788, 3)

    def _project_all(self) -> None:
        """Skin + project every frame's mesh in one batched CPU-jax call."""
        import jax
        import jax.numpy as jnp

        from ..kinematics.skinning import mesh_from_hand_pose
        from ..utils.runtime import on_cpu

        labels = self.labels
        t, v = len(labels), labels.num_views
        n_verts = self._tris.max() + 1
        with on_cpu():
            hand_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (t, 2) + x.shape),
                labels.hand_model,
            )
            hand_idx = jnp.broadcast_to(jnp.arange(2), (t, 2))
            verts = jax.jit(mesh_from_hand_pose)(
                hand_b,
                jnp.asarray(labels.joint_angles),
                jnp.asarray(labels.wrist_transforms),
                hand_idx,
            )  # (T, 2, 788, 3) world mm
            cams_b = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (t,) + x.shape), labels.cameras
            )._replace(
                T_world_from_eye=jnp.asarray(labels.camera_to_world, jnp.float32)
            )
            flat = jnp.broadcast_to(
                verts.reshape(t, 1, 2 * n_verts, 3), (t, v, 2 * n_verts, 3)
            )
            eye = cam.world_to_eye(cams_b, flat)  # (T, V, 2*788, 3)
            win = cam.eye_to_window(cams_b, eye, self.labels.camera_kind)
            self._win = np.asarray(win).reshape(t, v, 2, n_verts, 2)
            self._eye = np.asarray(eye).reshape(t, v, 2, n_verts, 3)

    def _splat(
        self,
        pack: np.ndarray,  # (H*W,) float64 packed z-buffer, modified in place
        win: np.ndarray,  # (788, 2) window coords
        eye: np.ndarray,  # (788, 3) eye coords (mm)
    ) -> None:
        w, h = self.image_size
        t2 = win[self._tris]  # (Ntri, 3, 2)
        tz = eye[self._tris][..., 2]  # (Ntri, 3)
        teye = eye[self._tris]  # (Ntri, 3, 3)

        # keep triangles fully in front of the camera and loosely on-screen
        # (fisheye projection of near/behind points wraps unpredictably)
        xy_ok = (
            (t2[..., 0] > -w) & (t2[..., 0] < 2 * w)
            & (t2[..., 1] > -h) & (t2[..., 1] < 2 * h)
        ).all(axis=-1)
        keep = (tz > 1.0).all(axis=-1) & xy_ok
        if not np.any(keep):
            return
        t2, tz, teye = t2[keep], tz[keep], teye[keep]

        # headlamp shade off the eye-space normal toward the centroid ray
        n = np.cross(teye[:, 1] - teye[:, 0], teye[:, 2] - teye[:, 0])
        c = teye.mean(axis=1)
        denom = np.linalg.norm(n, axis=-1) * np.linalg.norm(c, axis=-1) + 1e-9
        lam = np.abs(np.einsum("ti,ti->t", n, c)) / denom  # |cos| in [0, 1]
        shade = np.clip(self.ambient + self.diffuse * lam, 0, 255)
        shade = np.floor(shade)  # integer so it packs exactly

        edge = np.maximum(
            np.linalg.norm(t2[:, 0] - t2[:, 1], axis=-1),
            np.maximum(
                np.linalg.norm(t2[:, 1] - t2[:, 2], axis=-1),
                np.linalg.norm(t2[:, 2] - t2[:, 0], axis=-1),
            ),
        )
        for lv in _BARY_LEVELS:
            lo = 0.0 if lv == _BARY_LEVELS[0] else float(_BARY_LEVELS[_BARY_LEVELS.index(lv) - 1] * 2)
            hi = float(lv * 2)  # grid spacing <= 2 px at this level
            sel = (edge > lo) & (edge <= hi) if lv != _BARY_LEVELS[-1] else (edge > lo)
            if not np.any(sel):
                continue
            bary = _BARY_GRIDS[lv]  # (K, 3)
            xy = np.einsum("kc,tcd->tkd", bary, t2[sel])  # (S, K, 2)
            z = np.einsum("kc,tc->tk", bary, tz[sel])  # (S, K)
            xi = np.round(xy[..., 0]).astype(np.int64)
            yi = np.round(xy[..., 1]).astype(np.int64)
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            if not np.any(ok):
                continue
            key = (
                np.clip(np.round(z * 16.0), 0, 2**24).astype(np.float64)
                * _PACK_SHADE
                + np.broadcast_to(shade[sel, None], z.shape)
            )
            lin = (yi * w + xi)[ok]
            np.minimum.at(pack, lin, key[ok])

    def render_frame(self, frame_idx: int) -> np.ndarray:
        if self._win is None:
            self._project_all()
        from scipy.ndimage import maximum_filter, minimum_filter

        labels = self.labels
        w, h = self.image_size
        v = labels.num_views
        out = np.empty((v, h, w), np.float32)
        for vi in range(v):
            pack = np.full(h * w, np.inf, np.float64)
            for hand in range(2):
                if labels.hand_confidences[frame_idx, hand] <= 0:
                    continue
                self._splat(
                    pack,
                    self._win[frame_idx, vi, hand],
                    self._eye[frame_idx, vi, hand],
                )
            pack = pack.reshape(h, w)
            out[vi] = 0.0
            fg = np.isfinite(pack)
            if fg.any():
                # fill sub-pixel sampling holes with a one-pixel grey
                # closing on the packed depth, applied only where the
                # buffer was background -- restricted to the silhouette's
                # bounding box (full-frame filtering dominated runtime)
                rows = np.flatnonzero(fg.any(axis=1))
                cols = np.flatnonzero(fg.any(axis=0))
                r0, r1 = max(rows[0] - 2, 0), min(rows[-1] + 3, h)
                c0, c1 = max(cols[0] - 2, 0), min(cols[-1] + 3, w)
                box = pack[r0:r1, c0:c1]
                closed = maximum_filter(minimum_filter(box, size=3), size=3)
                box = np.where(np.isfinite(box), box, closed)
                finite = np.isfinite(box)
                out[vi, r0:r1, c0:c1] = np.where(
                    finite, np.mod(np.where(finite, box, 0.0), _PACK_SHADE), 0.0
                ).astype(np.float32)
        return out

    def __iter__(self) -> Iterator[np.ndarray]:
        for t in range(len(self.labels)):
            yield self.render_frame(t)


def make_frame_source(
    labels: HandPoseLabels,
    renderer: str = "mesh",
    landmarks_world: Optional[np.ndarray] = None,
    blob_sigma: float = 3.0,
    image_size: Optional[Tuple[int, int]] = None,
):
    """Synthetic frame source factory: ``mesh`` (default) or ``blobs``.

    ``landmarks_world`` is only needed (and only computed) for the blob
    renderer; the mesh renderer skins the model's own vertices.
    """
    if renderer == "mesh":
        return MeshFrameSource(labels, image_size=image_size)
    if renderer != "blobs":
        raise ValueError(f"unknown renderer {renderer!r}")
    if landmarks_world is None:
        landmarks_world = gt_landmark_sequence(labels)
    return SyntheticFrameSource(
        labels, landmarks_world, image_size=image_size, blob_sigma=blob_sigma
    )


def gt_landmark_sequence(labels: HandPoseLabels) -> np.ndarray:
    """(T, 2, 21, 3) FK landmarks of the GT poses (world, mm), on CPU."""
    import jax
    import jax.numpy as jnp

    from ..kinematics.skinning import landmarks_from_hand_pose
    from ..utils.runtime import on_cpu

    t = len(labels)
    with on_cpu():
        hand_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (t, 2) + x.shape), labels.hand_model
        )
        hand_idx = jnp.broadcast_to(jnp.arange(2), (t, 2))
        lm = jax.jit(landmarks_from_hand_pose)(
            hand_b,
            jnp.asarray(labels.joint_angles),
            jnp.asarray(labels.wrist_transforms),
            hand_idx,
        )
        return np.asarray(lm)
