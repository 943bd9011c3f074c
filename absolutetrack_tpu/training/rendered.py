"""Rendered-window training data: the trained-weights dress rehearsal.

Builds ``SequenceBatch`` training windows by driving the REAL tracker
input pipeline -- GT-pose crop-camera synthesis + the fisheye->pinhole
warp (tracker/batched.py make_inputs, the exact serving path) -- over
synthetic frames posed by the sample_data label JSONs
(/root/reference/sample_data/user05). The default renderer is the
z-buffered LBS mesh-silhouette (tracker/video_data.py MeshFrameSource,
round 5): finite hand extent makes stereo depth and skeleton scale
observable, which the earlier identical-gaussian landmark-blob renderer
(``renderer="blobs"``) structurally could not provide.

Purpose: real UmeTrack weights are absent from this mount
(reference .MISSING_LARGE_BLOBS), and benchmarking the sequential
tracked-pose-feedback loop with RANDOM weights produces degenerate crop
statistics (the round-2 notes' known failure mode). Training on windows
drawn by the same crop/warp chain the tracker serves gives weights whose
tracked poses stay near GT on rendered recordings, so the pose-feedback
loop and the eval protocol chain can be dress-rehearsed end-to-end.
The reference has no training subsystem to mirror; the window layout
follows its packed-sequence eval
(reference run_inference_torch_data.py:39-85).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..kinematics.hand_model import HandModel, scaled_hand_model
from ..models.config import ModelConfig
from .train import SequenceBatch

NUM_HANDS = 2


def _gt_landmarks_mm(labels) -> np.ndarray:
    """(T, 2, 21, 3) FK landmarks of the GT poses (world, mm), on CPU."""
    from ..tracker.video_data import gt_landmark_sequence

    return gt_landmark_sequence(labels)


def _log_scale_vs_generic(hand_model_mm: HandModel) -> float:
    """log of this hand's uniform scale relative to the generic model.

    A uniform hand scale multiplies every joint rest offset
    (kinematics/hand_model.py scaled_hand_model), so the ratio of summed
    rest-offset norms recovers it.
    """
    from ..kinematics.hand_model import load_hand_model_json

    generic = load_hand_model_json(
        "/root/reference/dataset/generic_hand_model.json"
    )
    num = float(np.linalg.norm(
        np.asarray(hand_model_mm.joint_rest_positions), axis=-1).sum())
    den = float(np.linalg.norm(
        np.asarray(generic.joint_rest_positions), axis=-1).sum())
    return float(np.log(num / den))


def _smooth_noise(
    rng: np.random.Generator,
    t: int,
    shape: Tuple[int, ...],
    sigma: float,
    min_period: float = 40.0,
    max_period: float = 160.0,
) -> np.ndarray:
    """(t, *shape) temporally smooth noise: two random sinusoids per element
    with std ~ sigma (hand motion is low-frequency; white per-frame noise
    would be unrealistic pose wobble)."""
    ts = np.arange(t, dtype=np.float32).reshape((t,) + (1,) * len(shape))
    out = np.zeros((t,) + shape, np.float32)
    for _ in range(2):
        period = rng.uniform(min_period, max_period, shape).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, shape).astype(np.float32)
        amp = rng.normal(0.0, sigma, shape).astype(np.float32)
        out += amp * np.sin(2 * np.pi * ts / period + phase)
    return out


def augment_labels(
    labels,
    seed: int,
    scale_range: Tuple[float, float] = (0.8, 1.2),
    wrist_rot_deg: float = 10.0,
    wrist_trans_mm: float = 25.0,
    angle_offset_sigma: float = 0.10,
    angle_wobble_sigma: float = 0.06,
    head_rot_deg: float = 0.0,
    head_trans_mm: float = 0.0,
):
    """A new plausible recording from an existing one's labels.

    Samples a skeleton scale across the range the scale head must cover
    (reference lib/models/regressor.py:107-114 notes hand scales around
    0.8-1.2x generic), perturbs joint angles within the model's joint
    limits (constant offset + smooth temporal wobble), and perturbs the
    wrist trajectories (wrist-local rotation + world translation, both
    with a constant and a smooth component). The renderer and the GT both
    consume the returned labels, so images and supervision stay exactly
    consistent -- this multiplies the dress-rehearsal corpus without new
    label data.
    """
    import dataclasses

    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(seed)
    t = len(labels)

    s = float(rng.uniform(*scale_range))
    hand = scaled_hand_model(labels.hand_model, s)

    ja = np.asarray(labels.joint_angles, np.float32).copy()  # (T, 2, 22)
    ja += rng.normal(0, angle_offset_sigma, (1, 2, 22)).astype(np.float32)
    ja += _smooth_noise(rng, t, (2, 22), angle_wobble_sigma)
    jl = labels.hand_model.joint_limits
    if jl is not None:
        jl = np.asarray(jl)
        ja = np.clip(ja, jl[:, 0], jl[:, 1])

    wr = np.asarray(labels.wrist_transforms, np.float32).copy()  # (T, 2, 4, 4)
    rot_s = np.deg2rad(wrist_rot_deg) / np.sqrt(3)
    rv = rng.normal(0, rot_s, (1, 2, 3)).astype(np.float32) + _smooth_noise(
        rng, t, (2, 3), rot_s * 0.5
    )
    d_r = Rotation.from_rotvec(rv.reshape(-1, 3)).as_matrix().reshape(t, 2, 3, 3)
    tr_s = wrist_trans_mm / np.sqrt(3)
    d_t = rng.normal(0, tr_s, (1, 2, 3)).astype(np.float32) + _smooth_noise(
        rng, t, (2, 3), tr_s * 0.5
    )
    wr[..., :3, :3] = wr[..., :3, :3] @ d_r.astype(np.float32)
    wr[..., :3, 3] += d_t

    # head (rig) trajectory perturbation: one rigid world-space transform
    # per frame (constant + smooth), applied to ALL views so the stereo
    # geometry is preserved but the viewing trajectory is novel -- the
    # held-out recording differs from training mostly by its extrinsics
    # trajectory, which per-hand augmentation alone cannot cover
    c2w = np.asarray(labels.camera_to_world, np.float32).copy()  # (T, V, 4, 4)
    if head_rot_deg > 0 or head_trans_mm > 0:
        hr = np.deg2rad(head_rot_deg) / np.sqrt(3)
        rv_h = rng.normal(0, hr, (1, 3)).astype(np.float32) + _smooth_noise(
            rng, t, (3,), hr * 0.5
        )
        r_h = Rotation.from_rotvec(rv_h.reshape(-1, 3)).as_matrix().reshape(
            t, 1, 3, 3
        ).astype(np.float32)
        ht = head_trans_mm / np.sqrt(3)
        t_h = rng.normal(0, ht, (1, 3)).astype(np.float32) + _smooth_noise(
            rng, t, (3,), ht * 0.5
        )
        # rotate about the per-frame rig centroid (not the world origin:
        # the hands sit ~0.2-0.5 m away and an origin rotation would
        # fling the cameras off the scene)
        center = c2w[..., :3, 3].mean(axis=1, keepdims=True)  # (T, 1, 3)
        c2w[..., :3, :3] = r_h @ c2w[..., :3, :3]
        c2w[..., :3, 3] = (
            np.einsum("tvij,tvj->tvi", np.broadcast_to(r_h, c2w[..., :3, :3].shape),
                      c2w[..., :3, 3] - center)
            + center + t_h[:, None, :]
        )

    return dataclasses.replace(
        labels,
        hand_model=hand,
        joint_angles=ja,
        wrist_transforms=wr,
        camera_to_world=c2w,
    )


def rendered_windows_from_labels(
    labels,
    starts: Sequence[int],
    window_t: int,
    cfg: ModelConfig = ModelConfig(),
    blob_sigma: float = 3.0,
    chunk_windows: int = 16,
    crop_jitter_seed: Optional[int] = None,
    renderer: str = "mesh",
) -> Tuple[SequenceBatch, HandModel]:
    """Windows of rendered frames pushed through the serving crop/warp path.

    Returns a time-major ``SequenceBatch`` with B = len(starts)*NUM_HANDS
    samples (sample index = window*2 + hand) plus the matching batched
    left-canonical hand model in meters. ``sample_mask`` is False where the
    crop generator rejected the hand or found fewer than 2 valid views
    (the train step assumes a full stereo view_mask).

    ``crop_jitter_seed``: perturb the poses fed to the CROP GENERATOR only
    (GT supervision unchanged) -- per-frame ~4 deg wrist rotation, ~8 mm
    translation, ~0.05 rad joint noise. This matches serving, where crops
    come from the previous frame's imperfect tracked pose, so the network
    trains on off-center crops like the ones the live loop produces.
    """
    import jax
    import jax.numpy as jnp

    from ..geometry import camera as cam
    from ..models.umetrack import UmeTrackModel, init_umetrack_params
    from ..tracker.batched import BatchedTracker
    from ..tracker.tracker import MM_TO_M, TrackerConfig
    from ..tracker.video_data import make_frame_source
    from ..utils.runtime import on_cpu

    opts = TrackerConfig(crop_size=cfg.input_size)
    w_n, t_n = len(starts), window_t
    v = labels.num_views

    src = make_frame_source(
        labels,
        renderer=renderer,
        landmarks_world=_gt_landmarks_mm(labels) if renderer == "blobs" else None,
        blob_sigma=blob_sigma,
    )
    frame_ids = [s + dt for s in starts for dt in range(t_n)]  # F = W*T

    ja_crop = np.asarray(labels.joint_angles, np.float32)
    wr_crop = np.asarray(labels.wrist_transforms, np.float32)
    if crop_jitter_seed is not None:
        from scipy.spatial.transform import Rotation

        jrng = np.random.default_rng(crop_jitter_seed)
        tt = len(labels)
        ja_crop = ja_crop + jrng.normal(0, 0.05, ja_crop.shape).astype(np.float32)
        rv = jrng.normal(0, np.deg2rad(4.0) / np.sqrt(3), (tt, 2, 3))
        d_r = (
            Rotation.from_rotvec(rv.reshape(-1, 3))
            .as_matrix()
            .reshape(tt, 2, 3, 3)
            .astype(np.float32)
        )
        wr_crop = wr_crop.copy()
        wr_crop[..., :3, :3] = wr_crop[..., :3, :3] @ d_r
        wr_crop[..., :3, 3] += jrng.normal(
            0, 8.0 / np.sqrt(3), (tt, 2, 3)
        ).astype(np.float32)
    rendered = {}
    for fi in sorted(set(frame_ids)):
        rendered[fi] = src.render_frame(fi).astype(np.uint8)

    # Process windows in fixed-size chunks: one jit compile, bounded host
    # memory (a single build over ~1.4k full frames would need GBs).
    chunk_w = min(w_n, chunk_windows)
    f = chunk_w * t_n
    with on_cpu():
        # params only provide state shapes for make_inputs; never trained
        params = init_umetrack_params(jax.random.PRNGKey(0), cfg)
        model = UmeTrackModel(params, cfg)
        bt = BatchedTracker(model, opts)

        cams_f0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (f,) + x.shape), labels.cameras
        )
        angles_f = jnp.broadcast_to(jnp.asarray(labels.camera_angles), (f, v))
        hand_f = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (f,) + x.shape), labels.hand_model
        )

        @jax.jit
        def build(images, cam_to_world, ja_f, wr_f, conf_f):
            cams_f = cams_f0._replace(T_world_from_eye=cam_to_world)
            slots = bt._gen_slots(
                cams_f, angles_f, hand_f, ja_f, wr_f, conf_f, 2, cam.FISHEYE62
            )
            frame = bt.make_inputs(
                bt.init_state(f), images, cams_f, slots, cam.FISHEYE62
            )
            n_views = jnp.sum(slots.view_valid, axis=-1)  # (F, 2)
            ok = slots.hand_valid & (n_views >= 2)
            return frame, ok

        parts_frames, parts_ok = [], []
        for c0 in range(0, w_n, chunk_w):
            chunk_starts = list(starts[c0 : c0 + chunk_w])
            pad = chunk_w - len(chunk_starts)
            chunk_starts += [chunk_starts[-1]] * pad
            ids = [s + dt for s in chunk_starts for dt in range(t_n)]
            images = np.stack([rendered[fi] for fi in ids])
            fr, ok = build(
                jnp.asarray(images),
                jnp.asarray(labels.camera_to_world[ids]),
                jnp.asarray(ja_crop[ids]),
                jnp.asarray(wr_crop[ids]),
                jnp.asarray(labels.hand_confidences[ids]),
            )
            keep = (chunk_w - pad) * t_n
            parts_frames.append(
                jax.tree.map(lambda x: np.asarray(x[: keep * NUM_HANDS]), fr)
            )
            parts_ok.append(np.asarray(ok[:keep]))
        frame_all = jax.tree.map(
            lambda *xs: np.concatenate(xs, axis=0), *parts_frames
        )
        ok = np.concatenate(parts_ok, axis=0)  # (W*T, 2)

    def to_tb(x: np.ndarray) -> np.ndarray:
        """(F*2, ...) sample-flat -> (T, W*2, ...) time-major."""
        x = x.reshape((w_n, t_n, NUM_HANDS) + x.shape[1:])
        return np.moveaxis(x, 1, 0).reshape((t_n, w_n * NUM_HANDS) + x.shape[3:])

    def lbl_tb(x: np.ndarray) -> np.ndarray:
        """(F, 2, ...) frame-major labels -> (T, W*2, ...)."""
        x = x.reshape((w_n, t_n, NUM_HANDS) + x.shape[2:])
        return np.moveaxis(x, 1, 0).reshape((t_n, w_n * NUM_HANDS) + x.shape[3:])

    sample_mask = lbl_tb(ok)
    use_mem = sample_mask.copy()
    use_mem[0] = False

    # GT wrist: world mm (right-hand space for hand 1) -> LEFT-canonical
    # meters (negate the x column for right hands -- the inverse of the
    # model's output mirror, models/umetrack.py _recover_wrist_in_world)
    wr = np.asarray(labels.wrist_transforms[frame_ids], np.float32).copy()
    wr[:, 1, :, 0] *= -1.0
    wr[..., :3, 3] *= MM_TO_M

    hand_m1 = scaled_hand_model(labels.hand_model, MM_TO_M)
    b = w_n * NUM_HANDS
    import jax as _jax

    hand_m = _jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (b,) + np.asarray(x).shape), hand_m1
    )

    # GT log-scale vs the GENERIC model: the unknown-skeleton protocol
    # tracks with scaled_hand_model(generic, mean predicted scale)
    # (reference run_eval_unknown_skeleton.py:73-77), so the scale head's
    # target is this recording's hand size relative to generic
    log_scale = np.float32(_log_scale_vs_generic(labels.hand_model))

    # crops store as uint8 (sources are uint8; bilinear blends quantize to
    # <=0.5/255 LSB) -- 4x less host RAM/npz for the ~400 MB full dataset;
    # materialize() converts minibatches back to [0,1] f32
    crops_u8 = np.clip(
        np.round(frame_all.left_images * 255.0), 0, 255
    ).astype(np.uint8)
    batch = SequenceBatch(
        images=to_tb(crops_u8),
        intrinsics=to_tb(frame_all.intrinsics),
        extrinsics=to_tb(frame_all.extrinsics),
        use_memory=use_mem,
        sample_mask=sample_mask,
        hand_idx=np.tile(np.arange(NUM_HANDS, dtype=np.int32), w_n),
        skel_axes=np.asarray(hand_m.joint_rotation_axes, np.float32),
        skel_rest=np.asarray(hand_m.joint_rest_positions, np.float32),
        gt_joint_angles=lbl_tb(
            np.asarray(labels.joint_angles[frame_ids], np.float32)
        ),
        gt_wrist=lbl_tb(wr),
        gt_log_scale=np.full(b, log_scale, np.float32),
    )
    return batch, hand_m


def materialize(batch: SequenceBatch) -> SequenceBatch:
    """uint8-stored crops -> the [0,1] f32 the model consumes."""
    if batch.images.dtype == np.uint8:
        batch = batch._replace(
            images=np.asarray(batch.images, np.float32) / 255.0
        )
    return batch


def slice_windows(
    batch: SequenceBatch, hand_m: HandModel, idx: np.ndarray
) -> Tuple[SequenceBatch, HandModel]:
    """Select samples (B axis) for a minibatch (crops -> f32)."""
    import jax

    time_major = {
        "images", "intrinsics", "extrinsics", "use_memory", "sample_mask",
        "gt_joint_angles", "gt_wrist",
    }
    fields = {}
    for name in SequenceBatch._fields:
        x = getattr(batch, name)
        if x is None:
            fields[name] = None
        elif name in time_major:
            fields[name] = x[:, idx]
        else:
            fields[name] = x[idx]
    return materialize(SequenceBatch(**fields)), jax.tree.map(
        lambda x: x[idx], hand_m
    )


def concat_windows(
    parts: List[Tuple[SequenceBatch, HandModel]]
) -> Tuple[SequenceBatch, HandModel]:
    """Concatenate per-recording window sets along the sample axis."""
    import jax

    time_major = {
        "images", "intrinsics", "extrinsics", "use_memory", "sample_mask",
        "gt_joint_angles", "gt_wrist",
    }
    fields = {}
    for name in SequenceBatch._fields:
        xs = [getattr(b, name) for b, _ in parts]
        if xs[0] is None:
            fields[name] = None
        else:
            fields[name] = np.concatenate(xs, axis=1 if name in time_major else 0)
    hand_m = jax.tree.map(
        lambda *xs: np.concatenate(xs, axis=0), *[h for _, h in parts]
    )
    return SequenceBatch(**fields), hand_m


def _save_dataset(
    path: str, batch: SequenceBatch, hand_m: HandModel, meta: Optional[dict] = None
) -> None:
    import json

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrs = {f"b_{k}": np.asarray(getattr(batch, k)) for k in SequenceBatch._fields
            if getattr(batch, k) is not None}
    arrs.update({f"h_{k}": np.asarray(getattr(hand_m, k)) for k in hand_m._fields
                 if getattr(hand_m, k) is not None})
    if meta is not None:
        arrs["meta_json"] = np.frombuffer(
            json.dumps(meta, sort_keys=True).encode(), np.uint8
        )
    np.savez_compressed(path, **arrs)


def _load_dataset(path: str) -> Tuple[SequenceBatch, HandModel, Optional[dict]]:
    import json

    z = np.load(path)
    batch = SequenceBatch(
        **{k: (z[f"b_{k}"] if f"b_{k}" in z else None) for k in SequenceBatch._fields}
    )
    hand = HandModel(
        **{k: (z[f"h_{k}"] if f"h_{k}" in z else None) for k in HandModel._fields}
    )
    meta = json.loads(bytes(z["meta_json"])) if "meta_json" in z else None
    return batch, hand, meta


def rendered_dataset(
    label_paths: Sequence[str],
    window_t: int = 8,
    stride: int = 8,
    cfg: ModelConfig = ModelConfig(),
    max_windows_per_recording: Optional[int] = None,
    cache_path: Optional[str] = None,
    augment: int = 0,
    crop_jitter: bool = False,
    seed: int = 0,
    blob_sigma: float = 3.0,
    augment_kwargs: Optional[dict] = None,
    renderer: str = "mesh",
) -> Tuple[SequenceBatch, HandModel]:
    """Windows from several label JSONs, optionally cached as one .npz.

    ``augment``: number of EXTRA augmented replicas per recording (replica
    0 is always the clean labels). Each replica samples a skeleton scale in
    [0.8, 1.2], perturbed joint angles within limits, and perturbed wrist
    trajectories (augment_labels); with ``crop_jitter`` the augmented
    replicas' crops additionally come from jittered poses, matching the
    serving loop's imperfect tracked-pose crops.

    The cache records its full build parameters and is rebuilt when any of
    them change (a stale cache under new parameters would silently train
    on the wrong corpus).
    """
    meta = {
        "version": 3,
        "renderer": str(renderer),
        "label_paths": list(label_paths),
        "window_t": int(window_t),
        "stride": int(stride),
        "input_size": list(cfg.input_size),
        "blob_sigma": float(blob_sigma),
        "augment": int(augment),
        "crop_jitter": bool(crop_jitter),
        "seed": int(seed),
        "max_windows": int(max_windows_per_recording or 0),
        "augment_kwargs": dict(augment_kwargs or {}),
    }
    if cache_path and os.path.exists(cache_path):
        batch, hand_m, cached_meta = _load_dataset(cache_path)
        if cached_meta == meta:
            return batch, hand_m
        print(
            f"rendered_dataset: {cache_path} was built with different "
            "parameters; rebuilding"
        )

    from ..tracker.video_data import load_labels

    parts = []
    for pi, p in enumerate(label_paths):
        base = load_labels(p)
        for r in range(augment + 1):
            rseed = seed * 7919 + pi * 131 + r
            lv = (
                base
                if r == 0
                else augment_labels(base, seed=rseed, **(augment_kwargs or {}))
            )
            starts = list(range(0, len(lv) - window_t, stride))
            if max_windows_per_recording:
                starts = starts[:max_windows_per_recording]
            jseed = rseed + 61 if (crop_jitter and r > 0) else None
            parts.append(
                rendered_windows_from_labels(
                    lv, starts, window_t, cfg=cfg, blob_sigma=blob_sigma,
                    crop_jitter_seed=jseed, renderer=renderer,
                )
            )
    batch, hand_m = concat_windows(parts)
    if cache_path:
        _save_dataset(cache_path, batch, hand_m, meta)
    return batch, hand_m
