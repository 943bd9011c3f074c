"""Shared evaluation driver: track a recording, produce keypoint results.

TPU-first equivalent of the reference's per-sequence eval loop
(run_eval_known_skeleton.py:48-106): a jitted per-frame step (crop + warp +
network + FK) scanned over the recording, with GT-pose-driven crops,
producing the same {tracked, gt, valid} result dict the reference pickles.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics.hand_model import HandModel, scaled_hand_model
from ..kinematics.skinning import landmarks_from_hand_pose
from ..models import ModelConfig, UmeTrackModel, init_umetrack_params
from ..tracker import HandTracker, TrackerConfig
from ..tracker.video_data import (
    HandPoseLabels,
    SyntheticFrameSource,
    VideoFrameSource,
    load_labels,
)

NUM_HANDS = 2
NUM_LANDMARKS = 21


def build_model(
    checkpoint: Optional[str] = None, cfg: ModelConfig = ModelConfig(), seed: int = 0
) -> UmeTrackModel:
    from ..utils.runtime import on_cpu

    with on_cpu():  # init op-by-op on host; params move at first jit use
        if checkpoint:
            # torch state dict OR native .msgpack (e.g. the dress-rehearsal
            # checkpoint from scripts/train_rehearsal.sh) -- sniffed by path
            from ..models.checkpoint import load_any

            params = load_any(checkpoint, cfg)
        else:
            params = init_umetrack_params(jax.random.PRNGKey(seed), cfg)
    return UmeTrackModel(params, cfg)


from ..tracker.video_data import gt_landmark_sequence  # noqa: E402  (re-export)


@dataclasses.dataclass
class SequenceResult:
    """Same payload as the reference's per-sequence pickle
    (run_eval_known_skeleton.py:96-104), hands-major."""

    tracked_keypoints: np.ndarray  # (2, T, 21, 3)
    gt_keypoints: np.ndarray  # (2, T, 21, 3)
    valid_tracking: np.ndarray  # (2, T)
    predicted_scales: Optional[np.ndarray] = None  # (2, T)
    joint_angles: Optional[np.ndarray] = None  # (2, T, 22) raw predictions
    wrist_xfs: Optional[np.ndarray] = None  # (2, T, 4, 4) world, mm


def _prepad_opts(opts: TrackerConfig, labels: HandPoseLabels):
    """Enable host-side source pre-padding for the warp kernels.

    Frames upload zero-padded to the Pallas windows' aligned dims
    (rows to 256-multiples, cols to 128-multiples) and
    ``TrackerConfig.src_valid_hw`` records the true sensor extent, so the
    per-dispatch device-side whole-batch pad disappears at bitwise
    identical sampling (tests/test_pallas_warp.py TestPrePaddedSource).
    Returns (opts, pad_hw) where pad_hw is None when already aligned or
    when the caller pinned src_valid_hw itself.
    """
    h = int(np.asarray(labels.cameras.height).reshape(-1)[0])
    w = int(np.asarray(labels.cameras.width).reshape(-1)[0])
    hp, wp = -(-h // 256) * 256, -(-w // 128) * 128
    if opts.src_valid_hw is not None or (hp == h and wp == w):
        return opts, None
    return dataclasses.replace(opts, src_valid_hw=(h, w)), (hp, wp)


def _pad_frames(images: np.ndarray, pad_hw) -> np.ndarray:
    """(..., H, W) -> (..., hp, wp) zero-padded (no-op when pad_hw is None)."""
    if pad_hw is None:
        return images
    hp, wp = pad_hw
    h, w = images.shape[-2:]
    if h > hp or w > wp:
        # src_valid_hw was pinned to the LABEL camera dims; silently
        # truncating larger frames to that extent would sample a cropped
        # region (round-4 advisor finding)
        raise ValueError(
            f"frame dims ({h}, {w}) exceed the label cameras' padded "
            f"extent ({hp}, {wp}); frames and labels disagree"
        )
    out = np.zeros(images.shape[:-2] + (hp, wp), images.dtype)
    out[..., :h, :w] = images
    return out


def track_recording(
    model: UmeTrackModel,
    labels: HandPoseLabels,
    frames: Iterable[np.ndarray],
    hand_model_mm: Optional[HandModel] = None,
    opts: Optional[TrackerConfig] = None,
    min_num_crops: int = 1,
    calibrate_scale: bool = False,
    max_frames: Optional[int] = None,
    chunk_size: int = 8,
    pipelined: bool = True,
) -> SequenceResult:
    """Track a full recording with GT-pose-driven crops.

    Frames run through the tracker in chunks of ``chunk_size`` inside one
    device dispatch (sequential semantics preserved -- the temporal state
    carries across frames and chunks). One dispatch per chunk amortizes
    host->device latency, which dominates when the accelerator is reached
    over a network tunnel. Produces FK landmarks for tracked and GT poses
    plus validity, matching the reference protocol
    (run_eval_known_skeleton.py:48-106).

    ``pipelined=True`` (default) batches the frame-independent trunk
    (crop-gen + warp + backbone + fusion) over the whole chunk and scans
    only the ConvRNN/regressor tail (tracker.track_chunk_eval) -- valid
    because eval crops come from per-frame GT poses, not tracked results.
    ``pipelined=False`` scans the full per-frame step (the live-mode
    dataflow); both paths agree numerically (tests/test_pipelined.py).
    """
    from ..tracker import track_chunk_eval

    if opts is None:
        # crops must match the network's input size (a tiny-arch model
        # with the default 96x96 crops fails at the memory concat)
        opts = TrackerConfig(crop_size=model.cfg.input_size)
    opts, pad_hw = _prepad_opts(opts, labels)
    tracker = HandTracker(model, opts)
    hand_mm = hand_model_mm if hand_model_mm is not None else labels.hand_model

    camera_angles = jnp.asarray(labels.camera_angles)
    base_cams = labels.cameras

    def frame_step(state, images, cam_t, ja, wr, conf):
        cams = base_cams._replace(T_world_from_eye=cam_t)
        if calibrate_scale:
            return tracker.track_frame_and_calibrate_scale(
                state, images, cams, camera_angles, hand_mm, ja, wr, conf,
                src_kind=labels.camera_kind,
            )
        return tracker.track_frame(
            state, images, cams, camera_angles, hand_mm, ja, wr, conf,
            min_num_crops=min_num_crops, src_kind=labels.camera_kind,
        )

    # images transfer AND sample in their source dtype: uint8 video frames
    # are 4x less host->device traffic and the Pallas warp samples uint8
    # natively (per-window VMEM convert); an up-front whole-image f32 cast
    # would re-create the exact convert overhead the kernel path avoids
    if pipelined:

        @jax.jit
        def run_chunk(state, images_c, cam_c, ja_c, wr_c, conf_c):
            return track_chunk_eval(
                model, opts, state, images_c, base_cams,
                cam_c, camera_angles, hand_mm, ja_c, wr_c, conf_c,
                min_num_crops=min_num_crops, src_kind=labels.camera_kind,
                calibrate_scale=calibrate_scale,
            )

    else:

        @jax.jit
        def run_chunk(state, images_c, cam_c, ja_c, wr_c, conf_c):
            def body(state, xs):
                state, res = frame_step(state, *xs)
                return state, res

            return jax.lax.scan(body, state, (images_c, cam_c, ja_c, wr_c, conf_c))

    t_total = len(labels) if max_frames is None else min(max_frames, len(labels))
    tracked = np.zeros((NUM_HANDS, t_total, NUM_LANDMARKS, 3), np.float32)
    gt = np.zeros_like(tracked)
    valid = np.zeros((NUM_HANDS, t_total), bool)
    scales = np.zeros((NUM_HANDS, t_total), np.float32)
    raw_angles = np.zeros((NUM_HANDS, t_total, 22), np.float32)
    raw_wrists = np.zeros((NUM_HANDS, t_total, 4, 4), np.float32)

    # tracked landmarks FK with the tracking hand model (possibly the
    # calibrated generic skeleton); GT landmarks always FK with the
    # recording's own GT hand model.
    hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (NUM_HANDS,) + x.shape), hand_mm
    )
    gt_hand_b = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (NUM_HANDS,) + x.shape), labels.hand_model
    )
    hand_idx = jnp.arange(NUM_HANDS)
    fk = jax.jit(
        lambda ja, wr: landmarks_from_hand_pose(hand_b, ja, wr, hand_idx)
    )
    fk_gt = jax.jit(
        lambda ja, wr: landmarks_from_hand_pose(gt_hand_b, ja, wr, hand_idx)
    )

    state = tracker.init_state()
    frame_iter = iter(frames)
    # async streaming: device results are pulled only after the last chunk
    # is dispatched, so chunk t+1's host assembly and transfer overlap the
    # device computing chunk t (per-chunk result leaves are tiny)
    pending = []  # (t_start, n, res, tracked_lm_dev, gt_lm_dev)
    t = 0
    while t < t_total:
        n = min(chunk_size, t_total - t)
        chunk_frames = []
        for _ in range(n):
            try:
                chunk_frames.append(next(frame_iter))
            except StopIteration:
                break
        if not chunk_frames:
            break
        n = len(chunk_frames)
        sl = slice(t, t + n)
        # pad the tail chunk to the static chunk_size (masked out after)
        pad = chunk_size - n
        def pad0(a):
            return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)]) if pad else a

        images_c = pad0(_pad_frames(np.asarray(chunk_frames), pad_hw))
        cam_c = pad0(labels.camera_to_world[sl])
        ja_c = jnp.asarray(pad0(labels.joint_angles[sl]))
        wr_c = jnp.asarray(pad0(labels.wrist_transforms[sl]))
        conf_c = pad0(labels.hand_confidences[sl])

        state, res = run_chunk(
            state,
            jnp.asarray(images_c),
            jnp.asarray(cam_c),
            ja_c,
            wr_c,
            jnp.asarray(conf_c),
        )
        pending.append(
            (t, n, res, fk(res.joint_angles, res.wrist_xfs), fk_gt(ja_c, wr_c))
        )
        t += n

    for t0, n, res, tk_dev, gk_dev in pending:
        sl = slice(t0, t0 + n)
        hv = np.asarray(res.hand_valid)[:n]  # (n, 2)
        valid[:, sl] = hv.T
        tracked[:, sl] = np.moveaxis(np.asarray(tk_dev)[:n], 0, 1)
        gt[:, sl] = np.moveaxis(np.asarray(gk_dev)[:n], 0, 1)
        if res.predicted_scales is not None:
            scales[:, sl] = np.asarray(res.predicted_scales)[:n].T
        raw_angles[:, sl] = np.moveaxis(np.asarray(res.joint_angles)[:n], 0, 1)
        raw_wrists[:, sl] = np.moveaxis(np.asarray(res.wrist_xfs)[:n], 0, 1)

    return SequenceResult(
        tracked_keypoints=tracked,
        gt_keypoints=gt,
        valid_tracking=valid,
        predicted_scales=scales if calibrate_scale else None,
        joint_angles=raw_angles,
        wrist_xfs=raw_wrists,
    )


def track_recordings_batched(
    model: UmeTrackModel,
    recordings,  # list of (HandPoseLabels, frame iterable) pairs
    hand_models_mm: Optional[list] = None,  # per-recording tracking skeletons
    opts: Optional[TrackerConfig] = None,
    min_num_crops: int = 1,
    calibrate_scale: bool = False,
    max_frames: Optional[int] = None,
    chunk_size: int = 8,
    pipelined: bool = True,
    mesh=None,
) -> list:
    """Track R recordings in lockstep on one chip -> list of SequenceResult.

    With ``mesh`` (a Mesh with a 'data' axis), recordings are sharded over
    the data axis: each device tracks R/n_data recordings; the
    recording-major pipelined layout partitions with no cross-device
    communication (SPMD eval over chips/hosts -- the scaling story the
    reference's Pool(8) cannot reach past one node). R must divide by the
    data-axis size.

    TPU-native analog of the reference's ``Pool(8).map_async`` over
    sequences (run_eval_known_skeleton.py:116-119): one jitted step advances
    every recording one frame (batch = R x 2 hand slots), filling the chip
    instead of forking processes. Per-recording results match the
    sequential ``track_recording`` path numerically (each recording keeps
    its own cameras, hand model, temporal memory, and validity history).

    Shorter recordings pad with zero-confidence frames (their hand slots go
    invalid, results are trimmed on return). All recordings must share the
    view count, image size, and camera kind.
    """
    from ..tracker.batched import BatchedTracker

    labels_list = [lab for lab, _ in recordings]
    r = len(labels_list)
    kinds = {lab.camera_kind for lab in labels_list}
    views = {lab.num_views for lab in labels_list}
    assert len(kinds) == 1 and len(views) == 1, "recordings must share rig layout"
    src_kind = labels_list[0].camera_kind

    if opts is None:
        opts = TrackerConfig(crop_size=model.cfg.input_size)
    opts, pad_hw = _prepad_opts(opts, labels_list[0])
    tracker = BatchedTracker(model, opts)
    hands_mm = (
        hand_models_mm
        if hand_models_mm is not None
        else [lab.hand_model for lab in labels_list]
    )
    hand_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *hands_mm)
    base_cams = jax.tree.map(lambda *xs: jnp.stack(xs), *[l.cameras for l in labels_list])
    camera_angles = jnp.stack([jnp.asarray(l.camera_angles) for l in labels_list])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        assert r % n_data == 0, (r, n_data)

        def _shard0(x):  # recording axis leading
            x = jnp.asarray(x)
            return jax.device_put(
                x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1))))
            )

        def _shard1(x):  # (chunk, R, ...) time-major chunk arrays
            x = jnp.asarray(x)
            return jax.device_put(
                x,
                NamedSharding(mesh, P(*((None, "data") + (None,) * (x.ndim - 2)))),
            )

        hand_stack = jax.tree.map(_shard0, hand_stack)
        base_cams = jax.tree.map(_shard0, base_cams)
        camera_angles = _shard0(camera_angles)
    else:
        _shard1 = jnp.asarray

    def frame_step(state, images, cam_t, ja, wr, conf):
        cams = base_cams._replace(T_world_from_eye=cam_t)
        if calibrate_scale:
            return tracker.track_frames_and_calibrate_scale(
                state, images, cams, camera_angles, hand_stack, ja, wr, conf,
                src_kind=src_kind,
            )
        return tracker.track_frames(
            state, images, cams, camera_angles, hand_stack, ja, wr, conf,
            min_num_crops=min_num_crops, src_kind=src_kind,
        )

    # Images transfer AND sample in their source dtype (uint8 for decoded
    # video = 4x less host->device traffic than f32, and the Pallas warp
    # samples uint8 natively with a per-window VMEM convert).
    if pipelined:
        from ..tracker.pipelined import track_chunk_eval_batched

        @jax.jit
        def run_chunk(state, images_rm, cam_c, ja_c, wr_c, conf_c):
            # images arrive RECORDING-major (R, chunk, V, H, W): the host
            # assembles them per recording anyway, and the pipelined
            # phase-A flatten is then a free reshape instead of a device
            # transpose of the whole uint8 chunk
            return track_chunk_eval_batched(
                model, opts, state, images_rm, base_cams, cam_c, camera_angles,
                hand_stack, ja_c, wr_c, conf_c, min_num_crops=min_num_crops,
                src_kind=src_kind, calibrate_scale=calibrate_scale,
                images_rec_major=True,
            )

    else:

        @jax.jit
        def run_chunk(state, images_c, cam_c, ja_c, wr_c, conf_c):
            def body(state, xs):
                state, res = frame_step(state, *xs)
                return state, res

            return jax.lax.scan(body, state, (images_c, cam_c, ja_c, wr_c, conf_c))

    lengths = [
        len(lab) if max_frames is None else min(max_frames, len(lab))
        for lab in labels_list
    ]
    t_total = max(lengths)
    tracked = np.zeros((r, NUM_HANDS, t_total, NUM_LANDMARKS, 3), np.float32)
    gt = np.zeros_like(tracked)
    valid = np.zeros((r, NUM_HANDS, t_total), bool)
    scales = np.zeros((r, NUM_HANDS, t_total), np.float32)
    raw_angles = np.zeros((r, NUM_HANDS, t_total, 22), np.float32)
    raw_wrists = np.zeros((r, NUM_HANDS, t_total, 4, 4), np.float32)

    # FK hand models broadcast per hand slot: tracked poses use the tracking
    # skeleton, GT poses the recording's own GT skeleton
    def _hand2(hm):
        return jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], NUM_HANDS) + x.shape[1:]),
            hm,
        )

    hand_fk = _hand2(hand_stack)
    gt_hand_fk = _hand2(
        jax.tree.map(lambda *xs: jnp.stack(xs), *[l.hand_model for l in labels_list])
    )
    hand_idx = jnp.broadcast_to(jnp.arange(NUM_HANDS), (r, NUM_HANDS))
    fk = jax.jit(lambda ja, wr: landmarks_from_hand_pose(hand_fk, ja, wr, hand_idx))
    fk_gt = jax.jit(
        lambda ja, wr: landmarks_from_hand_pose(gt_hand_fk, ja, wr, hand_idx)
    )

    state = tracker.init_state(r)
    if mesh is not None:
        # state leaves lead with R*2 (temporal) / R (validity): both shard
        # cleanly on 'data' since R divides by the axis size
        state = jax.tree.map(_shard0, state)
    frame_iters = [iter(frames) for _, frames in recordings]
    last_frames = [None] * r
    zeros_like_first = None
    v = labels_list[0].num_views

    # Streaming pipeline: each chunk is dispatched asynchronously and its
    # device results (including the FK to landmarks) are NOT pulled to the
    # host until the whole recording set is consumed -- JAX's async dispatch
    # then overlaps the next chunk's host-side frame assembly and
    # host->device transfer with the device computing the previous chunk.
    # Per-chunk result leaves are small (poses, not images), so deferring
    # the readback costs negligible device memory.
    pending = []  # (t_start, n, res, tracked_lm_dev, gt_lm_dev)

    t = 0
    while t < t_total:
        n = min(chunk_size, t_total - t)
        # pull up to n live frames per recording; recordings past their end
        # repeat their last frame with zero confidence (masked out)
        imgs = []  # per-recording (chunk_size, V, H, W)
        live_counts = np.zeros(r, np.int64)
        for ri in range(r):
            rec_frames = []
            for ti in range(n):
                if t + ti < lengths[ri]:
                    try:
                        last_frames[ri] = np.asarray(next(frame_iters[ri]))
                        rec_frames.append(last_frames[ri])
                        continue
                    except StopIteration:
                        lengths[ri] = min(lengths[ri], t + ti)
                break
            live_counts[ri] = len(rec_frames)
            if last_frames[ri] is None:
                if zeros_like_first is None:
                    # only hit when a recording yields zero frames: derive
                    # the frame shape from the rig, not a hardcoded size
                    cam0 = labels_list[ri].cameras
                    zeros_like_first = np.zeros(
                        (
                            v,
                            int(np.asarray(cam0.height).reshape(-1)[0]),
                            int(np.asarray(cam0.width).reshape(-1)[0]),
                        ),
                        np.float32,
                    )
                last_frames[ri] = zeros_like_first
            pad = chunk_size - len(rec_frames)
            rec_frames.extend([last_frames[ri]] * pad)
            imgs.append(np.stack(rec_frames))
        if pipelined:
            images_c = _pad_frames(np.stack(imgs), pad_hw)  # (R, chunk, V, hp, wp)
        else:
            images_c = _pad_frames(
                np.moveaxis(np.stack(imgs), 0, 1), pad_hw
            )  # (chunk, R, ...)

        # label arrays by fancy indexing (no per-frame python loop)
        ts = t + np.arange(chunk_size)  # (chunk,)
        cams_c = np.stack(
            [lab.camera_to_world[np.minimum(ts, len(lab) - 1)] for lab in labels_list],
            axis=1,
        )
        ja_c = np.stack(
            [lab.joint_angles[np.minimum(ts, len(lab) - 1)] for lab in labels_list],
            axis=1,
        )
        wr_c = np.stack(
            [
                lab.wrist_transforms[np.minimum(ts, len(lab) - 1)]
                for lab in labels_list
            ],
            axis=1,
        )
        live = ts[:, None] < (t + live_counts)[None, :]  # (chunk, R)
        conf_c = (
            np.stack(
                [
                    lab.hand_confidences[np.minimum(ts, len(lab) - 1)]
                    for lab in labels_list
                ],
                axis=1,
            )
            * live[..., None]
        )

        ja_dev = _shard1(ja_c)
        wr_dev = _shard1(wr_c)
        # rec-major images shard on their leading (recording) axis
        img_shard = _shard0 if (mesh is not None and pipelined) else _shard1
        state, res = run_chunk(
            state, img_shard(images_c), _shard1(cams_c), ja_dev, wr_dev,
            _shard1(conf_c.astype(np.float32)),
        )
        pending.append(
            (t, n, res, fk(res.joint_angles, res.wrist_xfs), fk_gt(ja_dev, wr_dev))
        )
        t += n

    for t0, n, res, tk_dev, gk_dev in pending:
        sl = slice(t0, t0 + n)
        hv = np.asarray(res.hand_valid)[:n]  # (n, R, 2)
        valid[:, :, sl] = np.moveaxis(hv, 0, 2)
        tracked[:, :, sl] = np.moveaxis(np.asarray(tk_dev)[:n], 0, 2)
        gt[:, :, sl] = np.moveaxis(np.asarray(gk_dev)[:n], 0, 2)
        if res.predicted_scales is not None:
            scales[:, :, sl] = np.moveaxis(np.asarray(res.predicted_scales)[:n], 0, 2)
        raw_angles[:, :, sl] = np.moveaxis(np.asarray(res.joint_angles)[:n], 0, 2)
        raw_wrists[:, :, sl] = np.moveaxis(np.asarray(res.wrist_xfs)[:n], 0, 2)

    results = []
    for ri in range(r):
        li = lengths[ri]
        results.append(
            SequenceResult(
                tracked_keypoints=tracked[ri, :, :li],
                gt_keypoints=gt[ri, :, :li],
                valid_tracking=valid[ri, :, :li],
                predicted_scales=scales[ri, :, :li] if calibrate_scale else None,
                joint_angles=raw_angles[ri, :, :li],
                wrist_xfs=raw_wrists[ri, :, :li],
            )
        )
    return results


def frames_for(
    labels: HandPoseLabels, video_path: Optional[str], renderer: str = "mesh"
):
    """Real decoded frames when the mp4 exists, synthetic frames otherwise.

    ``renderer`` picks the synthetic fallback: ``mesh`` (LBS-skinned
    mesh-silhouette, default -- stereo depth and scale observable) or
    ``blobs`` (landmark gaussians, the pre-round-5 renderer).
    """
    import os

    from ..tracker.video_data import make_frame_source

    if video_path and os.path.exists(video_path):
        return VideoFrameSource(video_path, labels.num_views)
    return make_frame_source(labels, renderer=renderer)
