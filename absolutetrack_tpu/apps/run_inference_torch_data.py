"""Batched inference on packed torch_data (reference run_inference_torch_data.py).

Pipeline: discover packed folders -> shard across (rank, world_size) ->
prefetch + preprocess (batched crop/warp on device) -> scan the
known-skeleton branch over each window with batch-lockstep memory
(use_memory=False only at t=0, reference run_inference_torch_data.py:50-53)
-> FK -> mm landmark error.

The per-window compute is one jitted scan; batches of windows stack along
the leading axis and can shard over a mesh data axis.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from . import eval_lib
from ..data import PackedDataset, PrefetchIterator, ShardSampler, find_dataset_folders
from ..data.transform import preprocess_packed
from ..models import FrameInputs, ModelConfig
from ..models.umetrack import SkeletonInputs
from ..kinematics.skinning import skin_landmarks

M_TO_MM = 1000.0


def eval_window(model, seq, use_memory_t0: bool = False, n_views: int | None = None):
    """Scan one preprocessed window -> (T,) per-frame landmark error in mm.

    ``n_views`` < the stored view count runs the single-view path
    (remaining view slots masked out), covering the reference's
    single-view torch_data configuration."""
    t, v = seq.left_images.shape[:2]
    state = model.init_state(1)
    skel = SkeletonInputs(
        joint_rotation_axes=seq.gt_hand_model.joint_rotation_axes[None],
        joint_rest_positions=seq.gt_hand_model.joint_rest_positions[None],
    )
    use_mem = jnp.arange(t) > (0 if not use_memory_t0 else -1)
    view_mask = (
        jnp.arange(v) < (v if n_views is None else n_views)
    )[None, :]

    def step(state, xs):
        img, intr, extr, um = xs
        frame = FrameInputs(
            left_images=jnp.where(view_mask[..., None, None], img[None], 0.0),
            intrinsics=intr[None],
            extrinsics=extr[None],
            view_mask=view_mask,
            hand_idx=seq.hand_idx[None],
            use_memory=um[None],
            sample_mask=jnp.ones(1, bool),
        )
        state, out = model.regress_pose_use_skeleton(state, frame, skel)
        return state, out

    _, outs = jax.lax.scan(
        step, state, (seq.left_images, seq.intrinsics, seq.extrinsics, use_mem)
    )
    # model wrist is world-space with right-hand mirror; labels are
    # left-canonical, so undo the mirror before FK comparison
    sign = jnp.where(seq.hand_idx == 1, -1.0, 1.0)
    wrist_left = outs.wrist_xfs[:, 0].at[..., :, 0].multiply(sign)
    hand_t = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (t,) + x.shape), seq.gt_hand_model
    )
    pred_lm = skin_landmarks(hand_t, outs.joint_angles[:, 0], wrist_left)
    gt_lm = skin_landmarks(hand_t, seq.gt_joint_angles, seq.gt_wrist)
    return jnp.linalg.norm(pred_lm - gt_lm, axis=-1).mean(-1) * M_TO_MM


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="tmp/torch_data")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--precision", choices=["parity", "serving"], default="parity",
        help="serving = bf16 conv trunk, f32 geometry/solvers "
        "(ModelConfig.serving(); landmark drift pinned by tests)",
    )
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world-size", type=int, default=1)
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--views", type=int, default=None,
                    help="restrict to the first N views (1 = single-view path)")
    args = ap.parse_args(argv)

    folders = find_dataset_folders(args.data_root, ["mono", "labels"])
    if not folders:
        raise SystemExit(
            f"no packed folders under {args.data_root}; run "
            "`python -m absolutetrack_tpu.apps.pack_sample_data` first"
        )
    ds = PackedDataset(folders, ["mono", "labels"])
    sampler = ShardSampler(len(ds), args.rank, args.world_size)
    print(f"[rank {args.rank}] {len(sampler)} windows from {len(folders)} folders")

    from ..models import ModelConfig

    mcfg = ModelConfig.serving() if args.precision == "serving" else ModelConfig()
    model = eval_lib.build_model(args.checkpoint, cfg=mcfg)
    run = jax.jit(lambda seq: eval_window(model, seq, n_views=args.views))

    def load(i):
        s = ds[i]
        mono = np.asarray(s["mono"])
        return preprocess_packed(mono, s["labels"])

    indices = list(sampler)[: args.limit]
    errors = []
    for seq in PrefetchIterator(map(load, indices), max_prefetch=args.prefetch):
        err = np.asarray(run(seq))
        errors.append(err)
        print(f"window error: {err.mean():.2f} mm")
    if errors:
        print(f"Mean landmark error: {np.concatenate(errors).mean():.3f} mm "
              f"over {len(errors)} windows")


if __name__ == "__main__":
    main()
