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


def eval_windows_batched(model, seqs, use_memory_t0: bool = False,
                         n_views: int | None = None):
    """Scan W stacked windows in lockstep -> (W, T) per-frame errors in mm.

    ``seqs`` is a PackedSequence pytree stacked on a leading window axis
    (fields (W, T, ...)). Matches the reference's bs=160 batch-lockstep
    unroll (run_inference_torch_data.py:164-185): per-window compute is
    independent, so one dispatch fills the chip with W windows instead of
    leaving it idle at B=1. Per-window math is identical to
    ``eval_window`` (pinned bitwise by tests/test_integration.py).
    """
    imgs = seqs.left_images  # (W, T, V, h, w)
    b, t, v = imgs.shape[:3]
    state = model.init_state(b)
    skel = SkeletonInputs(
        joint_rotation_axes=seqs.gt_hand_model.joint_rotation_axes,
        joint_rest_positions=seqs.gt_hand_model.joint_rest_positions,
    )
    use_mem = jnp.arange(t) > (0 if not use_memory_t0 else -1)  # (T,)
    view_mask = jnp.arange(v) < (v if n_views is None else n_views)  # (V,)
    vm_b = jnp.broadcast_to(view_mask, (b, v))

    def step(state, xs):
        img, intr, extr, um = xs  # (W, V, ...), um scalar
        frame = FrameInputs(
            left_images=jnp.where(view_mask[None, :, None, None], img, 0.0),
            intrinsics=intr,
            extrinsics=extr,
            view_mask=vm_b,
            hand_idx=seqs.hand_idx,
            use_memory=jnp.broadcast_to(um, (b,)),
            sample_mask=jnp.ones(b, bool),
        )
        state, out = model.regress_pose_use_skeleton(state, frame, skel)
        return state, out

    xs = (
        jnp.moveaxis(seqs.left_images, 0, 1),  # (T, W, V, h, w)
        jnp.moveaxis(seqs.intrinsics, 0, 1),
        jnp.moveaxis(seqs.extrinsics, 0, 1),
        use_mem,
    )
    _, outs = jax.lax.scan(step, state, xs)
    sign = jnp.where(seqs.hand_idx == 1, -1.0, 1.0)  # (W,)
    wrist_left = outs.wrist_xfs.at[..., :, 0].multiply(sign[None, :, None])
    hand_tb = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (t,) + x.shape), seqs.gt_hand_model
    )
    pred_lm = skin_landmarks(hand_tb, outs.joint_angles, wrist_left)
    gt_lm = skin_landmarks(
        hand_tb,
        jnp.moveaxis(seqs.gt_joint_angles, 0, 1),
        jnp.moveaxis(seqs.gt_wrist, 0, 1),
    )
    err = jnp.linalg.norm(pred_lm - gt_lm, axis=-1).mean(-1)  # (T, W)
    return err.T * M_TO_MM


def stack_windows(seqs):
    """List of uniform-T PackedSequences -> one pytree with leading W axis."""
    t0 = seqs[0].left_images.shape[0]
    assert all(s.left_images.shape[0] == t0 for s in seqs), (
        "batched window eval needs uniform window length"
    )
    return jax.tree.map(lambda *xs: jnp.stack(xs), *seqs)


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
    ap.add_argument("--batch-windows", type=int, default=1,
                    help="evaluate W windows per dispatch in lockstep "
                    "(reference runs bs=160; W>=16 fills the chip)")
    ap.add_argument("--mesh-data", type=int, default=None,
                    help="shard the window batch over a 'data' mesh of this "
                    "many devices (requires --batch-windows divisible by it)")
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
    if args.batch_windows > 1:
        import time

        w = args.batch_windows
        run_b = jax.jit(
            lambda seqs: eval_windows_batched(model, seqs, n_views=args.views)
        )
        put = None
        if args.mesh_data:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import make_mesh

            assert w % args.mesh_data == 0, "--batch-windows % --mesh-data != 0"
            mesh = make_mesh(data=args.mesh_data, model=1)
            sh = NamedSharding(mesh, P("data"))
            put = lambda seqs: jax.tree.map(lambda x: jax.device_put(x, sh), seqs)

        def load_group(g):
            seqs = [load(i) for i in g]
            pad = w - len(seqs)
            stacked = stack_windows(seqs + [seqs[-1]] * pad)
            return stacked, len(seqs)

        groups = [indices[i : i + w] for i in range(0, len(indices), w)]
        t0, n_frames = time.time(), 0
        for stacked, n_real in PrefetchIterator(
            map(load_group, groups), max_prefetch=args.prefetch
        ):
            if put is not None:
                stacked = put(stacked)
            err = np.asarray(run_b(stacked))[:n_real]  # (n_real, T)
            errors.extend(err)
            n_frames += err.size
            print(f"group of {n_real}: {err.mean():.2f} mm")
        dt = time.time() - t0
        print(f"throughput: {len(errors) / dt:.1f} windows/s "
              f"({n_frames / dt:.0f} frames/s) at W={w}")
    else:
        for seq in PrefetchIterator(map(load, indices), max_prefetch=args.prefetch):
            err = np.asarray(run(seq))
            errors.append(err)
            print(f"window error: {err.mean():.2f} mm")
    if errors:
        print(f"Mean landmark error: {np.concatenate(errors).mean():.3f} mm "
              f"over {len(errors)} windows")


if __name__ == "__main__":
    main()
