"""Training entry point: fine-tune/train UmeTrack on packed sequences.

A capability the reference lacks entirely (it only loads a frozen
checkpoint). Drives packed torch_data windows through the sharded train
step: batch windows -> ('data', 'model') mesh -> scan-unrolled sequence
loss (FK landmark NLL + pose terms) -> adamw.

Usage:
  python -m absolutetrack_tpu.apps.train --data-root tmp/torch_data \
      --steps 100 --batch 8 [--checkpoint init.msgpack] [--save out.msgpack]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import PackedDataset, PrefetchIterator, ShardSampler, find_dataset_folders
from ..data.transform import preprocess_packed
from ..kinematics.hand_model import HandModel
from ..models import ModelConfig, init_umetrack_params
from ..models.checkpoint import load_any, save_params, save_train_state
from ..parallel import make_mesh
from ..training import make_train_step
from ..training.train import (
    SequenceBatch,
    TrainState,
    batch_shardings,
    make_optimizer,
)


def windows_to_batch(seqs) -> tuple[SequenceBatch, HandModel]:
    """Stack preprocessed PackedSequences into a time-major SequenceBatch."""
    t = seqs[0].left_images.shape[0]
    b = len(seqs)

    def stack(field):
        return jnp.stack([getattr(s, field) for s in seqs], axis=1)  # (T, B, ...)

    use_mem = np.ones((t, b), bool)
    use_mem[0] = False
    hand = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[s.gt_hand_model for s in seqs]
    )
    batch = SequenceBatch(
        images=stack("left_images"),
        intrinsics=stack("intrinsics"),
        extrinsics=stack("extrinsics"),
        use_memory=jnp.asarray(use_mem),
        sample_mask=jnp.ones((t, b), bool),
        hand_idx=jnp.stack([s.hand_idx for s in seqs]),
        skel_axes=hand.joint_rotation_axes,
        skel_rest=hand.joint_rest_positions,
        gt_joint_angles=stack("gt_joint_angles"),
        gt_wrist=stack("gt_wrist"),
        gt_log_scale=jnp.zeros(b),
    )
    return batch, hand


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="tmp/torch_data")
    ap.add_argument(
        "--synthetic",
        action="store_true",
        help="train on the synthetic-blob vision task (no packed data "
        "needed); prints held-out tracked MPJPE before/after",
    )
    ap.add_argument(
        "--rendered",
        action="store_true",
        help="dress-rehearsal recipe: train on windows built by the REAL "
        "crop/warp pipeline over synthetic-renderer frames posed by the "
        "sample_data labels (training/rendered.py); recording_11 held out",
    )
    ap.add_argument(
        "--rendered-stride", type=int, default=4,
        help="window start stride for --rendered (4 -> ~90 windows/recording)",
    )
    ap.add_argument(
        "--augment", type=int, default=0,
        help="extra augmented replicas per recording for --rendered "
        "(scale 0.8-1.2 + pose perturbation; training/rendered.py)",
    )
    ap.add_argument(
        "--crop-jitter", action="store_true",
        help="build augmented replicas' crops from jittered poses "
        "(simulates serving's imperfect tracked-pose crops)",
    )
    ap.add_argument(
        "--augment-trans-mm", type=float, default=25.0,
        help="wrist translation perturbation scale for --augment replicas "
        "(larger = more stereo-depth diversity)",
    )
    ap.add_argument(
        "--augment-rot-deg", type=float, default=10.0,
        help="wrist rotation perturbation scale for --augment replicas",
    )
    ap.add_argument(
        "--augment-head-rot-deg", type=float, default=0.0,
        help="rig-trajectory rotation perturbation (novel viewing "
        "trajectories; the strongest lever against extrinsics overfit)",
    )
    ap.add_argument(
        "--augment-head-trans-mm", type=float, default=0.0,
        help="rig-trajectory translation perturbation",
    )
    ap.add_argument(
        "--renderer", choices=["mesh", "blobs"], default="mesh",
        help="--rendered frame renderer: 'mesh' = LBS-skinned 788-vert "
        "mesh silhouettes (stereo depth + scale observable), 'blobs' = "
        "pre-round-5 landmark gaussians",
    )
    ap.add_argument("--window", type=int, default=2, help="synthetic window T")
    ap.add_argument("--input-size", type=int, default=32,
                    help="synthetic crop size (32 = tiny recipe, 96 = full)")
    ap.add_argument(
        "--tiny-arch", action="store_true",
        help="ModelConfig.tiny(): reduced-width topology matching the eval "
        "apps' --tiny-arch (the trained-protocol-chain regression recipe)",
    )
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument(
        "--branch", choices=["known", "unknown", "both"], default="known",
        help="'both' trains regressor_k AND regressor_u in one step (the "
        "eval protocol chain needs both)",
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--save", default="tmp/checkpoints/latest.msgpack")
    ap.add_argument("--save-every", type=int, default=50)
    ap.add_argument("--resume", default=None,
                    help="train-state checkpoint to resume from")
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    if args.synthetic or args.rendered:
        if args.tiny_arch:
            cfg = ModelConfig.tiny(
                input_size=(args.input_size, args.input_size)
            )
        else:
            cfg = ModelConfig(input_size=(args.input_size, args.input_size))
        ds = None
    else:
        folders = find_dataset_folders(args.data_root, ["mono", "labels"])
        if not folders:
            raise SystemExit(f"no packed data under {args.data_root}")
        ds = PackedDataset(folders, ["mono", "labels"])
        print(f"{len(ds)} windows from {len(folders)} folders")
        cfg = ModelConfig()
    if args.checkpoint:
        params = load_any(args.checkpoint, cfg)
    else:
        params = init_umetrack_params(jax.random.PRNGKey(args.seed), cfg)

    n_dev = len(jax.devices())
    model_ax = args.model_axis if n_dev % args.model_axis == 0 else 1
    mesh = make_mesh(data=n_dev // model_ax, model=model_ax)
    opt = make_optimizer(args.lr)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    if args.resume:
        from ..models.checkpoint import load_train_state

        state = load_train_state(args.resume, state)
        print(f"resumed from {args.resume} at step {int(state.step)}")

    if args.rendered:
        from ..training import make_eval_step
        from ..training.rendered import rendered_dataset, slice_windows

        root = "/root/reference/sample_data/user05"
        base_tag = (
            f"tmp/rendered_ds_{args.input_size}_T{args.window}"
            f"_s{args.rendered_stride}"
            + ("" if args.renderer == "mesh" else f"_{args.renderer}")
        )
        tag = base_tag
        aug_kwargs = {}
        if args.augment:
            tag += f"_a{args.augment}" + ("j" if args.crop_jitter else "")
            if args.augment_trans_mm != 25.0:
                aug_kwargs["wrist_trans_mm"] = args.augment_trans_mm
                tag += f"_t{args.augment_trans_mm:g}"
            if args.augment_rot_deg != 10.0:
                aug_kwargs["wrist_rot_deg"] = args.augment_rot_deg
                tag += f"_r{args.augment_rot_deg:g}"
            if args.augment_head_rot_deg or args.augment_head_trans_mm:
                aug_kwargs["head_rot_deg"] = args.augment_head_rot_deg
                aug_kwargs["head_trans_mm"] = args.augment_head_trans_mm
                tag += "_h"
        train_b, train_h = rendered_dataset(
            [f"{root}/recording_00.json", f"{root}/recording_02.json"],
            window_t=args.window, stride=args.rendered_stride, cfg=cfg,
            cache_path=f"{tag}_train.npz",
            augment=args.augment, crop_jitter=args.crop_jitter,
            seed=args.seed, augment_kwargs=aug_kwargs,
            renderer=args.renderer,
        )
        held_b, held_h = rendered_dataset(
            [f"{root}/recording_11.json"],
            window_t=args.window, stride=args.rendered_stride, cfg=cfg,
            max_windows_per_recording=64, cache_path=f"{base_tag}_held.npz",
            renderer=args.renderer,
        )
        n_train = train_b.hand_idx.shape[0]
        print(f"rendered windows: train {n_train} samples, "
              f"held-out {held_b.hand_idx.shape[0]} samples (recording_11)")

        def batches():
            rng = np.random.default_rng(args.seed)
            while True:
                idx = np.sort(
                    rng.choice(n_train, size=min(args.batch, n_train), replace=False)
                )
                yield slice_windows(train_b, train_h, idx)
    elif args.synthetic:
        from ..training import make_eval_step
        from ..training.synthetic import learnable_windows

        def batches():
            i = args.seed
            while True:
                yield learnable_windows(args.batch, t=args.window, cfg=cfg, seed=i)
                i += 1
    else:
        def batches():
            rng = np.random.default_rng(args.seed)
            while True:
                idx = rng.integers(0, len(ds), args.batch)
                seqs = [
                    preprocess_packed(
                        np.asarray(ds[int(i)]["mono"]), ds[int(i)]["labels"]
                    )
                    for i in idx
                ]
                yield windows_to_batch(seqs)

    has_eval = args.synthetic or args.rendered
    with mesh:
        sh = batch_shardings(mesh)
        step = make_train_step(mesh, cfg, opt, branch=args.branch)
        if has_eval:
            ev_branch = "unknown" if args.branch == "unknown" else "known"
            ev = make_eval_step(mesh, cfg, branch=ev_branch)
            if args.rendered:
                from ..training.rendered import materialize

                held_batch, held_hand = (
                    jax.tree.map(jnp.asarray, materialize(held_b)),
                    jax.tree.map(jnp.asarray, held_h),
                )
            else:
                held_batch, held_hand = learnable_windows(
                    max(args.batch, 16), t=args.window, cfg=cfg, seed=999_999
                )

            def heldout_mpjpe_mm(params):
                out = ev(params, held_batch, held_hand)
                return float(out["err_sum_m"]) / float(out["err_count"]) * 1e3

            e0 = heldout_mpjpe_mm(state.params)
            print(f"held-out tracked MPJPE at init: {e0:.1f} mm")
            best_heldout = e0
            # .best is the canonical artifact: seed it from this stage's
            # init, or -- when a previous stage left one -- score that
            # file's params so a resumed stage never overwrites a better
            # earlier .best nor leaves a stale one (round-4 advisor)
            if args.save:
                best_path = args.save + ".best"
                if os.path.exists(best_path):
                    try:
                        e_prev = heldout_mpjpe_mm(load_any(best_path, cfg))
                        print(f"existing .best scores {e_prev:.1f} mm")
                        if e_prev < best_heldout:
                            best_heldout = e_prev
                        else:
                            save_params(best_path, state.params)
                    except Exception as exc:  # arch changed between stages
                        print(f".best unreadable ({exc}); reseeding")
                        save_params(best_path, state.params)
                else:
                    save_params(best_path, state.params)
        it = PrefetchIterator(batches(), max_prefetch=2)
        t0 = time.time()
        for i in range(args.steps):
            batch, hand = next(it)
            batch_dev = jax.tree.map(
                lambda x, s: jax.device_put(np.asarray(x), s), batch, sh,
                is_leaf=lambda x: x is None,
            )
            state, metrics = step(state, batch_dev, hand)
            if i % 10 == 0 or i == args.steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                extra = ""
                if has_eval and (
                    i % args.eval_every == 0 or i == args.steps - 1
                ):
                    e_now = heldout_mpjpe_mm(state.params)
                    extra = f" heldout={e_now:.1f}mm"
                    # keep the best-generalizing params alongside the
                    # latest (the last step is not necessarily the best)
                    if args.save and e_now < best_heldout:
                        best_heldout = e_now
                        save_params(args.save + ".best", state.params)
                        extra += " (best)"
                print(f"step {i}: loss={m['total']:.4f} "
                      f"lm={m['landmark_l2_m'] * 1e3:.1f}mm{extra} ({dt:.1f}s)")
            if args.save and (i + 1) % args.save_every == 0:
                save_params(args.save, state.params)
                save_train_state(args.save + ".train", state)
        it.close()
        if has_eval:
            e1 = heldout_mpjpe_mm(state.params)
            print(
                f"held-out tracked MPJPE: {e0:.1f} mm (init) -> {e1:.1f} mm "
                f"({e0 / max(e1, 1e-9):.1f}x better)"
            )
    if args.save:
        save_params(args.save, state.params)
        save_train_state(args.save + ".train", state)
        print(f"saved {args.save} (+.train resume state)")


if __name__ == "__main__":
    main()
