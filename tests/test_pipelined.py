"""Pipelined eval chunk (batched trunk + scanned tail) vs the per-frame path.

The pipelined path restructures the dataflow (convs batch F*2 instead of
2), so these tests pin that it is the same tracker:

  * the network inputs it builds are BIT-identical to the sequential path
    (crop cameras, warped crops, extrinsics);
  * trunk features match to conv reduction-reorder noise (~4e-7 relative
    -- batching a conv changes the summation order, nothing else);
  * the scanned tail (temporal memory semantics, masking, decode) given
    identical features matches a hand-rolled per-frame tail exactly;
  * end-to-end outputs match with a tolerance that covers the random-init
    regressor's ~1e4x amplification of that reduction noise (at trained
    weights the amplification is the network's actual gain, far smaller).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.models import ModelConfig, UmeTrackModel, init_umetrack_params
from absolutetrack_tpu.tracker import HandTracker, TrackerConfig, track_chunk_eval
from absolutetrack_tpu.tracker.video_data import load_labels

LABELS = "/root/reference/sample_data/user05/recording_00.json"
CFG = ModelConfig(input_size=(32, 32))
OPTS = TrackerConfig(crop_size=(32, 32))
F = 5


@pytest.fixture(scope="module")
def setup():
    labels = load_labels(LABELS)
    params = init_umetrack_params(jax.random.PRNGKey(0), CFG)
    # Damp the regression heads: raw random-init outputs are ~+-40, which
    # makes the SVD/Procrustes wrist decode ill-conditioned and amplifies
    # f32 reduction-order noise ~1e4x -- numerically meaningless for an
    # equivalence test. Scaled heads put outputs at trained-like magnitude
    # (wrist points dominated by the fixed template -> stable decode).
    for reg in ("regressor_k", "regressor_u"):
        params[reg]["out"] = jax.tree.map(lambda x: x * 0.02, params[reg]["out"])
    # ... and make the ConvRNN contractive: at raw random init the memory
    # feedback has spectral radius > 1, so reduction noise compounds
    # exponentially over the chunk, which would defeat any fixed tolerance.
    params["temporal"] = jax.tree.map(lambda x: x * 0.1, params["temporal"])
    model = UmeTrackModel(params, CFG)
    rng = np.random.default_rng(0)
    t0 = 100
    images = jnp.asarray(
        rng.uniform(0, 255, (F, labels.num_views, 480, 636)).astype(np.float32)
    )
    cam_seq = jnp.asarray(labels.camera_to_world[t0 : t0 + F])
    ja_seq = jnp.asarray(labels.joint_angles[t0 : t0 + F])
    wr_seq = jnp.asarray(labels.wrist_transforms[t0 : t0 + F])
    conf_seq = jnp.asarray(labels.hand_confidences[t0 : t0 + F])
    return labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq


def _sequential(model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq,
                calibrate=False):
    tracker = HandTracker(model, OPTS)
    angles = jnp.asarray(labels.camera_angles)
    state = tracker.init_state()
    outs = []
    for t in range(F):
        cams = labels.cameras._replace(T_world_from_eye=cam_seq[t])
        fn = (
            tracker.track_frame_and_calibrate_scale
            if calibrate
            else tracker.track_frame
        )
        state, res = jax.jit(fn)(
            state, images[t], cams, angles, labels.hand_model,
            ja_seq[t], wr_seq[t], conf_seq[t],
        )
        outs.append(res)
    return state, outs


def _pipelined(model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq,
               calibrate=False):
    tracker = HandTracker(model, OPTS)
    angles = jnp.asarray(labels.camera_angles)
    state = tracker.init_state()
    return jax.jit(
        lambda s: track_chunk_eval(
            model, OPTS, s, images, labels.cameras, cam_seq, angles,
            labels.hand_model, ja_seq, wr_seq, conf_seq,
            calibrate_scale=calibrate,
        )
    )(state)


def _phase_a(model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq):
    """Replicate track_chunk_eval's phase A: (frame_all, feats, slots)."""
    from absolutetrack_tpu.tracker.batched import BatchedTracker
    from absolutetrack_tpu.tracker.tracker import TrackerState

    v = labels.num_views
    bt = BatchedTracker(model, OPTS)
    cams_f = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (F,) + x.shape), labels.cameras
    )
    cams_f = cams_f._replace(T_world_from_eye=cam_seq)
    angles_f = jnp.broadcast_to(jnp.asarray(labels.camera_angles), (F, v))
    hand_f = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (F,) + x.shape), labels.hand_model
    )
    slots = bt._gen_slots(
        cams_f, angles_f, hand_f, ja_seq, wr_seq, conf_seq, 1, labels.camera_kind
    )
    dummy = TrackerState(
        temporal=model.init_state(F * 2), valid_history=jnp.zeros((F, 2), bool)
    )
    frame_all = bt.make_inputs(dummy, images, cams_f, slots, labels.camera_kind)
    feats = jax.jit(model.extract_features)(frame_all)
    return frame_all, feats, slots


class TestPipelinedEval:
    def test_inputs_bit_identical(self, setup):
        """Phase A builds the exact same crops/extrinsics/intrinsics as the
        per-frame path."""
        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        from absolutetrack_tpu.tracker.crop_gen import gen_crop_slots

        frame_all, _, _ = _phase_a(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq
        )
        tracker = HandTracker(model, OPTS)
        angles = jnp.asarray(labels.camera_angles)
        for t in range(F):
            cams = labels.cameras._replace(T_world_from_eye=cam_seq[t])
            slots = gen_crop_slots(
                cams, angles, labels.hand_model, ja_seq[t], wr_seq[t], conf_seq[t],
                OPTS.crop_size, focal_multiplier=OPTS.hand_ratio_in_crop,
            )
            fr = tracker.make_inputs(tracker.init_state(), images[t], cams, slots)
            sl = slice(t * 2, (t + 1) * 2)
            np.testing.assert_array_equal(
                np.asarray(fr.left_images), np.asarray(frame_all.left_images[sl])
            )
            np.testing.assert_array_equal(
                np.asarray(fr.extrinsics), np.asarray(frame_all.extrinsics[sl])
            )
            np.testing.assert_array_equal(
                np.asarray(fr.intrinsics), np.asarray(frame_all.intrinsics[sl])
            )
            np.testing.assert_array_equal(
                np.asarray(fr.sample_mask), np.asarray(frame_all.sample_mask[sl])
            )

    def test_trunk_features_match_to_reduction_noise(self, setup):
        """Batch-F*2 trunk == batch-2 trunk up to conv summation reorder."""
        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        frame_all, feats, _ = _phase_a(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq
        )
        for t in range(F):
            sl = slice(t * 2, (t + 1) * 2)
            fr = jax.tree.map(lambda x: x[sl], frame_all)
            f2 = jax.jit(model.extract_features)(fr)
            np.testing.assert_allclose(
                np.asarray(f2), np.asarray(feats[sl]), rtol=1e-4, atol=1e-4
            )

    def test_causality_and_revival_exact(self, setup):
        """Exact semantic invariants within ONE compiled pipelined chunk.

        Zeroing hand 1's confidence at frame 2 must (a) leave frames 0-1
        bitwise unchanged (causality: the scan cannot look ahead), and
        (b) make frames >= 3 for hand 1 bitwise EQUAL to a run where hand 1
        was invalid for frames 0-2 as well -- the revival zeroes the memory
        input (reference temporal.py:59-63), so no frozen pre-loss memory
        may leak into the post-loss trajectory. Same compiled function,
        different inputs => no numeric-noise excuses."""
        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        conf_x = np.asarray(conf_seq).copy()
        conf_x[2, 1] = 0.0
        conf_y = conf_x.copy()
        conf_y[0, 1] = conf_y[1, 1] = 0.0

        base_state, base = _pipelined(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq
        )
        _, rx = _pipelined(
            model, labels, images, cam_seq, ja_seq, wr_seq, jnp.asarray(conf_x)
        )
        _, ry = _pipelined(
            model, labels, images, cam_seq, ja_seq, wr_seq, jnp.asarray(conf_y)
        )
        hv = np.asarray(rx.hand_valid)
        assert not hv[2, 1] and hv[3, 1] and hv[1, 1]

        # (a) causality: frames before the loss are bitwise untouched
        np.testing.assert_array_equal(
            np.asarray(base.joint_angles[:2]), np.asarray(rx.joint_angles[:2])
        )
        np.testing.assert_array_equal(
            np.asarray(base.wrist_xfs[:2]), np.asarray(rx.wrist_xfs[:2])
        )

        # (b) revival: post-loss hand-1 trajectory is independent of the
        # frozen pre-loss memory content
        np.testing.assert_array_equal(
            np.asarray(rx.joint_angles[3:, 1]), np.asarray(ry.joint_angles[3:, 1])
        )
        np.testing.assert_array_equal(
            np.asarray(rx.wrist_xfs[3:, 1]), np.asarray(ry.wrist_xfs[3:, 1])
        )
        # hand 0 is untouched in both variants
        np.testing.assert_array_equal(
            np.asarray(rx.joint_angles[:, 0]), np.asarray(ry.joint_angles[:, 0])
        )

    def test_end_to_end_matches_sequential(self, setup):
        """Full-path agreement with the frame-by-frame tracker. Validity is
        exact; values are compared to tolerances covering conv
        reduction-order noise through the (damped, well-conditioned)
        heads."""
        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        st_a, outs = _sequential(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq
        )
        st_b, res = _pipelined(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq
        )
        for t in range(F):
            np.testing.assert_array_equal(
                np.asarray(outs[t].hand_valid), np.asarray(res.hand_valid[t])
            )
            np.testing.assert_array_equal(
                np.asarray(outs[t].num_views), np.asarray(res.num_views[t])
            )
            np.testing.assert_allclose(
                np.asarray(outs[t].joint_angles),
                np.asarray(res.joint_angles[t]),
                rtol=1e-3, atol=1e-3,
            )
            np.testing.assert_allclose(
                np.asarray(outs[t].wrist_xfs),
                np.asarray(res.wrist_xfs[t]),
                rtol=1e-3, atol=0.5,  # translations in mm
            )
        np.testing.assert_allclose(
            np.asarray(st_a.temporal.mem_features),
            np.asarray(st_b.temporal.mem_features),
            rtol=1e-3, atol=1e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(st_a.valid_history), np.asarray(st_b.valid_history)
        )

    def test_batched_recordings_match_single(self, setup):
        """track_chunk_eval_batched (R recordings, trunk batched over F*R)
        equals per-recording track_chunk_eval runs."""
        from absolutetrack_tpu.tracker.batched import BatchedTracker
        from absolutetrack_tpu.tracker.pipelined import track_chunk_eval_batched

        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        rng = np.random.default_rng(3)
        r = 2
        offs = [100, 220]
        v = labels.num_views
        images_b = jnp.asarray(
            rng.uniform(0, 255, (F, r, v, 480, 636)).astype(np.float32)
        )
        cam_b = jnp.stack(
            [jnp.asarray(labels.camera_to_world[o : o + F]) for o in offs], axis=1
        )
        ja_b = jnp.stack(
            [jnp.asarray(labels.joint_angles[o : o + F]) for o in offs], axis=1
        )
        wr_b = jnp.stack(
            [jnp.asarray(labels.wrist_transforms[o : o + F]) for o in offs], axis=1
        )
        conf_b = jnp.stack(
            [jnp.asarray(labels.hand_confidences[o : o + F]) for o in offs], axis=1
        )
        cams_r = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (r,) + x.shape), labels.cameras
        )
        angles_r = jnp.broadcast_to(
            jnp.asarray(labels.camera_angles), (r, v)
        )
        hand_r = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (r,) + x.shape), labels.hand_model
        )
        bt = BatchedTracker(model, OPTS)
        st_b, res_b = jax.jit(
            lambda s: track_chunk_eval_batched(
                model, OPTS, s, images_b, cams_r, cam_b, angles_r, hand_r,
                ja_b, wr_b, conf_b,
            )
        )(bt.init_state(r))

        tracker = HandTracker(model, OPTS)
        angles = jnp.asarray(labels.camera_angles)
        for ri in range(r):
            from absolutetrack_tpu.tracker import track_chunk_eval

            st_s, res_s = jax.jit(
                lambda s, ri=ri: track_chunk_eval(
                    model, OPTS, s, images_b[:, ri], labels.cameras,
                    cam_b[:, ri], angles, labels.hand_model,
                    ja_b[:, ri], wr_b[:, ri], conf_b[:, ri],
                )
            )(tracker.init_state())
            np.testing.assert_array_equal(
                np.asarray(res_s.hand_valid), np.asarray(res_b.hand_valid[:, ri])
            )
            np.testing.assert_allclose(
                np.asarray(res_s.joint_angles),
                np.asarray(res_b.joint_angles[:, ri]),
                rtol=1e-3, atol=1e-3,
            )
            np.testing.assert_allclose(
                np.asarray(res_s.wrist_xfs),
                np.asarray(res_b.wrist_xfs[:, ri]),
                rtol=1e-3, atol=0.5,
            )
            np.testing.assert_array_equal(
                np.asarray(st_s.valid_history), np.asarray(st_b.valid_history[ri])
            )

    def test_chunk_size_invariance(self, setup):
        """Splitting a recording into different chunk sizes must not change
        the tracked results (memory carries across dispatch boundaries)."""
        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        tracker = HandTracker(model, OPTS)
        angles = jnp.asarray(labels.camera_angles)

        def run(split):
            state = tracker.init_state()
            outs = []
            t = 0
            for n in split:
                sl = slice(t, t + n)
                state, res = jax.jit(
                    lambda s, im, cw, ja, wr, cf: track_chunk_eval(
                        model, OPTS, s, im, labels.cameras, cw, angles,
                        labels.hand_model, ja, wr, cf,
                    )
                )(state, images[sl], cam_seq[sl], ja_seq[sl], wr_seq[sl],
                  conf_seq[sl])
                outs.append(np.asarray(res.joint_angles))
                t += n
            return np.concatenate(outs)

        a = run([F])
        b = run([2, 2, 1])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_serving_preset_drift_bounded_batched(self, setup):
        """The bf16 serving preset must stay within its relative drift
        budget on the BATCHED PIPELINED path too (the path bench.py's
        serving headline actually runs), not just the bare trunk
        (tests/test_models.py::TestServingPrecision). Same damped params,
        same inputs, two compute dtypes."""
        from absolutetrack_tpu.tracker.batched import BatchedTracker
        from absolutetrack_tpu.tracker.pipelined import track_chunk_eval_batched

        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        rng = np.random.default_rng(7)
        r = 2
        offs = [100, 220]
        v = labels.num_views
        images_b = jnp.asarray(
            rng.uniform(0, 255, (F, r, v, 480, 636)).astype(np.float32)
        )
        stk = lambda a: jnp.stack(
            [jnp.asarray(a[o : o + F]) for o in offs], axis=1
        )
        cam_b = stk(labels.camera_to_world)
        ja_b = stk(labels.joint_angles)
        wr_b = stk(labels.wrist_transforms)
        conf_b = stk(labels.hand_confidences)
        cams_r = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (r,) + x.shape), labels.cameras
        )
        angles_r = jnp.broadcast_to(jnp.asarray(labels.camera_angles), (r, v))
        hand_r = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (r,) + x.shape), labels.hand_model
        )

        def run(cfg):
            m = UmeTrackModel(model.params, cfg)
            bt = BatchedTracker(m, OPTS)
            return jax.jit(
                lambda s: track_chunk_eval_batched(
                    m, OPTS, s, images_b, cams_r, cam_b, angles_r, hand_r,
                    ja_b, wr_b, conf_b,
                )
            )(bt.init_state(r))

        st32, res32 = run(ModelConfig(input_size=(32, 32)))
        st16, res16 = run(ModelConfig.serving(input_size=(32, 32)))

        np.testing.assert_array_equal(
            np.asarray(res32.hand_valid), np.asarray(res16.hand_valid)
        )
        assert res16.wrist_xfs.dtype == jnp.float32
        assert st16.temporal.mem_features.dtype == st32.temporal.mem_features.dtype
        t32 = np.asarray(res32.wrist_xfs[..., :3, 3])
        t16 = np.asarray(res16.wrist_xfs[..., :3, 3])
        scale_t = np.abs(t32).max()
        # same 1% relative budget as the trunk test: at real-weight scale
        # (~0.3 m wrists) this is 3 mm
        assert np.abs(t32 - t16).max() < 0.01 * scale_t, (
            np.abs(t32 - t16).max(), scale_t
        )
        a32 = np.asarray(res32.joint_angles)
        a16 = np.asarray(res16.joint_angles)
        assert np.abs(a32 - a16).max() < 0.02 * max(np.abs(a32).max(), 1.0)

    def test_calibrate_scale_branch(self, setup):
        labels, model, images, cam_seq, ja_seq, wr_seq, conf_seq = setup
        st_a, outs = _sequential(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq, calibrate=True
        )
        st_b, res = _pipelined(
            model, labels, images, cam_seq, ja_seq, wr_seq, conf_seq, calibrate=True
        )
        for t in range(F):
            np.testing.assert_array_equal(
                np.asarray(outs[t].hand_valid), np.asarray(res.hand_valid[t])
            )
            np.testing.assert_allclose(
                np.asarray(outs[t].predicted_scales),
                np.asarray(res.predicted_scales[t]),
                rtol=1e-3, atol=1e-4,
            )
        np.testing.assert_array_equal(
            np.asarray(st_a.valid_history), np.asarray(st_b.valid_history)
        )
