"""Golden regression pin: fixed-seed forward outputs on CPU.

Guards refactors against silent numerical drift: any change to layer
semantics, init, FTL reshape order, fusion wiring, or decode paths moves
these values. (The values are CPU f32 with HIGHEST matmul precision;
regenerate deliberately if the architecture intentionally changes --
see git history for the generator snippet.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from absolutetrack_tpu.models import (
    FrameInputs,
    ModelConfig,
    UmeTrackModel,
    init_umetrack_params,
)
from absolutetrack_tpu.models.umetrack import SkeletonInputs

GOLDEN_ANGLES_5 = np.asarray(
    [-4.1693425, 7.0941195, 6.0339794, 12.711777, 20.868399], np.float32
)
GOLDEN_WRIST_T = np.asarray([-5.8747725, -6.3091645, -0.81934327], np.float32)
GOLDEN_SIGMA_3 = np.asarray([8.135102, 0.38207453, 20.68721], np.float32)


def test_fixed_seed_forward_is_pinned():
    cfg = ModelConfig(input_size=(32, 32))
    params = init_umetrack_params(jax.random.PRNGKey(42), cfg)
    model = UmeTrackModel(params, cfg)
    rng = np.random.default_rng(42)
    frame = FrameInputs(
        left_images=jnp.asarray(rng.uniform(0, 1, (1, 2, 32, 32)).astype(np.float32)),
        intrinsics=jnp.broadcast_to(
            jnp.eye(3) * jnp.asarray([250.0, 250, 1]), (1, 2, 3, 3)
        ),
        extrinsics=jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        view_mask=jnp.ones((1, 2), bool),
        hand_idx=jnp.zeros(1, jnp.int32),
        use_memory=jnp.zeros(1, bool),
        sample_mask=jnp.ones(1, bool),
    )
    skel = SkeletonInputs(
        jnp.asarray(rng.standard_normal((1, 22, 3)).astype(np.float32)) * 0.1,
        jnp.asarray(rng.standard_normal((1, 22, 3)).astype(np.float32)) * 0.01,
    )
    _, out = model.regress_pose_use_skeleton(model.init_state(1), frame, skel)
    np.testing.assert_allclose(
        np.asarray(out.joint_angles)[0, :5], GOLDEN_ANGLES_5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.wrist_xfs)[0, :3, 3], GOLDEN_WRIST_T, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.landmark_uncertainty_sigmas)[0, :3], GOLDEN_SIGMA_3, rtol=1e-4
    )
