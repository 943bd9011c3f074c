"""Pallas warp kernels: interpret-mode parity with the XLA path.

(Real-TPU lowering is exercised by benchmarks; CPU CI runs the
interpreter, which checks the kernel semantics.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.ops.pallas_warp import bilinear_sample_mxu
from absolutetrack_tpu.ops.resample import bilinear_sample


class TestOneHotMxuWarp:
    def test_matches_xla_path(self):
        # integer-valued sources: real frames are uint8, which bf16 inside
        # the MXU kernel represents exactly (integers <= 256)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 256, (3, 48, 64)).astype(np.float32))
        idx = jnp.asarray([2, 0, 1], jnp.int32)
        coords = jnp.asarray(
            np.stack(
                [rng.uniform(-3, 67, (3, 1024)), rng.uniform(-3, 51, (3, 1024))], -1
            ).astype(np.float32)
        )
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        # kernel interpolation weights are bf16: worst-case intensity error
        # ~2^-8 * (a+b) <= ~1.0 for uint8 sources -- still ~4x finer than
        # cv2.remap's INTER_LINEAR 5-bit fixed-point weights (error <= 4),
        # which is the reference's own sampler
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_integer_coords_exact(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.integers(0, 256, (1, 16, 16)).astype(np.float32))
        ys, xs = np.mgrid[0:8, 0:8]
        coords = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.float32)
        coords = np.tile(coords, (8, 1))[:512][None]
        out = np.asarray(
            bilinear_sample_mxu(
                imgs, jnp.zeros(1, jnp.int32), jnp.asarray(coords), interpret=True
            )
        )
        want = np.asarray(imgs)[0, coords[0, :, 1].astype(int), coords[0, :, 0].astype(int)]
        np.testing.assert_allclose(out[0], want, atol=1e-4)
