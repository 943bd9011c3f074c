"""Pallas warp kernels: interpret-mode parity with the XLA path.

(Real-TPU lowering is exercised by benchmarks; CPU CI runs the
interpreter, which checks the kernel semantics.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.ops.pallas_warp import _BAND, bilinear_sample_mxu
from absolutetrack_tpu.ops.resample import bilinear_sample


def _smooth_coords(rng, n, p, h, w, row_span=20.0):
    """Warp-like coords: per tile the y values stay in a narrow band
    (like a real crop's source rows), x sweeps the width."""
    base_y = rng.uniform(0, h - row_span - 2, (n, 1))
    y = base_y + np.linspace(0, row_span, p)[None, :] + rng.uniform(0, 1, (n, p))
    x = rng.uniform(-3, w + 2, (n, p))
    return jnp.asarray(np.stack([x, y], -1).astype(np.float32))


class TestOneHotMxuWarp:
    def test_matches_xla_path_banded(self):
        # integer-valued sources: real frames are uint8, which bf16 inside
        # the MXU kernel represents exactly (integers <= 256)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.integers(0, 256, (3, 480, 160)).astype(np.float32))
        idx = jnp.asarray([2, 0, 1], jnp.int32)
        coords = _smooth_coords(rng, 3, 1024, 480, 160)
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        # kernel interpolation weights are bf16: worst-case intensity error
        # ~2^-8 * (a+b) <= ~1.0 for uint8 sources -- still ~4x finer than
        # cv2.remap's INTER_LINEAR 5-bit fixed-point weights (error <= 4),
        # which is the reference's own sampler
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_band_overflow_falls_back(self):
        # y spans the whole image within single tiles -> the banded window
        # can't cover it; the call must divert to the gather path and stay
        # exact (f32, no bf16 quantization -> tight tolerance proves the
        # fallback branch was taken)
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.uniform(0, 256, (2, 480, 160)).astype(np.float32))
        idx = jnp.asarray([0, 1], jnp.int32)
        coords = jnp.asarray(
            np.stack(
                [rng.uniform(0, 158, (2, 512)), rng.uniform(0, 478, (2, 512))], -1
            ).astype(np.float32)
        )
        # sanity: this spread really does exceed the window
        assert float(coords[..., 1].max() - coords[..., 1].min()) > 2 * _BAND
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-4)

    def test_non_multiple_pixel_count_pads(self):
        rng = np.random.default_rng(3)
        imgs = jnp.asarray(rng.integers(0, 256, (1, 96, 128)).astype(np.float32))
        coords = _smooth_coords(rng, 1, 700, 96, 128, row_span=10.0)
        a = np.asarray(
            bilinear_sample_mxu(imgs, jnp.zeros(1, jnp.int32), coords, interpret=True)
        )
        b = np.asarray(bilinear_sample(imgs, jnp.zeros(1, jnp.int32), coords))
        assert a.shape == (1, 700)
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_many_slots(self):
        # slot count far beyond the old VMEM-resident limit (batched
        # multi-recording path): 24 slots over 6 source views
        rng = np.random.default_rng(4)
        imgs = jnp.asarray(rng.integers(0, 256, (6, 240, 160)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 6, 24), jnp.int32)
        coords = _smooth_coords(rng, 24, 512, 240, 160, row_span=30.0)
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_integer_coords_exact(self):
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.integers(0, 256, (1, 96, 96)).astype(np.float32))
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

    def test_full_crop_shape(self):
        # the production shape: 4 slots x 96x96 crop from 480x636 views,
        # coords from a plausible crop footprint
        rng = np.random.default_rng(5)
        imgs = jnp.asarray(rng.integers(0, 256, (4, 480, 636)).astype(np.float32))
        idx = jnp.asarray([0, 1, 2, 3], jnp.int32)
        # each crop row maps to ~2 source rows starting at a random origin
        oy = rng.uniform(0, 240, (4, 1, 1))
        ox = rng.uniform(0, 300, (4, 1, 1))
        gy, gx = np.mgrid[0:96, 0:96]
        y = oy + gy[None] * 2.1 + rng.uniform(0, 1, (4, 96, 96))
        x = ox + gx[None] * 2.3 + rng.uniform(0, 1, (4, 96, 96))
        coords = jnp.asarray(
            np.stack([x.reshape(4, -1), y.reshape(4, -1)], -1).astype(np.float32)
        )
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)
