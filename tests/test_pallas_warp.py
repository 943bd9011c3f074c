"""Pallas warp kernels: interpret-mode parity with the XLA path.

(Real-TPU lowering is exercised by benchmarks; CPU CI runs the
interpreter, which checks the kernel semantics.)"""

import jax.numpy as jnp
import numpy as np
import pytest

from absolutetrack_tpu.ops.pallas_warp import (
    _BAND,
    _plan_blocked,
    _plan_lines,
    bilinear_sample_mxu,
)
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

    def test_band_overflow_runs_covering_kernel(self):
        # x AND y span the whole image within single tiles -> neither
        # orientation's banded window can cover it; the call diverts to the
        # covering kernel (all row windows accumulated) and must still
        # match the gather path
        rng = np.random.default_rng(2)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([0, 1], jnp.int32)
        coords = jnp.asarray(
            np.stack(
                [rng.uniform(0, 634, (2, 512)), rng.uniform(0, 478, (2, 512))], -1
            ).astype(np.float32)
        )
        # sanity: this spread really does exceed the window in both axes
        assert float(coords[..., 1].max() - coords[..., 1].min()) > 2 * _BAND
        assert float(coords[..., 0].max() - coords[..., 0].min()) > 2 * _BAND
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_rotated_mapping_routes_by_order(self):
        # a ~90-degree-rotated mapping (the rig's rolled cameras): source y
        # is driven by the crop COLUMN, so row-major tiles sweep the full
        # image height. With crop_hw given, per-slot routing enumerates the
        # crop column-major (narrow per-tile row bands, like the real
        # rig's measured spans) and must still match the gather path.
        rng = np.random.default_rng(6)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([1, 0], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        oy = rng.uniform(0, 80, (2, 1, 1))
        ox = rng.uniform(0, 380, (2, 1, 1))
        y = oy + gx[None] * 4.0 + rng.uniform(0, 1, (2, 96, 96))
        x = ox + gy[None] * 2.0 + rng.uniform(0, 1, (2, 96, 96))
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_uint8_source_stays_uint8(self):
        # decoded video frames are uint8; the kernel keeps them uint8
        # through HBM (half the window DMA) and converts in VMEM via
        # u8 -> i32 -> bf16 (the only Mosaic-supported exact chain).
        # Narrow + covering paths must both match the gather oracle.
        rng = np.random.default_rng(21)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636), dtype=np.uint8))
        idx = jnp.asarray([1, 0], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        y = 120 + gy[None] * 2.2 + rng.uniform(0, 1, (2, 96, 96))
        x = 300 + gx[None] * 2.4 + rng.uniform(0, 1, (2, 96, 96))
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        np.testing.assert_allclose(a, b, atol=1.1)
        a2 = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        np.testing.assert_allclose(a2, b, atol=1.1)

    def test_int8_window_variant(self):
        """int8 MXU row mix (2x MXU peak on uint8 sources): weights quantize
        to 1/127 steps -- ~4x finer than cv2.remap's 1/32 fixed point -- and
        the window's -128 bias must cancel EXACTLY via the quantized row
        sums, so worst-case error vs the f32 gather oracle is bounded by
        the weight quantization alone: two row weights each off by at most
        1/254 against values <= 255 -> |err| <= 2.01 LSB (typically ~0.5)."""
        from absolutetrack_tpu.ops import pallas_warp as pw

        rng = np.random.default_rng(33)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636), dtype=np.uint8))
        idx = jnp.asarray([1, 0], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        y = 120 + gy[None] * 2.2 + rng.uniform(0, 1, (2, 96, 96))
        x = 300 + gx[None] * 2.4 + rng.uniform(0, 1, (2, 96, 96))
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        prev = pw.set_int8_window(True)
        try:
            a = np.asarray(
                bilinear_sample_mxu(
                    imgs, idx, coords, interpret=True, crop_hw=(96, 96)
                )
            )
            a_cover = np.asarray(
                bilinear_sample_mxu(imgs, idx, coords, interpret=True)
            )
        finally:
            pw.set_int8_window(prev)
        np.testing.assert_allclose(a, b, atol=2.1)
        np.testing.assert_allclose(a_cover, b, atol=2.1)
        # f32 sources must be untouched by the switch (bf16 path)
        prev = pw.set_int8_window(True)
        try:
            af = np.asarray(
                bilinear_sample_mxu(
                    imgs.astype(jnp.float32), idx, coords, interpret=True,
                    crop_hw=(96, 96),
                )
            )
        finally:
            pw.set_int8_window(prev)
        np.testing.assert_allclose(af, b, atol=1.1)

    def test_narrow_blocked_path(self):
        # realistic crop-like mappings (moderate gradients, one upright and
        # one rotated slot): the blocked enumeration must fit the narrow
        # 256x384 window (asserted via the plan) and match the gather path
        rng = np.random.default_rng(12)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([1, 0], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        # upright: y driven by crop row, x by crop col (~2 src px per crop px)
        yu = 120 + gy[None] * 2.2 + rng.uniform(0, 1, (1, 96, 96))
        xu = 300 + gx[None] * 2.4 + rng.uniform(0, 1, (1, 96, 96))
        # rotated: y driven by crop col, x by crop row
        yr = 60 + gx[None] * 2.1 + rng.uniform(0, 1, (1, 96, 96))
        xr = 80 + gy[None] * 3.0 + rng.uniform(0, 1, (1, 96, 96))
        x = np.concatenate([xu, xr]).reshape(2, -1)
        y = np.concatenate([yu, yr]).reshape(2, -1)
        plan = _plan_blocked(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
            480, 636, 2, 96 * 96, (96, 96),
        )
        assert plan is not None and bool(plan.all_fit)
        coords = jnp.asarray(np.stack([x, y], -1).astype(np.float32))
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_twopass_overflow_tiles_redone(self, monkeypatch):
        # a few tiles overflow pass A's (128, 256) window (row span ~140 >
        # its 128-row capacity) but fit the (256, 384) overflow window:
        # the two-pass path must redo exactly those tiles and match gather
        import absolutetrack_tpu.ops.pallas_warp as pw
        from absolutetrack_tpu.ops.pallas_warp import _plan_blocked as pb

        monkeypatch.setattr(pw, "_TWOPASS_MIN_TILES", 0)
        rng = np.random.default_rng(31)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([0, 1], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        y = 200.0 + gy[None] * 0.5 + rng.uniform(0, 1, (2, 96, 96))
        x = 120 + gx[None] * 2.0 + rng.uniform(0, 1, (2, 96, 96))
        # slot 0: the first two (16, 32) blocks (one pass-A PAIR) land in
        # distant row bands (20 vs 460): each TILE's own span is tiny (fits
        # the per-tile overflow window) but the pair union spans ~441 rows
        # and overflows the shared (256, 384) pass-A window. In the
        # (32, 16) orientation tile 2 itself would span 441 rows and fail
        # the narrow fit, so routing keeps (16, 32).
        y[0, :16, :32] = 20.0 + rng.uniform(0, 1, (16, 32))
        y[0, :16, 32:64] = 460.0 + rng.uniform(0, 1, (16, 32))
        xf = jnp.asarray(x.reshape(2, -1), jnp.float32)
        yf = jnp.asarray(y.reshape(2, -1), jnp.float32)
        plan = pb(xf, yf, 480, 636, 2, 96 * 96, (96, 96))
        n_over = int(np.sum(~np.asarray(plan.fit_a)))
        assert 0 < n_over <= 4  # the crafted pair, not the whole call
        assert bool(plan.all_fit)  # all tiles fit the overflow window
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_twopass_budget_exceeded_falls_back(self, monkeypatch):
        # more overflow tiles than the pass-B budget: the call must fall
        # back to the single-window narrow kernel and stay correct
        import absolutetrack_tpu.ops.pallas_warp as pw

        monkeypatch.setattr(pw, "_OVERFLOW_BUDGET", 2)
        monkeypatch.setattr(pw, "_TWOPASS_MIN_TILES", 0)
        rng = np.random.default_rng(32)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([0, 1], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        # alternate row bands (20 vs 460) every 16 crop COLUMNS: in the
        # (32, 16) orientation every tile is uniform (fits the per-tile
        # (256, 384) window) but every consecutive PAIR unions both bands
        # (~441 rows) and overflows pass A; in (16, 32) each tile itself
        # spans both bands and fails the narrow fit, so routing picks
        # (32, 16). All pairs overflow -> far beyond the budget of 2.
        y = 20.0 + ((gx[None] // 16) % 2) * 440.0 + rng.uniform(0, 1, (2, 96, 96))
        x = 120 + gx[None] * 2.0 + rng.uniform(0, 1, (2, 96, 96))
        plan = pw._plan_blocked(
            jnp.asarray(x.reshape(2, -1), jnp.float32),
            jnp.asarray(y.reshape(2, -1), jnp.float32),
            480, 636, 2, 96 * 96, (96, 96),
        )
        assert int(np.sum(~np.asarray(plan.fit_a))) > 2
        assert bool(plan.all_fit)
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        a = np.asarray(
            pw.bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_wide_cols_fall_back_to_banded(self):
        # narrow row bands but a >400-px column footprint per block: the
        # blocked narrow window cannot fit, the line-routed banded
        # (full-width) path must run and stay correct
        rng = np.random.default_rng(13)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([0, 1], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        y = 100 + gy[None] * 0.4 + rng.uniform(0, 1, (2, 96, 96))
        # sawtooth x: adjacent crop pixels jump across the full width, so
        # every block's column footprint is ~620 px in both orientations
        x = (gx[None] * 37.3) % 620.0 + rng.uniform(0, 1, (2, 96, 96))
        xf = jnp.asarray(x.reshape(2, -1), jnp.float32)
        yf = jnp.asarray(y.reshape(2, -1), jnp.float32)
        plan_b = _plan_blocked(xf, yf, 480, 636, 2, 96 * 96, (96, 96))
        assert plan_b is not None and not bool(plan_b.all_fit)
        plan_l = _plan_lines(xf, yf, 480, 636, 2, 96 * 96, 96 * 96, (96, 96))
        assert bool(plan_l.all_fit)
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_slot_slabs_match_single_call(self, monkeypatch):
        # calls above _MAX_SLOTS split into even slabs (the (N, T)
        # scalar-prefetch arrays live in 1 MB SMEM and overflow at
        # N = 1024); slabbed output must equal the oracle
        import absolutetrack_tpu.ops.pallas_warp as pw

        monkeypatch.setattr(pw, "_MAX_SLOTS", 3)
        rng = np.random.default_rng(41)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636)).astype(np.float32))
        idx = jnp.asarray([1, 0, 0, 1], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        y = 100 + gy[None] * 2.0 + rng.uniform(0, 1, (4, 96, 96))
        x = 200 + gx[None] * 2.5 + rng.uniform(0, 1, (4, 96, 96))
        coords = jnp.asarray(
            np.stack([x.reshape(4, -1), y.reshape(4, -1)], -1).astype(np.float32)
        )
        a = np.asarray(
            pw.bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_rotated_mapping_without_hint_uses_covering(self):
        # the same rotated mapping WITHOUT crop_hw cannot be routed; the
        # call must divert to the covering kernel and stay correct
        rng = np.random.default_rng(9)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 320)).astype(np.float32))
        idx = jnp.asarray([1, 0], jnp.int32)
        base_x = rng.uniform(0, 300, (2, 1))
        x = base_x + np.linspace(0, 18, 1024)[None, :] + rng.uniform(0, 1, (2, 1024))
        y = rng.uniform(0, 478, (2, 1024))
        coords = jnp.asarray(np.stack([x, y], -1).astype(np.float32))
        a = np.asarray(bilinear_sample_mxu(imgs, idx, coords, interpret=True))
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_mixed_orientation_slots(self):
        # one upright slot + one rotated slot in the same call: routing is
        # per slot (the rotated crop comes back transposed to row-major),
        # both must match the gather path
        rng = np.random.default_rng(7)
        imgs = jnp.asarray(rng.integers(0, 256, (3, 256, 384)).astype(np.float32))
        idx = jnp.asarray([0, 2], jnp.int32)
        gy, gx = np.mgrid[0:32, 0:32]
        yu = 40 + gy[None] * 2.0 + rng.uniform(0, 1, (1, 32, 32))
        xu = 20 + gx[None] * 3.0 + rng.uniform(0, 1, (1, 32, 32))
        yr = 30 + gx[None] * 6.0 + rng.uniform(0, 1, (1, 32, 32))
        xr = 200 + gy[None] * 1.5 + rng.uniform(0, 1, (1, 32, 32))
        y = np.concatenate([yu, yr]).reshape(2, -1)
        x = np.concatenate([xu, xr]).reshape(2, -1)
        coords = jnp.asarray(np.stack([x, y], -1).astype(np.float32))
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(32, 32))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_rotated_non_square_crop_pads(self):
        # hc != wc and P % 512 != 0: exercises the column-major reorder,
        # the -1 tile padding of BOTH orders, and the un-transpose back to
        # row-major (reshape uses (wc, hc), easy to get backwards)
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 400, 500)).astype(np.float32))
        idx = jnp.asarray([1, 0], jnp.int32)
        gy, gx = np.mgrid[0:48, 0:80]
        y = 10 + gx[None] * 4.5 + rng.uniform(0, 1, (2, 48, 80))
        x = 100 + gy[None] * 2.0 + rng.uniform(0, 1, (2, 48, 80))
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(48, 80))
        )
        b = np.asarray(bilinear_sample(imgs, idx, coords))
        assert a.shape == (2, 48 * 80)
        np.testing.assert_allclose(a, b, atol=1.1)

    def test_covering_window_straddle(self):
        # pixels whose two source rows land in DIFFERENT covering windows
        # (y0 = 255 -> rows 255 and 256 straddle the 2*_BAND window edge):
        # the accumulated passes must reassemble the exact lerp
        rng = np.random.default_rng(8)
        imgs = jnp.asarray(rng.integers(0, 256, (1, 384, 384)).astype(np.float32))
        # force covering: one far-away pixel blows up the span in both axes
        y = np.full((1, 512), 255.0) + rng.uniform(0.1, 0.9, (1, 512))
        x = rng.uniform(0, 382, (1, 512))
        y[0, -1] = 4.0
        x[0, -1] = 4.0
        coords = jnp.asarray(np.stack([x, y], -1).astype(np.float32))
        a = np.asarray(
            bilinear_sample_mxu(imgs, jnp.zeros(1, jnp.int32), coords, interpret=True)
        )
        b = np.asarray(bilinear_sample(imgs, jnp.zeros(1, jnp.int32), coords))
        np.testing.assert_allclose(a, b, atol=1.1)

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


class TestPrePaddedSource:
    def test_padded_source_matches_unpadded(self):
        """Pre-padded sources + src_valid_hw must reproduce the unpadded
        call EXACTLY on both backends (the pad is hoisted to the host; the
        kernel must treat pixels beyond the valid extent as out-of-bounds,
        not as zero-pad samples)."""
        rng = np.random.default_rng(44)
        imgs = jnp.asarray(rng.integers(0, 256, (2, 480, 636), dtype=np.uint8))
        padded = jnp.zeros((2, 512, 640), jnp.uint8)
        padded = padded.at[:, :480, :636].set(imgs)
        idx = jnp.asarray([1, 0], jnp.int32)
        gy, gx = np.mgrid[0:96, 0:96]
        # include coords near and past the right/bottom valid edges
        y = 250 + gy[None] * 2.5 + rng.uniform(0, 1, (2, 96, 96))
        x = 400 + gx[None] * 2.6 + rng.uniform(0, 1, (2, 96, 96))
        coords = jnp.asarray(
            np.stack([x.reshape(2, -1), y.reshape(2, -1)], -1).astype(np.float32)
        )
        assert float(coords[..., 0].max()) > 636  # exercises the edge
        assert float(coords[..., 1].max()) > 480

        a = np.asarray(
            bilinear_sample_mxu(imgs, idx, coords, interpret=True, crop_hw=(96, 96))
        )
        b = np.asarray(
            bilinear_sample_mxu(
                padded, idx, coords, interpret=True, crop_hw=(96, 96),
                src_valid_hw=(480, 636),
            )
        )
        np.testing.assert_array_equal(a, b)

        g = np.asarray(bilinear_sample(imgs, idx, coords))
        gp = np.asarray(
            bilinear_sample(padded, idx, coords, src_valid_hw=(480, 636))
        )
        np.testing.assert_array_equal(g, gp)
        # and the two backends agree on the padded input too
        np.testing.assert_allclose(b, gp, atol=1.1)
