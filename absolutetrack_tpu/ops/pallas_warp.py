"""Pallas TPU kernels for the crop-warp bilinear gather.

The fisheye->pinhole crop resample is the framework's hot host->compute
boundary op (reference _warp_image, tracker.py:61-89). The XLA fallback in
``ops.resample`` expresses the gather with advanced indexing; these kernels
reformulate bilinear sampling as one-hot interpolation matmuls that ride
the MXU (Mosaic has no general 2D vector gather).

Orientation routing (by OUTPUT ORDER, not by transposing the source):
the rig's cameras are rolled by 0/90/90/180 degrees (reference
video_pose_data.py:23-93), and the crop look-at applies that roll
(crop.py:31-83), so most slots' crop->source mapping is ~90-degree
rotated: a row of crop pixels sweeps source *rows*, not columns, and a
row-banded kernel would need a few hundred source rows per 512-pixel tile
(measured median 211 rows on real poses). Transposing the source images
fixes the spans (median 24 after routing; p99 = 80; max = 123) but costs
an image-sized transpose + concat chain per call -- profiled at ~10 ms
per 128-frame batched step, as much as the warp kernel itself. Instead,
each slot picks the ITERATION ORDER of its output pixels: rotated slots
enumerate their crop column-major, so a 512-pixel tile covers ~5 crop
COLUMNS, whose source rows form the same narrow band the transposed
formulation had -- identical span statistics, zero image-sized data
movement. The kernel runs unchanged against the plain zero-padded bf16
views; afterwards the rotated slots' crops (tiny: crop_h x crop_w) are
transposed back to row-major. Requires knowing the crop's 2D shape
(``crop_hw``); calls without it skip routing and rely on the covering
kernel when spans overflow.

Coordinates flow through plane-major as one (N, 2, P) operand: the
camera-projection chain computes x and y as planar maps, and an
interleaved (N, P, 2) kernel operand forces XLA to materialize a
layout-changing copy right before the call (profiled at 3.2 ms per
128-frame batched step -- a third of the kernel's own cost). Plane-major
stacking is a contiguous concat of the producers' layouts instead.

Band-limited main path: each (slot, tile) grid step DMAs a
2*_BAND=256-source-row window positioned by a scalar-prefetch index map
(two MXU K tiles) and contracts the tile's interpolation row mix against
it. The window always fits tiles whose routed row span is <= _BAND + 1 =
129 rows (> the measured real-data max of 123), so real frames never
diverge. Calls where some tile still exceeds its window (degenerate
zoom-outs, unrouted rotated mappings) divert to the COVERING kernel: the
same contraction accumulated over all ``HP/(2*_BAND)`` windows (grid dim
m, output revisited), correct for arbitrary coords -- the hat-function
row mix is zero outside each window, and a pixel's two source rows
contribute from whichever passes contain them. Both paths beat the XLA
gather fallback by >10x; the gather remains only as the CPU/non-TPU
backend.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu only exists on TPU-enabled installs
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


# ---------------------------------------------------------------------------
# MXU formulation: bilinear sampling as a hat-weight interpolation matmul.
#
# For a tile of P output pixels with source coords (x, y) and a row window
# [base, base + 2*_BAND):
#   rowmix[p, r] = max(0, 1 - |r - (y_p - base)|)   -- nonzero only at the
#                  two rows floor(y), floor(y)+1 with weights (1-wy, wy)
#   tmp          = rowmix @ window                  -- vertical lerp, MXU
#   colmix[p, c] = max(0, 1 - |c - x_p|)
#   out[p]       = sum_c tmp[p, c] * colmix[p, c]   -- horizontal lerp, VPU
#
# No gather anywhere: only iota arithmetic and a matmul -- all first-class
# Mosaic ops. Invalid pixels are marked with coords == -1.0, for which both
# hat functions vanish identically.
# ---------------------------------------------------------------------------

_TILE = 512
_BAND = 128  # row block height; a window = 2*_BAND rows = two MXU K tiles


def _tile_contrib(x, y, window, base):
    """One window's bilinear contribution for a 512-pixel tile -> (P,) f32.

    Pixels whose source rows fall in [base, base + 2*_BAND) contribute
    those rows' lerp terms, others (and invalid pixels, coords == -1.0)
    contribute exactly 0. (A split two-half-window matmul variant measured
    ~2% slower than the single concatenated window; Mosaic handles the
    in-VMEM concat fine.)
    """
    p = x.shape[0]
    band2 = 2 * _BAND
    # (Mosaic iota is integer-only; cast for the hat arithmetic)
    iota_r = lax.broadcasted_iota(jnp.int32, (p, band2), 1).astype(jnp.float32)
    # bf16 inputs + f32 accumulate: doubles MXU rate. The hat is computed
    # in f32 (bf16 ulp near y ~ 100 is a whole pixel) and only the WEIGHT
    # in [0, 1] is cast: that quantization (~4e-3 relative) is ~8x FINER
    # than cv2.remap's own INTER_LINEAR fixed-point weights (5 fractional
    # bits, 1/32 steps, the reference's sampler) -- still sub-LSB for
    # uint8-valued sources.
    rowmix = jnp.maximum(0.0, 1.0 - jnp.abs(iota_r - (y[:, None] - base)))
    tmp = jnp.dot(
        rowmix.astype(jnp.bfloat16),
        window,  # already bf16
        preferred_element_type=jnp.float32,
    )

    iota_w = lax.broadcasted_iota(jnp.int32, (p, window.shape[1]), 1).astype(
        jnp.float32
    )
    colmix = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - x[:, None]))
    return jnp.sum(tmp * colmix, axis=1)


def _banded_warp_kernel(kref, sref, lo_ref, hi_ref, xy_ref, out_ref):
    """One (slot, tile) grid step against the tile's positioned window.

    kref  : (N, T) scalar-prefetch row-block indices (drive the lo/hi maps).
    sref  : (N,) scalar-prefetch source view indices.
    lo/hi : (1, _BAND, WP) adjacent source-row blocks = the row window.
    xy    : (1, 2, _TILE) plane-major source coords (matches the planar
            layout the camera chain produces -- an interleaved (N, P, 2)
            operand forces a slow relayout copy before the call);
    out   : (1, 1, 8, _TILE//8) -- the tile is stored as an (8, 64) block
            because Mosaic requires the last two block dims to be
            (8k, 128k) or full-array.
    """
    s = pl.program_id(0)
    t = pl.program_id(1)
    base = (kref[s, t] * _BAND).astype(jnp.float32)
    window = jnp.concatenate([lo_ref[0], hi_ref[0]], axis=0)  # (2B, WP) bf16
    out = _tile_contrib(xy_ref[0, 0], xy_ref[0, 1], window, base)
    out_ref[0, 0] = out.reshape(8, _TILE // 8)


def _covering_warp_kernel(sref, lo_ref, hi_ref, xy_ref, out_ref):
    """(slot, tile, window) grid step: accumulate over all row windows.

    Correct for ANY coords: window m holds source rows
    [2*_BAND*m, 2*_BAND*(m+1)); each pixel's two lerp rows contribute from
    whichever passes contain them (the hat row mix is zero elsewhere).
    Rows at a window edge split cleanly: floor(y) contributes from its
    window, floor(y)+1 from the next.
    """
    m = pl.program_id(2)
    base = (m * 2 * _BAND).astype(jnp.float32)
    window = jnp.concatenate([lo_ref[0], hi_ref[0]], axis=0)
    out = _tile_contrib(xy_ref[0, 0], xy_ref[0, 1], window, base)

    @pl.when(m == 0)
    def _init():
        out_ref[0, 0] = jnp.zeros((8, _TILE // 8), jnp.float32)

    out_ref[0, 0] += out.reshape(8, _TILE // 8)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _orientation_stats(x, y, h, w, n, t):
    """Per-tile (lo, hi) source-row extents + per-slot total span.

    ``x``/``y`` (N, T*_TILE) interpreted against source dims (h, w);
    invalid pixels (out of bounds / padding markers) are excluded.
    """
    x0i = jnp.floor(x).astype(jnp.int32)
    y0i = jnp.floor(y).astype(jnp.int32)
    valid = (x >= 0) & (x0i + 1 <= w - 1) & (y >= 0) & (y0i + 1 <= h - 1)
    y0c = jnp.clip(y0i, 0, h - 2)
    big = jnp.int32(1 << 20)
    lo = jnp.where(valid, y0c, big).reshape(n, t, _TILE).min(axis=-1)
    hi = jnp.where(valid, y0c + 1, -1).reshape(n, t, _TILE).max(axis=-1)
    span = jnp.maximum(hi - jnp.minimum(lo, hi), 0)  # 0 for empty tiles
    return valid, lo, hi, jnp.sum(span, axis=-1)


def _pad_tiles(a: jnp.ndarray, p: int, p_pad: int) -> jnp.ndarray:
    if p_pad == p:
        return a
    return jnp.pad(a, ((0, 0), (0, p_pad - p)), constant_values=-1.0)


def bilinear_sample_mxu(
    images: jnp.ndarray,  # (V, H, W) f32 / uint8 / bf16
    image_idx: jnp.ndarray,  # (N,) int
    coords: jnp.ndarray,  # (N, P, 2) f32, row-major over the crop when
    #                       crop_hw is given
    interpret: bool = False,
    crop_hw: Optional[Tuple[int, int]] = None,  # (crop_h, crop_w), P = h*w
) -> jnp.ndarray:
    """Orientation-routed one-hot-matmul bilinear sampling -> (N, P).

    Any P (padded internally to a 512 multiple) and any slot count N (the
    grid streams one (slot, window) block pair per step; nothing scales
    with N in VMEM). ``crop_hw`` declares the 2D structure of the P output
    pixels and enables per-slot orientation routing: rotated slots iterate
    their crop column-major so the banded row window fits (see module
    docstring) and their output is transposed back afterwards. Calls
    where some tile's source rows still exceed the banded window run the
    covering kernel instead (same math, all windows accumulated).
    """
    n, p, _ = coords.shape
    v, h, w = images.shape
    x = coords[..., 0].astype(jnp.float32)  # planar: no (N, P, 2) operand
    y = coords[..., 1].astype(jnp.float32)

    p_pad = _round_up(p, _TILE)
    t = p_pad // _TILE

    route = crop_hw is not None and crop_hw[0] * crop_hw[1] == p
    x_rm = _pad_tiles(x, p, p_pad)
    y_rm = _pad_tiles(y, p, p_pad)
    valid_n, lo_n, hi_n, span_n = _orientation_stats(x_rm, y_rm, h, w, n, t)
    if route:
        hc, wc = crop_hw
        # column-major enumeration of the same crop pixels: a tile then
        # covers ~_TILE/hc crop COLUMNS, whose source-row extent is narrow
        # exactly when the slot's mapping is ~90-degree rotated
        cm = lambda a: _pad_tiles(
            a.reshape(n, hc, wc).transpose(0, 2, 1).reshape(n, p), p, p_pad
        )
        x_cm, y_cm = cm(x), cm(y)
        valid_t, lo_t, hi_t, span_t = _orientation_stats(x_cm, y_cm, h, w, n, t)
        rot = span_t < span_n  # (N,)
        valid = jnp.where(rot[:, None], valid_t, valid_n)
        lo = jnp.where(rot[:, None], lo_t, lo_n)
        hi = jnp.where(rot[:, None], hi_t, hi_n)
        xs = jnp.where(rot[:, None], x_cm, x_rm)
        ys = jnp.where(rot[:, None], y_cm, y_rm)
    else:
        valid, lo, hi = valid_n, lo_n, hi_n
        xs, ys = x_rm, y_rm
    # mark invalid pixels with exactly -1.0: both hat mixes vanish there;
    # stack plane-major (N, 2, P): contiguous with the planar producers
    xy = jnp.stack([jnp.where(valid, xs, -1.0), jnp.where(valid, ys, -1.0)], axis=1)

    hp = _round_up(h, 2 * _BAND)
    wp = _round_up(w, 128)
    n_blocks = hp // _BAND
    k = jnp.clip(lo // _BAND, 0, n_blocks - 2).astype(jnp.int32)  # (N, T)
    # k is the LARGEST aligned window start below lo, so this is the
    # optimal single-window placement: it always fits spans <= _BAND + 1
    # (> the measured real-data max of 123 rows after routing)
    fits = hi <= (k + 2) * _BAND - 1  # vacuously true for empty tiles
    all_fit = jnp.all(fits)

    # Zero-padded bf16 views: ONE cheap pad+convert fusion. bf16 storage is
    # mathematically identical to the kernel's own window.astype(bf16)
    # (values only enter the bf16 matmul) and halves the window DMA.
    src = jnp.pad(images, ((0, 0), (0, hp - h), (0, wp - w))).astype(jnp.bfloat16)
    sidx = image_idx.astype(jnp.int32)  # (N,)

    def banded(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, t),
            in_specs=[
                pl.BlockSpec((1, _BAND, wp), lambda s, j, kr, si: (si[s], kr[s, j], 0)),
                pl.BlockSpec(
                    (1, _BAND, wp), lambda s, j, kr, si: (si[s], kr[s, j] + 1, 0)
                ),
                pl.BlockSpec((1, 2, _TILE), lambda s, j, kr, si: (s, 0, j)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8, _TILE // 8), lambda s, j, kr, si: (s, j, 0, 0)
            ),
        )
        out4 = pl.pallas_call(
            _banded_warp_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, t, 8, _TILE // 8), jnp.float32),
            interpret=interpret,
        )(k, sidx, src, src, xy)
        return out4.reshape(n, p_pad)

    def covering(_):
        m_windows = hp // (2 * _BAND)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, t, m_windows),
            in_specs=[
                pl.BlockSpec((1, _BAND, wp), lambda s, j, m, si: (si[s], 2 * m, 0)),
                pl.BlockSpec(
                    (1, _BAND, wp), lambda s, j, m, si: (si[s], 2 * m + 1, 0)
                ),
                pl.BlockSpec((1, 2, _TILE), lambda s, j, m, si: (s, 0, j)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8, _TILE // 8), lambda s, j, m, si: (s, j, 0, 0)
            ),
        )
        out4 = pl.pallas_call(
            _covering_warp_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, t, 8, _TILE // 8), jnp.float32),
            interpret=interpret,
        )(sidx, src, src, xy)
        return out4.reshape(n, p_pad)

    out = lax.cond(all_fit, banded, covering, operand=None)[:, :p]
    if route:
        # rotated slots sampled column-major: out[j*hc + i] = crop[i, j]
        out_rm = out.reshape(n, wc, hc).transpose(0, 2, 1).reshape(n, p)
        out = jnp.where(rot[:, None], out_rm, out)
    return out
