"""Pallas TPU kernels for the crop-warp bilinear gather.

The fisheye->pinhole crop resample is the framework's hot host->compute
boundary op (reference _warp_image, tracker.py:61-89). The XLA fallback in
``ops.resample`` expresses the gather with advanced indexing; these kernels
reformulate bilinear sampling as one-hot interpolation matmuls that ride
the MXU (Mosaic has no general 2D vector gather).

Orientation routing: the rig's cameras are rolled by 0/90/90/180 degrees
(reference video_pose_data.py:23-93), and the crop look-at applies that
roll (crop.py:31-83), so most slots' crop->source mapping is ~90-degree
rotated: a row of crop pixels sweeps source *rows*, not columns. A
row-banded kernel alone would cover a few hundred source rows per
512-pixel tile there (measured median 211 rows on real poses). Each slot
therefore picks the orientation (normal / transposed source) that
minimizes its per-tile source-row span, and samples from a stacked array
``[views; views^T]`` with swapped coords for rotated slots (measured
median span after routing: 24 rows; p99 = 80; max = 123).

Band-limited main path: each (slot, tile) grid step DMAs a
2*_BAND=256-source-row window positioned by a scalar-prefetch index map
(two MXU K tiles) and contracts the tile's interpolation row mix against
it. The window always fits tiles whose routed row span is <= _BAND + 1 =
129 rows (> the measured max), so real frames never diverge. Calls where
some tile still exceeds its window (degenerate zoom-outs) divert to the
COVERING kernel: the same contraction accumulated over all
``HP/(2*_BAND)`` windows (grid dim m, output revisited), correct for
arbitrary coords -- the hat-function row mix is zero outside each window,
and a pixel's two source rows contribute from whichever passes contain
them. Both paths beat the XLA gather fallback by >10x; the gather remains
only as the CPU/non-TPU backend.
"""

from __future__ import annotations

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


def _tile_contrib(coords_ref, window, base):
    """One window's bilinear contribution for a 512-pixel tile -> (P,) f32.

    Pixels whose source rows fall in [base, base + 2*_BAND) contribute
    those rows' lerp terms, others (and invalid pixels, coords == -1.0)
    contribute exactly 0.
    """
    x = coords_ref[0, :, 0]
    y = coords_ref[0, :, 1]

    p = x.shape[0]
    band2 = 2 * _BAND
    # (Mosaic iota is integer-only; cast for the hat arithmetic)
    iota_r = lax.broadcasted_iota(jnp.int32, (p, band2), 1).astype(jnp.float32)
    # bf16 inputs + f32 accumulate: doubles MXU rate. The bf16 weight
    # quantization (~4e-3 relative) is ~8x FINER than cv2.remap's own
    # INTER_LINEAR fixed-point weights (5 fractional bits, 1/32 steps,
    # the reference's sampler) -- still sub-LSB for uint8-valued sources.
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


def _banded_warp_kernel(kref, sref, lo_ref, hi_ref, coords_ref, out_ref):
    """One (slot, tile) grid step against the tile's positioned window.

    kref  : (N, T) scalar-prefetch row-block indices (drive the lo/hi maps).
    sref  : (N,) scalar-prefetch stacked-source indices (view + orientation).
    lo/hi : (1, _BAND, WP) adjacent source-row blocks = the row window.
    coords: (1, _TILE, 2); out: (1, 1, 8, _TILE//8) -- the tile is stored
            as an (8, 64) block because Mosaic requires the last two block
            dims to be (8k, 128k) or full-array.
    """
    s = pl.program_id(0)
    t = pl.program_id(1)
    base = (kref[s, t] * _BAND).astype(jnp.float32)
    window = jnp.concatenate([lo_ref[0], hi_ref[0]], axis=0)  # (2B, WP) bf16
    out = _tile_contrib(coords_ref, window, base)
    out_ref[0, 0] = out.reshape(8, _TILE // 8)


def _covering_warp_kernel(sref, lo_ref, hi_ref, coords_ref, out_ref):
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
    out = _tile_contrib(coords_ref, window, base)

    @pl.when(m == 0)
    def _init():
        out_ref[0, 0] = jnp.zeros((8, _TILE // 8), jnp.float32)

    out_ref[0, 0] += out.reshape(8, _TILE // 8)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _orientation_stats(coords, h, w, n, t):
    """Per-tile (lo, hi) source-row extents + per-slot total span.

    ``coords`` (N, T*_TILE, 2) interpreted against source dims (h, w);
    invalid pixels (out of bounds / padding markers) are excluded.
    """
    x = coords[..., 0]
    y = coords[..., 1]
    x0i = jnp.floor(x).astype(jnp.int32)
    y0i = jnp.floor(y).astype(jnp.int32)
    valid = (x >= 0) & (x0i + 1 <= w - 1) & (y >= 0) & (y0i + 1 <= h - 1)
    y0c = jnp.clip(y0i, 0, h - 2)
    big = jnp.int32(1 << 20)
    lo = jnp.where(valid, y0c, big).reshape(n, t, _TILE).min(axis=-1)
    hi = jnp.where(valid, y0c + 1, -1).reshape(n, t, _TILE).max(axis=-1)
    span = jnp.maximum(hi - jnp.minimum(lo, hi), 0)  # 0 for empty tiles
    return valid, lo, hi, jnp.sum(span, axis=-1)


def bilinear_sample_mxu(
    images: jnp.ndarray,  # (V, H, W) f32
    image_idx: jnp.ndarray,  # (N,) int
    coords: jnp.ndarray,  # (N, P, 2) f32
    interpret: bool = False,
) -> jnp.ndarray:
    """Orientation-routed one-hot-matmul bilinear sampling -> (N, P).

    Any P (padded internally to a 512 multiple) and any slot count N (the
    grid streams one (slot, window) block pair per step; nothing scales
    with N in VMEM). Views are read straight from the stacked source by
    scalar-prefetch index maps -- no (N, H, W) pre-gather. Calls where some
    tile's routed source rows exceed the banded window run the covering
    kernel instead (same math, all windows accumulated).
    """
    n, p, _ = coords.shape
    v, h, w = images.shape
    coords = coords.astype(jnp.float32)

    p_pad = _round_up(p, _TILE)
    if p_pad != p:
        coords = jnp.pad(
            coords, ((0, 0), (0, p_pad - p), (0, 0)), constant_values=-1.0
        )
    t = p_pad // _TILE

    # --- orientation routing (XLA side, elementwise + small reductions) ---
    side = max(h, w)
    hp = _round_up(side, 2 * _BAND)
    wp = _round_up(side, 128)
    coords_t = coords[..., ::-1]  # sample images^T: (x', y') = (y, x)
    valid_n, lo_n, hi_n, span_n = _orientation_stats(coords, h, w, n, t)
    valid_t, lo_t, hi_t, span_t = _orientation_stats(coords_t, w, h, n, t)
    rot = span_t < span_n  # (N,)

    valid = jnp.where(rot[:, None], valid_t, valid_n)
    lo = jnp.where(rot[:, None], lo_t, lo_n)
    hi = jnp.where(rot[:, None], hi_t, hi_n)
    routed = jnp.where(rot[:, None, None], coords_t, coords)
    # mark invalid pixels with exactly -1.0: both hat mixes vanish there
    routed = jnp.where(valid[..., None], routed, -1.0)

    n_blocks = hp // _BAND
    k = jnp.clip(lo // _BAND, 0, n_blocks - 2).astype(jnp.int32)  # (N, T)
    # k is the LARGEST aligned window start below lo, so this is the
    # optimal single-window placement: it always fits spans <= _BAND + 1
    # (> the measured real-data max of 123 rows after routing)
    fits = hi <= (k + 2) * _BAND - 1  # vacuously true for empty tiles
    all_fit = jnp.all(fits)

    # --- stacked sources: [views padded; views^T padded], bf16 -----------
    # bf16 storage is mathematically identical to the kernel's own
    # window.astype(bf16) (values only enter the bf16 matmul) and halves
    # both the stack build traffic and the per-tile window DMA.
    stack = jnp.concatenate(
        [
            jnp.pad(images, ((0, 0), (0, hp - h), (0, wp - w))),
            jnp.pad(
                jnp.transpose(images, (0, 2, 1)), ((0, 0), (0, hp - w), (0, wp - h))
            ),
        ],
        axis=0,
    ).astype(jnp.bfloat16)  # (2V, HP, WP)
    sidx = (image_idx + jnp.where(rot, v, 0)).astype(jnp.int32)  # (N,)

    def banded(_):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n, t),
            in_specs=[
                pl.BlockSpec((1, _BAND, wp), lambda s, j, kr, si: (si[s], kr[s, j], 0)),
                pl.BlockSpec(
                    (1, _BAND, wp), lambda s, j, kr, si: (si[s], kr[s, j] + 1, 0)
                ),
                pl.BlockSpec((1, _TILE, 2), lambda s, j, kr, si: (s, j, 0)),
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
        )(k, sidx, stack, stack, routed)
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
                pl.BlockSpec((1, _TILE, 2), lambda s, j, m, si: (s, j, 0)),
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
        )(sidx, stack, stack, routed)
        return out4.reshape(n, p_pad)

    out = lax.cond(all_fit, banded, covering, operand=None)
    return out[:, :p]
