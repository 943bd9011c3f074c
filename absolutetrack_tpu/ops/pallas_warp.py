"""Pallas TPU kernels for the crop-warp bilinear gather.

The fisheye->pinhole crop resample is the framework's hot host->compute
boundary op (reference _warp_image, tracker.py:61-89). The XLA fallback in
``ops.resample`` expresses the gather with advanced indexing; these kernels
reformulate bilinear sampling as hat-weight interpolation matmuls that ride
the MXU (Mosaic has no general 2D vector gather).

Tile enumeration (why output pixel ORDER is the whole game): the kernel
contracts each 512-pixel output tile against a rectangular source window,
so the work per tile is window_rows x window_cols -- set by how compact
the tile's source footprint is. Three enumerations, chosen per call:

* BLOCKED (primary): each tile is a (16, 32) or (32, 16) crop-pixel
  block, the orientation routed per slot. A block's source footprint is a
  ~quarter-size patch of the crop's footprint in BOTH axes (measured on
  the sample recordings: row spans <= 196, col spans <= 184, vs 431-col
  footprints for whole crop rows; median 30 rows x 59 cols). Runs as TWO
  passes: pass A grids over SLOTS and loops each slot's tile PAIRS with
  a manually double-buffered single-DMA (256, 384) window per pair
  (halves the loop steps + DMA issues vs per-tile windows and doubles
  the matmul M to 1024 -- measured 6% faster at an unchanged fit rate:
  99.98% of real-pose pairs fit, benchmarks/warp_pair_stats.py; the
  slot-grid manual DMA itself measured 13% faster than the equivalent
  BlockSpec grid because the per-grid-step fixed cost amortizes over the
  slot's tiles and each window is one copy instead of four block DMAs).
  An overflow pass then walks a fixed-budget prefetched list of the
  tiles whose pair missed and redoes just those at per-tile (256, 384)
  windows; a per-tile select merges. Falls back to the single
  (256, 384)-window kernel when the overflow list overflows ITS budget.
* LINE-major (fallback): rotated slots enumerate the crop column-major,
  upright ones row-major (the rig's cameras are rolled 0/90/90/180 deg --
  reference video_pose_data.py:23-93 -- and the crop look-at applies that
  roll, so one of the two line orders always has narrow ROW bands:
  median 24 rows per tile, max 123). Columns are unbounded -> the window
  is full-width. Used when the blocked fit check fails or the crop shape
  is not 32-divisible.
* COVERING (last resort): accumulate over ALL row windows (grid dim m,
  output revisited) at full width -- correct for arbitrary coords; the
  hat-function row mix is zero outside each window, so a pixel's two
  source rows contribute from whichever passes contain them.

All enumerations are pure per-slot index permutations of the output
pixels; each path un-permutes its own result back to row-major (tiny:
crop_h x crop_w per slot), so no image-sized data ever moves. Requires
knowing the crop's 2D shape (``crop_hw``); calls without it cannot be
routed and rely on the covering kernel when row spans overflow.

Coordinates flow through plane-major as one (N, 2, P) operand: the
camera-projection chain computes x and y as planar maps, and an
interleaved (N, P, 2) kernel operand forces XLA to materialize a
layout-changing copy right before the call (profiled at 3.2 ms per
128-frame batched step -- a third of the kernel's own cost). Plane-major
stacking is a contiguous concat of the producers' layouts instead.

Window placement: per (slot, tile) scalar-prefetch indices position the
window at 128-px granularity in each axis. The row window (2*_BAND = 256
rows, two MXU K tiles) always fits row spans <= _BAND + 1 = 129; the
narrow path's 384-col window always fits col spans <= 257 (measured real
maxima after blocked routing: 196 rows -- fits at the measured
alignments -- and 184 cols). Calls where some tile exceeds its window
divert down the fallback chain; all paths beat the XLA gather fallback by
>10x, and the gather remains only as the CPU/non-TPU backend.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

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
# For a tile of P output pixels with source coords (x, y) and a window
# whose top-left source pixel is (base, cbase):
#   rowmix[p, r] = max(0, 1 - |r - (y_p - base)|)   -- nonzero only at the
#                  two rows floor(y), floor(y)+1 with weights (1-wy, wy)
#   tmp          = rowmix @ window                  -- vertical lerp, MXU
#   colmix[p, c] = max(0, 1 - |c - (x_p - cbase)|)
#   out[p]       = sum_c tmp[p, c] * colmix[p, c]   -- horizontal lerp, VPU
#
# No gather anywhere: only iota arithmetic and a matmul -- all first-class
# Mosaic ops. Invalid pixels are marked with coords == -1.0, for which both
# hat functions vanish identically (window origins are never negative).
# ---------------------------------------------------------------------------

_TILE = 512
_BAND = 128  # row block height; a row window = 2*_BAND rows = two K tiles
_CBLK = 128  # col block width (the lane-dim tile)
_NCOL = 3  # narrow path: col window = _NCOL * _CBLK = 384 columns
# blocked enumeration: tiles are (16, 32) or (32, 16) crop-pixel blocks
_BLK = (16, 32)
# two-pass path: pass A processes consecutive tile PAIRS, each pair
# contracting one shared (256, 384) window (64-aligned rows, 128-aligned
# cols). Pairing halves the loop steps and DMA issues per slot and doubles
# the matmul M to 1024 (better MXU utilization) -- measured 6% faster than
# the per-tile (128, 256) window formulation at the same fit rate
# (benchmarks/warp_kernel_sweep.py), and the pair-union footprint fits the
# window for 99.98% of real-pose tiles (benchmarks/warp_pair_stats.py; the
# single-tile small window fit 99.94%). Tiles of a pair that overflows are
# redone by the prefetch-indexed overflow pass at per-tile (256, 384)
# windows, up to this many per call.
_RBLK2 = 64  # pass-A row-placement granule (64-aligned starts)
_PAIR_ROWS = 256  # pass-A pair window rows
_PAIR_COLS = 384  # pass-A pair window cols
_OVERFLOW_BUDGET = 192
_TWOPASS_MIN_TILES = 2048  # below this the single narrow kernel is cheaper
# (N, T) scalar-prefetch arrays live in SMEM (1 MB); N = 1024 slots blows
# it (measured: XLA "Ran out of memory in memory space smem" at R=32
# lockstep eval; N = 768 compiles and runs). Larger calls split into even
# slabs of at most this many slots -- the source pad is CSE'd across
# slabs, and per-slab dispatch means one slab's overflow doesn't divert
# the others.
_MAX_SLOTS = 768


_INT8_WINDOW = False  # module switch: int8 MXU row mix (see _tile_contrib)


def set_int8_window(enabled: bool) -> bool:
    """Toggle the int8 MXU row-mix format (uint8 sources only).

    Trace-time switch: flip BEFORE building/jitting the step that calls
    ``bilinear_sample_mxu``; already-compiled executables keep the format
    they were traced with. Returns the previous value.
    """
    global _INT8_WINDOW
    prev = _INT8_WINDOW
    _INT8_WINDOW = bool(enabled)
    return prev


def _tile_contrib(x, y, window, base, cbase):
    """One window's bilinear contribution for a 512-pixel tile -> (P,) f32.

    Pixels whose source rows/cols fall inside the window contribute their
    lerp terms, others (and invalid pixels, coords == -1.0) contribute
    exactly 0. (A split two-half-window matmul variant measured ~2% slower
    than the single concatenated window; Mosaic handles the in-VMEM concat
    fine.)

    Two MXU number formats for the row-mix matmul:
    * bf16 (default): weights cast to bf16 (~4e-3 relative quantization,
      ~8x finer than cv2.remap's own 1/32 fixed-point weights).
    * int8 (``_INT8_WINDOW``, uint8 windows only): weights quantized to
      q = round(w * 127) (1/127 steps, ~4x finer than cv2), window biased
      to window - 128 in int8; the matmul runs at the MXU's 2x int8 peak
      and the bias is undone EXACTLY via the per-pixel quantized weight
      row sum: acc + 128 * rowsum = sum_r q_r * window_r, so the only
      error is the 1/127 weight quantization itself. Costs one extra
      (P, 1-wide) int32 matmul column + an (P, W) int32->f32 dequant.
    """
    p = x.shape[0]
    band2 = window.shape[0]
    # (Mosaic iota is integer-only; cast for the hat arithmetic)
    iota_r = lax.broadcasted_iota(jnp.int32, (p, band2), 1).astype(jnp.float32)
    rowmix = jnp.maximum(0.0, 1.0 - jnp.abs(iota_r - (y[:, None] - base)))
    if _INT8_WINDOW and window.dtype == jnp.uint8:
        q = jnp.round(rowmix * 127.0).astype(jnp.int8)  # (P, 2B)
        w_i8 = (window.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jnp.dot(q, w_i8, preferred_element_type=jnp.int32)  # (P, W)
        rowsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)  # (P, 1)
        tmp = (acc + 128 * rowsum).astype(jnp.float32) * (1.0 / 127.0)
    else:
        if window.dtype == jnp.uint8:
            # uint8 sources convert here, in VMEM: the HBM window DMA moves
            # 1 byte/px instead of 2 and the whole-image pad+convert
            # disappears (bf16 represents 0..255 exactly, so the math is
            # unchanged). Mosaic has no direct u8->bf16 cast; u8->i32->bf16
            # is supported and exact for 0..255.
            window = window.astype(jnp.int32).astype(jnp.bfloat16)
        tmp = jnp.dot(
            rowmix.astype(jnp.bfloat16),
            window.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    iota_w = lax.broadcasted_iota(jnp.int32, (p, window.shape[1]), 1).astype(
        jnp.float32
    )
    colmix = jnp.maximum(0.0, 1.0 - jnp.abs(iota_w - (x[:, None] - cbase)))
    return jnp.sum(tmp * colmix, axis=1)


def _narrow_warp_kernel(
    kref, cref, sref, w00, w01, w02, w10, w11, w12, xy_ref, out_ref
):
    """One (slot, tile) grid step against a (256, 384) positioned window.

    kref  : (N, T) scalar-prefetch row-block indices.
    cref  : (N, T) scalar-prefetch col-block indices.
    sref  : (N,) scalar-prefetch source view indices.
    wIJ   : (1, _BAND, _CBLK) source blocks; the window is their 2x3 mosaic.
    xy    : (1, 2, _TILE) plane-major source coords.
    out   : (1, 1, 8, _TILE//8) -- the tile is stored as an (8, 64) block
            because Mosaic requires the last two block dims to be
            (8k, 128k) or full-array.
    """
    s = pl.program_id(0)
    t = pl.program_id(1)
    base = (kref[s, t] * _BAND).astype(jnp.float32)
    cbase = (cref[s, t] * _CBLK).astype(jnp.float32)
    window = jnp.concatenate(
        [
            jnp.concatenate([w00[0], w01[0], w02[0]], axis=1),
            jnp.concatenate([w10[0], w11[0], w12[0]], axis=1),
        ],
        axis=0,
    )  # (2*_BAND, 3*_CBLK) bf16
    out = _tile_contrib(xy_ref[0, 0], xy_ref[0, 1], window, base, cbase)
    out_ref[0, 0] = out.reshape(8, _TILE // 8)


def _fused_warp_kernel(kref, cref, sref, src_hbm, xy_ref, out_ref, wbuf, sems):
    """Pass A: one grid step per SLOT; internal PAIR loop with manual
    double-buffered window DMA.

    Each loop step processes TWO consecutive tiles (1024 px) against one
    shared (256, 384) window (rows 64-aligned, cols 128-aligned) fetched
    as ONE dynamic-slice async copy from the unblocked source. Relative
    to the earlier per-tile (128, 256) formulation this halves the loop
    steps and DMA issues and doubles the matmul M -- measured 6% faster
    at an unchanged real-pose fit rate (99.98% of pairs,
    benchmarks/warp_pair_stats.py / warp_kernel_sweep.py). Pairs whose
    union footprint overflows the window write garbage here and their
    tiles are redone by the overflow pass; the caller selects per tile.

    kref/cref : (N, T//2) pair window starts (64-row / 128-col units).
    sref      : (N,) source view indices.
    src_hbm   : (V, HP, WP) unblocked source (compiler-chosen space).
    xy_ref    : (1, 2, P) this slot's plane-major coords (VMEM block).
    out_ref   : (1, T, 8, _TILE//8) this slot's output (VMEM block).
    wbuf/sems : (2, 256, 384) window scratch + DMA semaphores.
    """
    s = pl.program_id(0)
    n_pairs = out_ref.shape[1] // 2

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            src_hbm.at[
                sref[s],
                pl.ds(kref[s, j] * _RBLK2, _PAIR_ROWS),
                pl.ds(cref[s, j] * _CBLK, _PAIR_COLS),
            ],
            wbuf.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def body(j, _):
        cur = lax.rem(j, 2)

        @pl.when(j + 1 < n_pairs)
        def _():
            get_dma(lax.rem(j + 1, 2), j + 1).start()

        get_dma(cur, j).wait()
        base = (kref[s, j] * _RBLK2).astype(jnp.float32)
        cbase = (cref[s, j] * _CBLK).astype(jnp.float32)
        m = 2 * _TILE
        x = xy_ref[0, 0, pl.ds(j * m, m)]
        y = xy_ref[0, 1, pl.ds(j * m, m)]
        out = _tile_contrib(x, y, wbuf[cur], base, cbase)
        out_ref[0, pl.ds(2 * j, 2)] = out.reshape(2, 8, _TILE // 8)
        return ()

    lax.fori_loop(0, n_pairs, body, ())


def _overflow_warp_kernel(
    sref, kref, cref, osref, otref, w00, w01, w02, w10, w11, w12, xy_ref, out_ref
):
    """Two-pass path, pass B: one grid step per overflow tile.

    The grid walks a fixed-size prefetched list of (slot, tile) pairs
    (osref/otref); window blocks, coords, and the output block are all
    positioned by that list, so only the overflowing tiles are recomputed
    -- at the full (256, 384) narrow window. Padding entries repeat a real
    tile (duplicate writes of identical data; the caller's per-tile select
    ignores anything that did fit pass A)."""
    i = pl.program_id(0)
    base = (kref[i] * _BAND).astype(jnp.float32)
    cbase = (cref[i] * _CBLK).astype(jnp.float32)
    del sref, osref, otref  # consumed by the index maps
    window = jnp.concatenate(
        [
            jnp.concatenate([w00[0], w01[0], w02[0]], axis=1),
            jnp.concatenate([w10[0], w11[0], w12[0]], axis=1),
        ],
        axis=0,
    )  # (2*_BAND, 3*_CBLK)
    out = _tile_contrib(xy_ref[0, 0], xy_ref[0, 1], window, base, cbase)
    out_ref[0, 0] = out.reshape(8, _TILE // 8)


def _banded_warp_kernel(kref, sref, lo_ref, hi_ref, xy_ref, out_ref):
    """One (slot, tile) grid step against a full-width positioned window.

    kref  : (N, T) scalar-prefetch row-block indices (drive the lo/hi maps).
    sref  : (N,) scalar-prefetch source view indices.
    lo/hi : (1, _BAND, WP) adjacent source-row blocks = the row window.
    """
    s = pl.program_id(0)
    t = pl.program_id(1)
    base = (kref[s, t] * _BAND).astype(jnp.float32)
    window = jnp.concatenate([lo_ref[0], hi_ref[0]], axis=0)  # (2B, WP) bf16
    out = _tile_contrib(xy_ref[0, 0], xy_ref[0, 1], window, base, 0.0)
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
    out = _tile_contrib(xy_ref[0, 0], xy_ref[0, 1], window, base, 0.0)

    @pl.when(m == 0)
    def _init():
        out_ref[0, 0] = jnp.zeros((8, _TILE // 8), jnp.float32)

    out_ref[0, 0] += out.reshape(8, _TILE // 8)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _tile_extents(x, y, h, w, n, t):
    """Per-tile source extents + validity for one enumeration.

    ``x``/``y`` (N, T*_TILE) interpreted against source dims (h, w);
    invalid pixels (out of bounds / padding markers) are excluded.
    Returns (valid, ylo, yhi, xlo, xhi); empty tiles have lo > hi.
    """
    x0i = jnp.floor(x).astype(jnp.int32)
    y0i = jnp.floor(y).astype(jnp.int32)
    valid = (x >= 0) & (x0i + 1 <= w - 1) & (y >= 0) & (y0i + 1 <= h - 1)
    y0c = jnp.clip(y0i, 0, h - 2)
    x0c = jnp.clip(x0i, 0, w - 2)
    big = jnp.int32(1 << 20)
    ylo = jnp.where(valid, y0c, big).reshape(n, t, _TILE).min(axis=-1)
    yhi = jnp.where(valid, y0c + 1, -1).reshape(n, t, _TILE).max(axis=-1)
    xlo = jnp.where(valid, x0c, big).reshape(n, t, _TILE).min(axis=-1)
    xhi = jnp.where(valid, x0c + 1, -1).reshape(n, t, _TILE).max(axis=-1)
    return valid, ylo, yhi, xlo, xhi


def _row_placement(ylo, yhi, hp):
    """Optimal 128-aligned row-window start blocks + fit mask.

    k is the LARGEST aligned window start below ylo, so this is the best
    single-window placement: it always fits spans <= _BAND + 1 = 129.
    """
    n_blocks = hp // _BAND
    k = jnp.clip(ylo // _BAND, 0, n_blocks - 2).astype(jnp.int32)
    fits = yhi <= (k + 2) * _BAND - 1  # vacuously true for empty tiles
    return k, fits


def _col_placement(xlo, xhi, wp):
    """128-aligned col-window start blocks + fit mask (narrow path)."""
    n_blocks = wp // _CBLK
    kc = jnp.clip(xlo // _CBLK, 0, max(n_blocks - _NCOL, 0)).astype(jnp.int32)
    fits = xhi <= kc * _CBLK + _NCOL * _CBLK - 1
    return kc, fits


def _pad_tiles(a: jnp.ndarray, p: int, p_pad: int) -> jnp.ndarray:
    if p_pad == p:
        return a
    return jnp.pad(a, ((0, 0), (0, p_pad - p)), constant_values=-1.0)


class _Plan(NamedTuple):
    """One enumeration's routed coords + window placement (trace-time)."""

    xy: jnp.ndarray  # (N, 2, P_pad) plane-major, invalid marked -1.0
    k: jnp.ndarray  # (N, T) row-window block starts
    kc: Optional[jnp.ndarray]  # (N, T) col-window block starts (narrow)
    all_fit: jnp.ndarray  # () bool: every tile fits this path's window
    sel: Optional[jnp.ndarray]  # (N,) which orientation each slot picked
    fit: Optional[jnp.ndarray] = None  # (N, T) per-tile narrow-window fit
    k2: Optional[jnp.ndarray] = None  # (N, T/2) pass-A PAIR row starts
    #                                   (64-units; pairs of consecutive
    #                                   tiles share one (256, 384) window)
    kc2: Optional[jnp.ndarray] = None  # (N, T/2) pass-A pair col starts
    fit_a: Optional[jnp.ndarray] = None  # (N, T) pass-A pair-window fit
    #                                      (broadcast per tile)


def _mark_and_stack(valid, xs, ys):
    # mark invalid pixels with exactly -1.0: both hat mixes vanish there;
    # stack plane-major (N, 2, P): contiguous with the planar producers
    return jnp.stack(
        [jnp.where(valid, xs, -1.0), jnp.where(valid, ys, -1.0)], axis=1
    )


def _plan_lines(x, y, h, w, n, p, p_pad, crop_hw, valid_hw=None) -> _Plan:
    """LINE-major enumeration: per-slot row-major vs column-major routing
    by total row span (full-width window; only rows must fit).

    ``valid_hw``: true source extent when ``(h, w)`` are pre-padded dims
    (pixels beyond it are out-of-bounds, exactly as if unpadded)."""
    hv, wv = valid_hw or (h, w)
    t = p_pad // _TILE
    hp = _round_up(h, 2 * _BAND)
    x_rm = _pad_tiles(x, p, p_pad)
    y_rm = _pad_tiles(y, p, p_pad)
    valid_n, ylo_n, yhi_n, _, _ = _tile_extents(x_rm, y_rm, hv, wv, n, t)
    if crop_hw is not None:
        hc, wc = crop_hw
        # column-major enumeration of the same crop pixels: a tile then
        # covers ~_TILE/hc crop COLUMNS, whose source-row extent is narrow
        # exactly when the slot's mapping is ~90-degree rotated
        cm = lambda a: _pad_tiles(
            a.reshape(n, hc, wc).transpose(0, 2, 1).reshape(n, p), p, p_pad
        )
        x_cm, y_cm = cm(x), cm(y)
        valid_t, ylo_t, yhi_t, _, _ = _tile_extents(x_cm, y_cm, hv, wv, n, t)
        span_n = jnp.sum(jnp.maximum(yhi_n - jnp.minimum(ylo_n, yhi_n), 0), -1)
        span_t = jnp.sum(jnp.maximum(yhi_t - jnp.minimum(ylo_t, yhi_t), 0), -1)
        rot = span_t < span_n  # (N,)
        valid = jnp.where(rot[:, None], valid_t, valid_n)
        ylo = jnp.where(rot[:, None], ylo_t, ylo_n)
        yhi = jnp.where(rot[:, None], yhi_t, yhi_n)
        xs = jnp.where(rot[:, None], x_cm, x_rm)
        ys = jnp.where(rot[:, None], y_cm, y_rm)
    else:
        rot = None
        valid, ylo, yhi = valid_n, ylo_n, yhi_n
        xs, ys = x_rm, y_rm
    k, fits = _row_placement(ylo, yhi, hp)
    return _Plan(_mark_and_stack(valid, xs, ys), k, None, jnp.all(fits), rot)


def _blocked_perm(a, n, hc, wc, bh, bw):
    """(N, hc*wc) row-major -> blocked order with (bh, bw) blocks."""
    return (
        a.reshape(n, hc // bh, bh, wc // bw, bw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, hc * wc)
    )


def _blocked_unperm(a, n, hc, wc, bh, bw):
    """Inverse of _blocked_perm."""
    return (
        a.reshape(n, hc // bh, wc // bw, bh, bw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, hc * wc)
    )


def _plan_blocked(x, y, h, w, n, p, crop_hw, valid_hw=None) -> Optional[_Plan]:
    """BLOCKED enumeration: (16, 32) / (32, 16) crop-pixel blocks as tiles,
    orientation routed per slot; both axes banded (narrow window)."""
    hv, wv = valid_hw or (h, w)
    hc, wc = crop_hw
    bh, bw = _BLK
    if hc % max(bh, bw) or wc % max(bh, bw):
        return None  # both orientations must tile the crop exactly
    hp = _round_up(h, 2 * _BAND)
    wp = _round_up(w, _CBLK)
    if wp < _NCOL * _CBLK or hp < 2 * _BAND:
        return None  # source too small for the narrow window mosaic
    t = p // _TILE  # p is exactly (hc/bh)*(wc/bw)*512 here

    cands = []
    for (obh, obw) in (( bh, bw), (bw, bh)):
        xs = _blocked_perm(x, n, hc, wc, obh, obw)
        ys = _blocked_perm(y, n, hc, wc, obh, obw)
        valid, ylo, yhi, xlo, xhi = _tile_extents(xs, ys, hv, wv, n, t)
        k, fit_r = _row_placement(ylo, yhi, hp)
        kc, fit_c = _col_placement(xlo, xhi, wp)
        fit = fit_r & fit_c
        # pass-A placement: consecutive tile PAIRS share one (256, 384)
        # window (rows 64-aligned, cols 128-aligned). t is always even
        # here (hc, wc are 32-multiples => t = hc*wc/512 is even).
        pair_lo = lambda a: a.reshape(n, t // 2, 2).min(axis=-1)
        pair_hi = lambda a: a.reshape(n, t // 2, 2).max(axis=-1)
        pylo, pyhi = pair_lo(ylo), pair_hi(yhi)
        pxlo, pxhi = pair_lo(xlo), pair_hi(xhi)
        k2 = jnp.clip(
            pylo // _RBLK2, 0, hp // _RBLK2 - _PAIR_ROWS // _RBLK2
        ).astype(jnp.int32)
        fit_r2 = pyhi <= k2 * _RBLK2 + _PAIR_ROWS - 1
        kc2 = jnp.clip(
            pxlo // _CBLK, 0, wp // _CBLK - _PAIR_COLS // _CBLK
        ).astype(jnp.int32)
        fit_c2 = pxhi <= kc2 * _CBLK + _PAIR_COLS - 1
        # per-tile fit mask (both tiles of an unfit pair go to overflow)
        fit_a = jnp.repeat(fit_r2 & fit_c2, 2, axis=1)
        # routing score: most fitting tiles, then tightest row spans
        nfit = jnp.sum(fit, axis=-1)
        rsum = jnp.sum(jnp.maximum(yhi - jnp.minimum(ylo, yhi), 0), -1)
        cands.append((xs, ys, valid, k, kc, fit, nfit, rsum, k2, kc2, fit_a))
    c1, c2 = cands
    pick2 = (c2[6] > c1[6]) | ((c2[6] == c1[6]) & (c2[7] < c1[7]))  # (N,)
    mix = lambda a1, a2: jnp.where(pick2[:, None], a2, a1)
    xs = mix(c1[0], c2[0])
    ys = mix(c1[1], c2[1])
    valid = mix(c1[2], c2[2])
    k = mix(c1[3], c2[3])
    kc = mix(c1[4], c2[4])
    fit = mix(c1[5], c2[5])
    k2 = mix(c1[8], c2[8])
    kc2 = mix(c1[9], c2[9])
    fit_a = mix(c1[10], c2[10])
    return _Plan(
        _mark_and_stack(valid, xs, ys),
        k,
        kc,
        jnp.all(fit),
        pick2,
        fit=fit,
        k2=k2,
        kc2=kc2,
        fit_a=fit_a,
    )


def bilinear_sample_mxu(
    images: jnp.ndarray,  # (V, H, W) f32 / uint8 / bf16
    image_idx: jnp.ndarray,  # (N,) int
    coords,  # (N, P, 2) f32 OR an (x, y) tuple of (N, P) planes,
    #          row-major over the crop when crop_hw is given
    interpret: bool = False,
    crop_hw: Optional[Tuple[int, int]] = None,  # (crop_h, crop_w), P = h*w
    src_valid_hw: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Orientation-routed hat-matmul bilinear sampling -> (N, P).

    ``src_valid_hw``: pass the TRUE source extent when ``images`` arrive
    already zero-padded to window-aligned dims (rows to a 256 multiple =
    2*_BAND, cols to a 128 multiple; see ``_prepad_opts``): sampling
    semantics stay those of the unpadded source (coords beyond the valid
    extent are out-of-bounds) while the per-dispatch device-side
    ``jnp.pad`` of the whole image batch disappears (profiled ~0.8 ms per
    128-frame serving dispatch).

    Any P (padded internally to a 512 multiple) and any slot count N (the
    grid streams one (slot, window) block set per step; nothing scales
    with N in VMEM). ``crop_hw`` declares the 2D structure of the P output
    pixels and enables the routed enumerations (see module docstring);
    each path un-permutes its own output back to row-major. The fallback
    chain narrow -> banded -> covering is resolved per call with the
    cheap trace-time extent stats above.
    """
    from .resample import split_coord_planes

    x, y = split_coord_planes(coords)
    n, p = x.shape
    if n > _MAX_SLOTS:
        n_slabs = -(-n // _MAX_SLOTS)
        slab = -(-n // n_slabs)
        outs = [
            bilinear_sample_mxu(
                images,
                image_idx[i : i + slab],
                (x[i : i + slab], y[i : i + slab]),
                interpret=interpret,
                crop_hw=crop_hw,
                src_valid_hw=src_valid_hw,
            )
            for i in range(0, n, slab)
        ]
        return jnp.concatenate(outs, axis=0)
    v, h, w = images.shape
    valid_hw = src_valid_hw
    if valid_hw is not None:
        hv, wv = valid_hw
        assert hv <= h and wv <= w, (valid_hw, images.shape)
    x = x.astype(jnp.float32)  # planar end to end: no (N, P, 2) operand
    y = y.astype(jnp.float32)

    p_pad = _round_up(p, _TILE)

    route = crop_hw is not None and crop_hw[0] * crop_hw[1] == p
    lines = _plan_lines(
        x, y, h, w, n, p, p_pad, crop_hw if route else None, valid_hw
    )
    blocked = (
        _plan_blocked(x, y, h, w, n, p, crop_hw, valid_hw) if route else None
    )

    hp = _round_up(h, 2 * _BAND)
    wp = _round_up(w, _CBLK)
    # Zero-padded source views. uint8 sources (decoded video) stay uint8
    # through HBM -- the kernels convert each window in VMEM -- halving the
    # window DMA and skipping the whole-image convert; everything else is
    # padded + pre-converted to bf16 once (values only enter the bf16
    # matmul either way, so the math is identical).
    src = jnp.pad(images, ((0, 0), (0, hp - h), (0, wp - w)))
    if src.dtype != jnp.uint8:
        src = src.astype(jnp.bfloat16)
    sidx = image_idx.astype(jnp.int32)  # (N,)

    def _unperm_blocked(out):
        # un-permute each slot with the block orientation it picked
        hc, wc = crop_hw
        bh, bw = _BLK
        out1 = _blocked_unperm(out, n, hc, wc, bh, bw)
        out2 = _blocked_unperm(out, n, hc, wc, bw, bh)
        return jnp.where(blocked.sel[:, None], out2, out1)

    def pass_a(_):
        t = p // _TILE
        gridA = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 2, p), lambda s, kr, kc, si: (s, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, t, 8, _TILE // 8), lambda s, kr, kc, si: (s, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _PAIR_ROWS, _PAIR_COLS), src.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            _fused_warp_kernel,
            grid_spec=gridA,
            out_shape=jax.ShapeDtypeStruct((n, t, 8, _TILE // 8), jnp.float32),
            interpret=interpret,
        )(blocked.k2, blocked.kc2, sidx, src, blocked.xy)

    def fused_only(_):
        # every tile fits the (128, 256) window: pass A alone
        return _unperm_blocked(pass_a(None).reshape(n, p))

    def twopass(_):
        t = p // _TILE
        budget = min(_OVERFLOW_BUDGET, max(n * t // 16, 8))
        outA = pass_a(None)

        # pass B: the <= budget overflow tiles at the full (256, 384) window
        flat_over = ~blocked.fit_a.reshape(-1)
        (oidx,) = jnp.nonzero(flat_over, size=budget, fill_value=0)
        os_ = (oidx // t).astype(jnp.int32)
        ot_ = (oidx % t).astype(jnp.int32)
        sio = sidx[os_]
        kro = blocked.k[os_, ot_]
        kco = blocked.kc[os_, ot_]
        bspecB = lambda di, dj: pl.BlockSpec(
            (1, _BAND, _CBLK),
            lambda i, si, kr, kc, os, ot, di=di, dj=dj: (
                si[i],
                kr[i] + di,
                kc[i] + dj,
            ),
        )
        gridB = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(budget,),
            in_specs=[bspecB(di, dj) for di in (0, 1) for dj in (0, 1, 2)]
            + [
                pl.BlockSpec(
                    (1, 2, _TILE), lambda i, si, kr, kc, os, ot: (os[i], 0, ot[i])
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8, _TILE // 8),
                lambda i, si, kr, kc, os, ot: (os[i], ot[i], 0, 0),
            ),
        )
        outB = pl.pallas_call(
            _overflow_warp_kernel,
            grid_spec=gridB,
            out_shape=jax.ShapeDtypeStruct((n, t, 8, _TILE // 8), jnp.float32),
            interpret=interpret,
        )(sio, kro, kco, os_, ot_, *([src] * 6), blocked.xy)

        sel = blocked.fit_a[..., None, None]  # (n, t, 1, 1)
        out = jnp.where(sel, outA, outB).reshape(n, p)
        return _unperm_blocked(out)

    def narrow(_):
        t = p // _TILE
        hc, wc = crop_hw
        bspec = lambda di, dj: pl.BlockSpec(
            (1, _BAND, _CBLK),
            lambda s, j, kr, kc, si, di=di, dj=dj: (
                si[s],
                kr[s, j] + di,
                kc[s, j] + dj,
            ),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n, t),
            in_specs=[bspec(di, dj) for di in (0, 1) for dj in (0, 1, 2)]
            + [
                pl.BlockSpec(
                    (1, 2, _TILE), lambda s, j, kr, kc, si: (s, 0, j)
                )
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8, _TILE // 8), lambda s, j, kr, kc, si: (s, j, 0, 0)
            ),
        )
        out4 = pl.pallas_call(
            _narrow_warp_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, t, 8, _TILE // 8), jnp.float32),
            interpret=interpret,
        )(blocked.k, blocked.kc, sidx, *([src] * 6), blocked.xy)
        return _unperm_blocked(out4.reshape(n, p))

    def banded(_):
        t = p_pad // _TILE
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
        )(lines.k, sidx, src, src, lines.xy)
        return _unperm_lines(out4.reshape(n, p_pad)[:, :p])

    def covering(_):
        t = p_pad // _TILE
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
        )(sidx, src, src, lines.xy)
        return _unperm_lines(out4.reshape(n, p_pad)[:, :p])

    def _unperm_lines(out):
        if lines.sel is None:
            return out
        hc, wc = crop_hw
        # rotated slots sampled column-major: out[j*hc + i] = crop[i, j]
        out_rm = out.reshape(n, wc, hc).transpose(0, 2, 1).reshape(n, p)
        return jnp.where(lines.sel[:, None], out_rm, out)

    full = lambda _: lax.cond(lines.all_fit, banded, covering, operand=None)
    if blocked is None:
        return full(None)
    # dispatch: pass A alone when every tile fits its (128, 256) window;
    # pass A + overflow pass when the few misses fit the budget AND the
    # (256, 384) overflow window; the single narrow kernel otherwise.
    # Small calls (the sequential live path) skip the overflow machinery:
    # its fixed-size pass + merge cost more than they save there.
    fallback = lambda _: lax.cond(blocked.all_fit, narrow, full, operand=None)
    n_over = jnp.sum(~blocked.fit_a)
    if blocked.fit_a.size < _TWOPASS_MIN_TILES:
        return lax.cond(n_over == 0, fused_only, fallback, operand=None)
    budget = min(_OVERFLOW_BUDGET, max(blocked.fit_a.size // 16, 8))
    twopass_ok = (
        (n_over <= budget) & jnp.all(blocked.fit_a | blocked.fit)
    )
    return lax.cond(twopass_ok, twopass, fallback, operand=None)
