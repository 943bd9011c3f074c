"""Microbenchmark pass-A warp-kernel variants on the real chip.

Round-2 finding: per-tile cost ~0.8 us nearly independent of window width
-> the kernel is bound by per-step fixed costs, not MACs. This sweep
isolates WHERE that fixed cost lives by timing variants of the fused
slot-grid kernel on synthetic always-fitting inputs:

  base      : today's kernel — 18 iters/slot, M=512, (128, 256) window
  pair      : 9 iters/slot, M=1024, window (128, 256) (same K! half the
              DMAs+iters, same MACs) — needs vertical pairing, 79.6% fit
  pair192   : 9 iters/slot, M=1024, (192, 256) window — consec pairs, 90% fit
  pair256x384: 9 iters/slot, M=1024, (256, 384) window — consec, 99.98% fit
  nodma     : 18 iters/slot, M=512, window pinned in VMEM (no DMA at all)
              — isolates DMA-issue/wait cost
  nomix     : 18 iters/slot, DMA + matmul only with a CONSTANT rowmix and
              no colmix — isolates the hat-construction + VPU cost

Run on the chip: scripts/tpu_run.sh 2400 python benchmarks/warp_kernel_sweep.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from absolutetrack_tpu.utils.runtime import enable_compilation_cache

N = 768  # slots (the R=24 lockstep operating point)
P = 9216  # 96x96 crop
TILE = 512
HP, WP = 512, 640


def tile_contrib(x, y, window, base, cbase, int8=False):
    p = x.shape[0]
    band2 = window.shape[0]
    iota_r = lax.broadcasted_iota(jnp.int32, (p, band2), 1).astype(jnp.float32)
    rowmix = jnp.maximum(0.0, 1.0 - jnp.abs(iota_r - (y[:, None] - base)))
    if int8:
        # int8 MXU contraction (2x peak): weights in 1/127 steps, window
        # biased -128; bias undone exactly via quantized row sums
        q = jnp.round(rowmix * 127.0).astype(jnp.int8)
        w_i8 = (window.astype(jnp.int32) - 128).astype(jnp.int8)
        acc = jnp.dot(q, w_i8, preferred_element_type=jnp.int32)
        rowsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)
        tmp = (acc + 128 * rowsum).astype(jnp.float32) * (1.0 / 127.0)
    else:
        if window.dtype == jnp.uint8:
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


def make_kernel(m_px, wr, wc, nodma=False, nomix=False, noconv=False,
                nodot=False, int8=False):
    """Fused slot-grid kernel: T = P // m_px iters, (wr, wc) window."""
    t = P // m_px

    def kernel(kref, cref, sref, src_hbm, xy_ref, out_ref, wbuf, sems):
        s = pl.program_id(0)

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                src_hbm.at[
                    sref[s],
                    pl.ds(kref[s, j] * 64, wr),
                    pl.ds(cref[s, j] * 128, wc),
                ],
                wbuf.at[slot],
                sems.at[slot],
            )

        if not nodma:
            get_dma(0, 0).start()

        def body(j, _):
            cur = lax.rem(j, 2)
            if not nodma:
                @pl.when(j + 1 < t)
                def _():
                    get_dma(lax.rem(j + 1, 2), j + 1).start()
                get_dma(cur, j).wait()
                win = wbuf[cur]
            else:
                win = wbuf[0]
            base = (kref[s, j] * 64).astype(jnp.float32)
            cbase = (cref[s, j] * 128).astype(jnp.float32)
            x = xy_ref[0, 0, pl.ds(j * m_px, m_px)]
            y = xy_ref[0, 1, pl.ds(j * m_px, m_px)]
            if nodot:
                # mix construction + DMA + convert, NO matmul: isolates
                # whether the dot itself is the serial bottleneck
                w2 = win.astype(jnp.int32).astype(jnp.bfloat16)
                iota_r = lax.broadcasted_iota(
                    jnp.int32, (m_px, wr), 1
                ).astype(jnp.float32)
                rowmix = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iota_r - (y[:, None] - base))
                )
                iota_w = lax.broadcasted_iota(
                    jnp.int32, (m_px, wc), 1
                ).astype(jnp.float32)
                colmix = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iota_w - (x[:, None] - cbase))
                )
                out = (
                    jnp.sum(rowmix, axis=1)
                    + jnp.sum(colmix, axis=1)
                    + jnp.sum(w2[:1, :1].astype(jnp.float32))
                )
            elif nomix:
                w2 = win.astype(jnp.int32).astype(jnp.bfloat16)
                rowmix = jnp.full((m_px, wr), 0.01, jnp.bfloat16)
                tmp = jnp.dot(rowmix, w2, preferred_element_type=jnp.float32)
                out = tmp[:, :1].reshape(-1) + x * 0 + y * 0 + base + cbase
            else:
                out = tile_contrib(x, y, win, base, cbase, int8=int8)
            out_ref[0, pl.ds(j * m_px // 64, m_px // 64)] = out.reshape(
                m_px // 64, 64
            )
            return ()

        lax.fori_loop(0, t, body, ())

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 2, P), lambda s, kr, kc, si: (s, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, P // 64, 64), lambda s, kr, kc, si: (s, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wr, wc), jnp.bfloat16 if noconv else jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def call(k, c, si, src, xy):
        return pl.pallas_call(
            kernel,
            grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((N, P // 64, 64), jnp.float32),
        )(k, c, si, src, xy)

    return jax.jit(call), t


def bench_variant(name, m_px, wr, wc, **kw):
    rng = np.random.default_rng(0)
    call, t = make_kernel(m_px, wr, wc, **kw)
    src_dtype = jnp.bfloat16 if kw.get("noconv") else jnp.uint8
    # synthetic always-fitting coords: every tile samples inside its window
    k = rng.integers(0, (HP - wr) // 64, (N, t), dtype=np.int32)
    c = rng.integers(0, (WP - wc) // 128, (N, t), dtype=np.int32)
    si = rng.integers(0, 4, (N,), dtype=np.int32)
    src = jnp.asarray(rng.integers(0, 256, (4, HP, WP), dtype=np.uint8)).astype(
        src_dtype
    )
    # coords inside each tile's window
    xs = np.empty((N, P), np.float32)
    ys = np.empty((N, P), np.float32)
    for j in range(t):
        sl = slice(j * m_px, (j + 1) * m_px)
        xs[:, sl] = c[:, j, None] * 128 + rng.uniform(0, wc - 2, (N, m_px))
        ys[:, sl] = k[:, j, None] * 64 + rng.uniform(0, wr - 2, (N, m_px))
    xy = jnp.asarray(np.stack([xs, ys], axis=1))
    k, c, si = jnp.asarray(k), jnp.asarray(c), jnp.asarray(si)

    out = call(k, c, si, src, xy)
    jax.block_until_ready(out)
    # DEVICE-side timing via the profiler: wall timing over the tunnel is
    # unusable (a blocking call pays ~2 RTTs = 50 ms; identical async
    # dispatches get elided). The trace records true device occupancy.
    import shutil

    sys.path.insert(0, "/root/repo/benchmarks")
    from parse_trace import self_time_summary

    log_dir = f"tmp/trace_sweep_{name}"
    shutil.rmtree(log_dir, ignore_errors=True)
    iters = 5
    with jax.profiler.trace(log_dir):
        o = out
        for _ in range(iters):
            # chain via the coords operand so executions cannot be elided
            xy2 = xy + o.reshape(N, 1, P) * 0.0
            o = call(k, c, si, src, xy2)
        jax.block_until_ready(o)
    summ = self_time_summary(log_dir, iters=iters)
    kern_ms = sum(
        ms for n_, ms, ident in summ["ops"] if "pallas" in ident or "custom" in n_
    )
    per_tile_us = kern_ms * 1e3 / (N * (P // TILE))
    print(
        f"{name:12s} iters/slot={t:3d} M={m_px:5d} win=({wr},{wc})"
        f"  kernel {kern_ms:7.3f} ms/call (device total {summ['total_ms']:.3f})"
        f"  {per_tile_us:6.3f} us per 512px-tile",
        flush=True,
    )
    return kern_ms


def make_kernel_multislot(m_px, wr, wc, slots_per_step, noxy=False):
    """Variant: grid (N / slots_per_step,), each step loops slots_per_step
    slots x T tiles. Isolates per-grid-step overhead (and, with noxy=True,
    the xy block DMA: coords synthesized from iota, no xy operand read)."""
    t = P // m_px
    g = slots_per_step

    def kernel(kref, cref, sref, src_hbm, xy_ref, out_ref, wbuf, sems):
        s0 = pl.program_id(0)

        def get_dma(slot, u, j):
            return pltpu.make_async_copy(
                src_hbm.at[
                    sref[s0 * g + u],
                    pl.ds(kref[s0 * g + u, j] * 64, wr),
                    pl.ds(cref[s0 * g + u, j] * 128, wc),
                ],
                wbuf.at[slot],
                sems.at[slot],
            )

        get_dma(0, 0, 0).start()

        def body(i, _):
            u = i // t
            j = lax.rem(i, t)
            cur = lax.rem(i, 2)

            @pl.when(i + 1 < g * t)
            def _():
                get_dma(lax.rem(i + 1, 2), (i + 1) // t, lax.rem(i + 1, t)).start()

            get_dma(cur, u, j).wait()
            win = wbuf[cur]
            base = (kref[s0 * g + u, j] * 64).astype(jnp.float32)
            cbase = (cref[s0 * g + u, j] * 128).astype(jnp.float32)
            if noxy:
                iota = lax.broadcasted_iota(jnp.int32, (m_px,), 0)
                x = cbase + (iota % 250).astype(jnp.float32)
                y = base + (iota % 120).astype(jnp.float32)
            else:
                x = xy_ref[0, u, 0, pl.ds(j * m_px, m_px)]
                y = xy_ref[0, u, 1, pl.ds(j * m_px, m_px)]
            out = tile_contrib(x, y, win, base, cbase)
            out_ref[0, u, pl.ds(j * m_px // 64, m_px // 64)] = out.reshape(
                m_px // 64, 64
            )
            return ()

        lax.fori_loop(0, g * t, body, ())

    grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(N // g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, g, 2, P), lambda s, kr, kc, si: (s, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, g, P // 64, 64), lambda s, kr, kc, si: (s, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, wr, wc), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def call(k, c, si, src, xy):
        xy4 = xy.reshape(N // g, g, 2, P)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid,
            out_shape=jax.ShapeDtypeStruct((N // g, g, P // 64, 64), jnp.float32),
        )(k, c, si, src, xy4)
        return out.reshape(N, P // 64, 64)

    return jax.jit(call), t


def bench_multislot(name, g, noxy=False):
    rng = np.random.default_rng(0)
    call, t = make_kernel_multislot(512, 128, 256, g, noxy=noxy)
    k = rng.integers(0, (HP - 128) // 64, (N, t), dtype=np.int32)
    c = rng.integers(0, (WP - 256) // 128, (N, t), dtype=np.int32)
    si = rng.integers(0, 4, (N,), dtype=np.int32)
    src = jnp.asarray(rng.integers(0, 256, (4, HP, WP), dtype=np.uint8))
    xs = np.empty((N, P), np.float32)
    ys = np.empty((N, P), np.float32)
    for j in range(t):
        sl = slice(j * 512, (j + 1) * 512)
        xs[:, sl] = c[:, j, None] * 128 + rng.uniform(0, 254, (N, 512))
        ys[:, sl] = k[:, j, None] * 64 + rng.uniform(0, 126, (N, 512))
    xy = jnp.asarray(np.stack([xs, ys], axis=1))
    k, c, si = jnp.asarray(k), jnp.asarray(c), jnp.asarray(si)
    out = call(k, c, si, src, xy)
    jax.block_until_ready(out)
    import shutil

    sys.path.insert(0, "/root/repo/benchmarks")
    from parse_trace import self_time_summary

    log_dir = f"tmp/trace_sweep_{name}"
    shutil.rmtree(log_dir, ignore_errors=True)
    iters = 5
    with jax.profiler.trace(log_dir):
        o = out
        for _ in range(iters):
            xy2 = xy + o.reshape(N, 1, P) * 0.0
            o = call(k, c, si, src, xy2)
        jax.block_until_ready(o)
    summ = self_time_summary(log_dir, iters=iters)
    kern_ms = sum(
        ms for n_, ms, ident in summ["ops"] if "pallas" in ident or "custom" in n_
    )
    print(
        f"{name:12s} slots/step={g:2d}  kernel {kern_ms:7.3f} ms/call"
        f" (device total {summ['total_ms']:.3f})",
        flush=True,
    )


def main():
    enable_compilation_cache()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # candidates with known REAL fit rates (benchmarks/warp_pair_stats.py):
    #   single (256,384): 100%   pair-consec (256,384): 99.98%
    #   pair-consec (256,256): ~97%   quad-consec (256,384): 97.06%
    bench_variant("base", 512, 128, 256)
    bench_variant("single256x384", 512, 256, 384)
    bench_variant("pair256x256", 1024, 256, 256)
    bench_variant("pair256x384", 1024, 256, 384)
    bench_variant("quad256x384", 2048, 256, 384)
    bench_variant("pair192c256", 1024, 192, 256)
    # int8 MXU contraction at the shipped operating point: 2x MXU peak,
    # + quantize/dequant VPU cost -- the round-3 verdict's "measure, don't
    # argue" item (a). Directly comparable to pair256x384 above.
    bench_variant("pair384_int8", 1024, 256, 384, int8=True)
    bench_variant("quad384_int8", 2048, 256, 384, int8=True)


if __name__ == "__main__":
    main()
