"""Ablation timing of the VMEM-resident fused grads level (272x512, 6 it).

The resident kernel costs ~21 us/iteration on a 272x512 tile — the same
per-TILE cost as the 16x-larger L0 level, i.e. per pixel it is ~16x off,
which makes it latency/serialization-bound by construction (per iteration
only the warp-window DMA touches HBM).  This script copies the kernel with
short-circuit flags so the schedule stays comparable while stages drop out:

  full        — production kernel
  no_warp     — _warp_finish skipped entirely (jw := prev window; the warp
                DMA is still issued and waited)
  no_warp_dma — warp DMA issued only at k==0 (stale window reused: kills
                the per-iteration DMA issue+wait serialization)
  no_rollx    — column roll skipped (values wrong; timing isolates the
                dynamic lane roll)
  no_rolly    — static-bit sublane rolls skipped
  no_selects  — both select passes replaced by a window slice
  no_bsums    — b box sums constant
  bf16_win    — window scratch in bf16 (halves the warp DMA bytes; the
                roll/selects still run f32 after widening)

Differential chain timing; run alone on the TPU.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lk_tpu.flow.pallas_kernels import (
    _HALO, _asym_pads, _boxsum_tile_mxu, _win_shape,
)

H, W = 272, 512
LOCAL = 5
MAX_DISP = 8
N_ITERS = 6
WIN_K = 15


def _warp(next_hbm, fx, fy, y0, x0, scratch, sem, *, h, w, pad_y, pad_x,
          max_disp, th, tw, local, mode, k):
    bound = jnp.float32(max_disp)
    dy0 = jnp.round(jnp.clip(fy[th // 2, tw // 2], -bound, bound)).astype(
        jnp.int32)
    dx0 = jnp.round(jnp.clip(fx[th // 2, tw // 2], -bound, bound)).astype(
        jnp.int32)
    src_y_raw = y0 + pad_y + dy0 - local
    src_x_raw = x0 + pad_x + dx0 - local
    src_y = pl.multiple_of((src_y_raw // 8) * 8, 8)
    src_x = pl.multiple_of((src_x_raw // 128) * 128, 128)
    sh, sw = scratch.shape
    dma = pltpu.make_async_copy(
        next_hbm.at[pl.ds(src_y, sh), pl.ds(src_x, sw)], scratch, sem
    )
    if mode == "no_warp_dma":
        @pl.when(k == 0)
        def _():
            dma.start()

        @pl.when(k == 0)
        def _():
            dma.wait()
    else:
        dma.start()
    extra_y = src_y_raw - src_y
    extra_x = src_x_raw - src_x

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    gx = jnp.clip(cols + x0 + jnp.clip(fx, -bound, bound), 0.0, w - 1.0)
    rel_y = jnp.clip(
        gy - (src_y_raw - pad_y).astype(jnp.float32) - rows, 0.0, 2.0 * local
    )
    rel_x = jnp.clip(
        gx - (src_x_raw - pad_x).astype(jnp.float32) - cols, 0.0, 2.0 * local
    )

    if mode != "no_warp_dma":
        dma.wait()
    win = scratch[:].astype(jnp.float32)
    if mode != "no_rollx":
        win = pltpu.roll(win, shift=-extra_x, axis=1)
    vw = tw + 2 * local + 1
    win = win[:, :-(-vw // 128) * 128]
    if mode != "no_rolly":
        for bit in (1, 2, 4):
            r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
            win = jnp.where((extra_y & bit) != 0, r, win)

    if mode == "no_selects":
        return win[:th, :tw]

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, vw - tw))
        return jnp.concatenate([a, tail], axis=1)

    rel_y_w = widen(rel_y)
    acc = jnp.zeros((th, vw), jnp.float32)
    for d in range(2 * local + 2):
        m = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y_w - d))
        acc = acc + m * win[d:d + th, :vw]
    out = jnp.zeros((th, tw), jnp.float32)
    for d in range(2 * local + 2):
        m = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x - d))
        out = out + m * acc[:, d:d + tw]
    return out


def _kernel(next_hbm, prev_hbm, flow_in_hbm, out_hbm, stats_hbm,
            win_scratch, prev_scratch, flow_scratch, grad_cache, a_cache,
            out_tile, sems,
            *, h, w, pad_y, pad_x, max_disp, tile_h, tile_w, local, win_k,
            area_f, eig_thr, n_iters, mode):
    k = pl.program_id(0)
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    c0 = 128 - _HALO

    @pl.when(k == 0)
    def _():
        dma_p = pltpu.make_async_copy(
            prev_hbm.at[pl.ds(0, tile_h + 32),
                        pl.ds(0, prev_scratch.shape[-1])],
            prev_scratch, sems.at[0],
        )
        dma_p.start()
        d = pltpu.make_async_copy(flow_in_hbm, flow_scratch, sems.at[1])
        d.start()
        d.wait()
        dma_p.wait()
        p = prev_scratch[:]
        sy = (3.0 * p[7:7 + eth, 119:121 + etw]
              + 10.0 * p[8:8 + eth, 119:121 + etw]
              + 3.0 * p[9:9 + eth, 119:121 + etw]) * (1.0 / 16.0)
        ix_w = (sy[:, 2:] - sy[:, :-2]) * 0.5
        sx = (3.0 * p[7:9 + eth, 119:119 + etw]
              + 10.0 * p[7:9 + eth, 120:120 + etw]
              + 3.0 * p[7:9 + eth, 121:121 + etw]) * (1.0 / 16.0)
        iy_w = (sx[2:, :] - sx[:-2, :]) * 0.5

        def fill(a, width):
            ext = width - a.shape[-1]
            if ext == 0:
                return a
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], ext))], axis=-1
            )

        gw = grad_cache.shape[-1]
        grad_cache[0] = fill(ix_w, gw)
        grad_cache[1] = fill(iy_w, gw)
        grad_cache[2] = fill(p[8:8 + eth, 120:120 + etw], gw)
        a11 = _boxsum_tile_mxu(ix_w * ix_w, win_k, tile_h, tile_w)
        a12 = _boxsum_tile_mxu(ix_w * iy_w, win_k, tile_h, tile_w)
        a22 = _boxsum_tile_mxu(iy_w * iy_w, win_k, tile_h, tile_w)
        det = a11 * a22 - a12 * a12
        min_eig = (a11 + a22
                   - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
            2.0 * area_f)
        solvable = det > 1e-7
        validf = jnp.where((min_eig >= eig_thr) & solvable, 1.0, 0.0)
        aw = a_cache.shape[-1]
        a_cache[0] = fill(a11, aw)
        a_cache[1] = fill(a12, aw)
        a_cache[2] = fill(a22, aw)
        a_cache[3] = fill(validf / jnp.where(solvable, det, 1.0), aw)
        out_tile[0] = fill(min_eig, aw)
        out_tile[1] = fill(validf, aw)
        ds_ = pltpu.make_async_copy(out_tile, stats_hbm, sems.at[3])
        ds_.start()
        ds_.wait()

    fx_w = flow_scratch[0, :, c0:c0 + etw]
    fy_w = flow_scratch[1, :, c0:c0 + etw]
    if mode == "no_warp":
        dma = pltpu.make_async_copy(
            next_hbm.at[pl.ds(0, win_scratch.shape[0]),
                        pl.ds(0, win_scratch.shape[1])],
            win_scratch, sems.at[2])
        dma.start()
        dma.wait()
        jw = grad_cache[2, :, :etw]
    else:
        jw = _warp(next_hbm, fx_w, fy_w, -_HALO, -_HALO, win_scratch,
                   sems.at[2], h=h, w=w, pad_y=pad_y, pad_x=pad_x,
                   max_disp=max_disp, th=eth, tw=etw, local=local,
                   mode=mode, k=k)
    ix_w = grad_cache[0, :, :etw]
    iy_w = grad_cache[1, :, :etw]
    prev_w = grad_cache[2, :, :etw]
    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    if mode == "no_bsums":
        b1 = jnp.full((tile_h, tile_w), 0.5, jnp.float32)
        b2 = jnp.full((tile_h, tile_w), 0.25, jnp.float32)
        b1 = b1 + r[:tile_h, :tile_w] * 1e-9   # keep r live
    else:
        b1 = _boxsum_tile_mxu(ix_w * r, win_k, tile_h, tile_w)
        b2 = _boxsum_tile_mxu(iy_w * r, win_k, tile_h, tile_w)
    a11 = a_cache[0, :, :tile_w]
    a12 = a_cache[1, :, :tile_w]
    a22 = a_cache[2, :, :tile_w]
    invd = a_cache[3, :, :tile_w]
    fx_t = fx_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    fy_t = fy_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    b1 = b1 + a11 * fx_t + a12 * fy_t
    b2 = b2 + a12 * fx_t + a22 * fy_t
    du = (a12 * b2 - a22 * b1) * invd
    dv = (a12 * b1 - a11 * b2) * invd
    bound = jnp.float32(max_disp)
    fx_new = jnp.clip(fx_t + du, -bound, bound)
    fy_new = jnp.clip(fy_t + dv, -bound, bound)
    fdw = flow_scratch.shape[-1]
    row0 = flow_scratch[0, _HALO:_HALO + tile_h]
    row1 = flow_scratch[1, _HALO:_HALO + tile_h]
    flow_scratch[0, _HALO:_HALO + tile_h] = jnp.concatenate(
        [row0[:, :128], fx_new, row0[:, 128 + tile_w:fdw]], axis=1)
    flow_scratch[1, _HALO:_HALO + tile_h] = jnp.concatenate(
        [row1[:, :128], fy_new, row1[:, 128 + tile_w:fdw]], axis=1)

    @pl.when(k == n_iters - 1)
    def _():
        ow = out_tile.shape[-1]

        def fill2(a):
            ext = ow - a.shape[-1]
            if ext == 0:
                return a
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], ext))], axis=-1)

        out_tile[0] = fill2(fx_new)
        out_tile[1] = fill2(fy_new)
        d = pltpu.make_async_copy(out_tile, out_hbm, sems.at[3])
        d.start()
        d.wait()


def make(mode):
    h, w = H, W
    tile_h, tile_w = h, w
    win_k, local, max_disp, n_iters = WIN_K, LOCAL, MAX_DISP, N_ITERS
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    tw_pad = -(-tile_w // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    pad_t, pad_b, pad_l, pad_r = _asym_pads(tile_h, tile_w, sh, sw,
                                            max_disp, local)
    rng = np.random.default_rng(0)
    nxt = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
    prv = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
    next_pad = jnp.pad(nxt, ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")
    prev_ext = jnp.pad(prv, ((16, 16), (128, etw_dma_p - 128 - w)),
                       mode="edge")
    win_dtype = jnp.bfloat16 if mode == "bf16_win" else jnp.float32
    if mode == "bf16_win":
        # the warp-window DMA source must match the bf16 scratch; in
        # production this would be a bf16 'next' pyramid plane (halved
        # pyrDown/prev traffic too)
        next_pad = next_pad.astype(jnp.bfloat16)
    kernel = functools.partial(
        _kernel, h=h, w=w, pad_y=pad_t, pad_x=pad_l, max_disp=max_disp,
        tile_h=tile_h, tile_w=tile_w, local=local, win_k=win_k,
        area_f=float(win_k * win_k), eig_thr=1e-4 * 1024.0, n_iters=n_iters,
        mode=mode if mode != "bf16_win" else "full",
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, tile_h, tw_pad), jnp.float32),
            jax.ShapeDtypeStruct((2, tile_h, tw_pad), jnp.float32),
        ),
        grid=(n_iters,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.HBM)),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), win_dtype),
            pltpu.VMEM((tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((3, eth, -(-etw // 128) * 128), jnp.float32),
            pltpu.VMEM((4, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, tile_h, tw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
    )

    def run(flow_init):
        buf = jnp.stack([
            jnp.pad(flow_init[..., 0], ((_HALO, _HALO), (128, etw_dma - 128 - w)),
                    mode="edge"),
            jnp.pad(flow_init[..., 1], ((_HALO, _HALO), (128, etw_dma - 128 - w)),
                    mode="edge"),
        ])
        out, stats = call(next_pad, prev_ext, buf)
        return out[:, :, :w]

    return run


def diff_time(fn, c0=20, c1=80, reps=5):
    f0 = jnp.zeros((H, W, 2), jnp.float32)

    def chained(n):
        @jax.jit
        def go(x):
            def body(i, acc):
                return acc * (1 - 1e-9) + jnp.sum(fn(x + acc * 1e-12)) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return go

    r0, r1 = chained(c0), chained(c1)
    float(r0(f0)); float(r1(f0))
    t0s, t1s = [], []
    for _ in range(reps):
        t = time.perf_counter(); float(r0(f0))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(f0))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (c1 - c0)


def main():
    modes = ["full", "no_warp", "no_warp_dma", "no_rollx", "no_rolly",
             "no_selects", "no_bsums", "bf16_win"]
    sel = os.environ.get("MODES")
    if sel:
        modes = sel.split(",")
    for m in modes:
        try:
            dt = diff_time(make(m)) * 1e3
            print(f"{m:12s} {dt:7.3f} ms/call  ({dt * 1e3 / N_ITERS:5.1f} "
                  f"us/iter)", flush=True)
        except Exception as e:  # keep surviving modes comparable
            print(f"{m:12s} ERROR {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
