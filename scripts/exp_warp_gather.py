"""A/B: tent-gather select chains vs tpu.dynamic_gather warp selects.

The round-3 L0 ablation budget (scripts/exp_l0_ablate.py) puts the warp
compute at 7.4 us of the 18.8 us tile step — the biggest single item —
all of it VPU equality-select chains (7 compares + 14 selects per pass at
local=3).  Mosaic lowers 2-D same-shape `jnp.take_along_axis` to
`tpu.dynamic_gather` on either axis (jax 0.9 lowering.py:2464-2524),
which replaces each pass's whole chain with TWO per-element gathers
(win[i+di], win[i+di+1]) + the same lerp — and can additionally fold the
window alignment remainders INTO the gather indices, deleting the dynamic
lane roll and/or the 3 static-bit sublane roll+selects.

Variants (all bit-identical taps + identical two-term lerp => outputs
must equal the base warp EXACTLY; the check asserts this):
  base           — production _warp_finish (select chains)
  gather         — rolls kept, chains -> 2 gathers/pass
  gather_noyroll — sublane roll trio folded into the vertical idx
  gather_noroll  — both rolls folded into the gather idx (wider v-pass)

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

from lk_tpu.flow.pallas_kernels import _HALO, _asym_pads, _win_shape
from scripts.exp_l0_ablate import (
    H, W, TILE_H, TILE_W, LOCAL, MAX_DISP, N_ITERS, _kernel,
)

WIN_K = 15


def _dg(a, idx, axis):
    # clamp keeps every lane in-bounds (padded rows/cols gather garbage
    # that the caller slices away)
    hi = a.shape[axis] - 1
    return jnp.take_along_axis(a, jnp.clip(idx, 0, hi), axis=axis)


def _tent_dg(win, rel, axis, out_len, local, extra=None):
    """2-tap tent via dynamic_gather: out = (1-f)*win[i+di] + f*win[i+di+1].

    rel covers the first out_len rows/cols of win along ``axis``; the rest
    of the idx plane is don't-care (clamped, sliced away).  ``extra``
    (scalar i32) folds an alignment remainder into the indices."""
    di_f = jnp.floor(rel)
    f = rel - di_f
    di = di_f.astype(jnp.int32)
    if extra is not None:
        di = di + extra
    pad = win.shape[axis] - out_len
    if pad:
        zshape = list(win.shape)
        zshape[axis] = pad
        di = jnp.concatenate(
            [di, jnp.zeros(tuple(zshape), jnp.int32)], axis=axis)
        f = jnp.concatenate(
            [f, jnp.zeros(tuple(zshape), jnp.float32)], axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, win.shape, axis) + di
    t0 = _dg(win, idx, axis)
    t1 = _dg(win, idx + 1, axis)
    out = (1.0 - f) * t0 + f * t1
    return jax.lax.slice_in_dim(out, 0, out_len, axis=axis)


def _warp_finish_gather(state, fx, fy, y0, x0, scratch, mode,
                        *, h, w, pad_y, pad_x, max_disp, th, tw, local):
    dma, src_y_raw, src_x_raw, src_y, src_x = state
    bound = jnp.float32(max_disp)
    extra_y = src_y_raw - src_y        # 0..7
    extra_x = src_x_raw - src_x        # 0..127

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

    dma.wait()
    win = scratch[:].astype(jnp.float32)
    vw = tw + 2 * local + 1
    wp = -(-vw // 128) * 128

    if mode == "gather":
        # same data movement as base: lane roll + sublane roll trio
        win = pltpu.roll(win, shift=-extra_x, axis=1)[:, :wp]
        for bit in (1, 2, 4):
            r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
            win = jnp.where((extra_y & bit) != 0, r, win)
        ey = ex = None
    elif mode == "gather_noyroll":
        # lane roll only; extra_y folds into the vertical gather idx
        win = pltpu.roll(win, shift=-extra_x, axis=1)[:, :wp]
        ey, ex = extra_y, None
    else:  # gather_noroll — both remainders fold into the gather indices
        wpx = -(-(vw + 127) // 128) * 128   # widest column any lane reads
        win = win[:, :wpx]
        wp = wpx
        ey, ex = extra_y, extra_x

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, wp - tw))
        return jnp.concatenate([a, tail], axis=1)

    vert = _tent_dg(win, widen(rel_y), 0, th, local, extra=ey)
    return _tent_dg(vert, rel_x, 1, tw, local, extra=ex)


def _patched_kernel(*args, warp_gather_mode, **kw):
    """exp_l0_ablate._kernel with _warp_finish swapped for the gather form
    (monkeypatched at trace time via the module global)."""
    import scripts.exp_l0_ablate as abl
    import lk_tpu.flow.pallas_kernels as pk

    del pk
    orig = abl._warp_finish
    # exp_l0_ablate._kernel references _warp_finish imported into its module
    abl._warp_finish = functools.partial(
        _warp_finish_gather, mode=warp_gather_mode)
    try:
        return _kernel(*args, **kw)
    finally:
        abl._warp_finish = orig


def build(next_img, prev_img, warp_gather_mode=None, **flags):
    h, w = next_img.shape
    tile_h, tile_w, local, win_k = TILE_H, TILE_W, LOCAL, WIN_K
    max_disp, n_iters = MAX_DISP, N_ITERS
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    pad_t, pad_b, pad_l, pad_r = _asym_pads(tile_h, tile_w, sh, sw,
                                            max_disp, local)
    next_pad = jnp.pad(next_img.astype(jnp.float32),
                       ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")
    prev_ext = jnp.pad(prev_img.astype(jnp.float32), ((16, 16), (128, 256)),
                       mode="edge")
    gy = _HALO
    hext = h + 2 * gy
    wext = w + 128 + 256
    n_ty = h // tile_h
    n_tx = w // tile_w
    grid = (n_iters, n_ty, n_tx)
    tw_pad = -(-tile_w // 128) * 128
    if warp_gather_mode is None:
        kernel = functools.partial(
            _kernel, h=h, w=w, pad_y=pad_t, pad_x=pad_l, max_disp=max_disp,
            tile_h=tile_h, tile_w=tile_w, local=local, win_k=win_k,
            bound_f=float(max_disp), area_f=float(win_k * win_k),
            eig_thr=1e-4 * 1024.0, n_iters=n_iters, n_ty=n_ty, n_tx=n_tx,
            merge_stats=True, **flags,
        )
    else:
        kernel = functools.partial(
            _patched_kernel, warp_gather_mode=warp_gather_mode,
            h=h, w=w, pad_y=pad_t, pad_x=pad_l, max_disp=max_disp,
            tile_h=tile_h, tile_w=tile_w, local=local, win_k=win_k,
            bound_f=float(max_disp), area_f=float(win_k * win_k),
            eig_thr=1e-4 * 1024.0, n_iters=n_iters, n_ty=n_ty, n_tx=n_tx,
            merge_stats=True, **flags,
        )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, hext, wext), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((2, tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, 2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((2, 4, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, 1, tile_h, tw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    def pad_flow(x):
        return jnp.pad(x.astype(jnp.float32), ((gy, gy), (128, 256)),
                       mode="edge")

    def run(flow_init):
        fx = pad_flow(flow_init[..., 0])
        fy = pad_flow(flow_init[..., 1])
        out, _ = call(next_pad, prev_ext, jnp.stack([fx, fy]))
        return jnp.moveaxis(out[0:2, gy:gy + h, 128:128 + w], 0, -1)

    return run


def time_variant(name, run, flow0):
    def chained(n):
        @jax.jit
        def go(f0):
            def body(i, f):
                return run(f * (1.0 - 1e-12)) * 1e-6 + f * (1 - 1e-6)
            return jnp.sum(jax.lax.fori_loop(0, n, body, f0))
        return go

    r0, r1 = chained(10), chained(40)
    float(r0(flow0)); float(r1(flow0))
    t0s, t1s = [], []
    for _ in range(5):
        t = time.perf_counter(); float(r0(flow0))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(flow0))
        t1s.append(time.perf_counter() - t)
    ms = (min(t1s) - min(t0s)) / 30 * 1e3
    print(f"{name:16s} {ms:7.3f} ms/call  ({ms / 16 * 1e3:6.1f} us/tile)",
          flush=True)
    return ms


def main():
    rng = np.random.default_rng(7)
    prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    flow0 = jnp.zeros((H, W, 2), jnp.float32)
    base = dict(do_warp=True, do_asums=True, do_bsums=True, do_scharr=True,
                boxsum_mode="blocked")
    runs = {
        "base": build(nxt, prev, **base),
        "gather": build(nxt, prev, warp_gather_mode="gather", **base),
        "gather_noyroll": build(
            nxt, prev, warp_gather_mode="gather_noyroll", **base),
        "gather_noroll": build(
            nxt, prev, warp_gather_mode="gather_noroll", **base),
    }
    # bit-parity check on a varied smooth flow BEFORE timing
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    f = np.stack([3.0 + 2.5 * np.sin(xx / 300.0) + yy / 700.0,
                  -2.0 + 1.8 * np.cos(yy / 250.0) + xx / 900.0], -1)
    fj = jnp.asarray(f)
    want = np.asarray(runs["base"](fj))
    for name in ("gather", "gather_noyroll", "gather_noroll"):
        try:
            got = np.asarray(runs[name](fj))
        except Exception as e:
            print(f"{name}: FAILED to compile/run — {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            runs.pop(name)
            continue
        d = float(np.abs(got - want).max())
        print(f"{name}: max|diff| vs base = {d}", flush=True)
        if d != 0.0:
            runs.pop(name)

    for name, run in runs.items():
        time_variant(name, run, flow0)


if __name__ == "__main__":
    main()
