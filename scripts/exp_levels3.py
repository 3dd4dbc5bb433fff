"""Round-3 per-level breakdown of the dense video step on the real TPU.

Where do the ~653 us/frame go?  Differential chain timing (slope between
two chain lengths — the axon tunnel RTT drifts within a process, never
subtract a sampled constant) of:
  * each fused level kernel at its production geometry,
  * the same kernel at half tile height (2x grid steps -> per-step fixed
    cost from the slope),
  * pyrDown per level,
  * the full video-mode step for cross-checking the sum.
Usage: python scripts/exp_levels3.py [all|l0|l1|l2|pyr|video|fixed]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

from lk_tpu.config import DenseLKConfig, LKConfig
from lk_tpu.flow.dense import (
    build_frame_levels, dense_flow_from_levels, pyramid_base_geometry,
)
from lk_tpu.flow.pallas_kernels import (
    make_fused_lk_level_grads, make_fused_lk_level_grads_resident,
)
from lk_tpu.ops.blur import pyr_down

H, W = 1080, 1920


def diff_time(fn, args, c0=10, c1=40, reps=5):
    def chained(n):
        @jax.jit
        def go(*a):
            def body(i, acc):
                return acc * (1 - 1e-9) + jnp.sum(
                    fn(*[x + acc * 1e-12 for x in a])) * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return go

    r0, r1 = chained(c0), chained(c1)
    float(r0(*args)); float(r1(*args))
    t0s, t1s = [], []
    for _ in range(reps):
        t = time.perf_counter(); float(r0(*args))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(*args))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (c1 - c0)


def level_fn(h, w, th, tw, n_iters, local, coarse):
    """run(prev, next, flow_or_planes) -> flow planes, at fixed geometry."""
    def f(prev, nxt, finit):
        run = make_fused_lk_level_grads(
            nxt, prev, n_iters=n_iters, min_eig_threshold=1e-4,
            max_disp=16, tile_h=th, tile_w=tw, win_k=15, local=local,
            coarse_flow=coarse, planes_out=True)
        flow, _, _ = run(finit)
        return flow
    return f


def main():
    rng = np.random.default_rng(3)
    sel = sys.argv[1] if len(sys.argv) > 1 else "all"
    mk = lambda h, w: jnp.asarray(
        (rng.random((h, w)) * 255).astype(np.float32))

    if sel in ("all", "l0", "fixed"):
        p0, n0 = mk(1088, 2048), mk(1088, 2048)
        cpl = jnp.asarray(rng.random((2, 544, 1024)).astype(np.float32))
        ms = diff_time(level_fn(1088, 2048, 272, 512, 1, 3, True),
                       (p0, n0, cpl)) * 1e3
        print(f"L0 grads+coarse th=272 tw=512 ( 16 steps): "
              f"{ms:7.3f} ms  ({ms * 1e3 / 16:5.1f} us/step)")
        f00 = jnp.zeros((1088, 2048, 2), jnp.float32)
        # fixed-cost slope: same pixels, 2x/4x step counts (zero-init mode
        # has a full-res flow DMA instead of the coarse window; slope over
        # step count still isolates the per-step floor)
        for th, tw in [(272, 512), (136, 512), (136, 256)]:
            steps = (1088 // th) * (2048 // tw)
            ms = diff_time(level_fn(1088, 2048, th, tw, 1, 3, False),
                           (p0, n0, f00)) * 1e3
            print(f"L0 grads zeroinit th={th} tw={tw} ({steps:3d} steps): "
                  f"{ms:7.3f} ms  ({ms * 1e3 / steps:5.1f} us/step)")

    if sel == "tiles":
        # bigger-tile sweep: fewer grid steps amortize the per-step fixed
        # cost and shrink the halo-column compute waste — VMEM permitting
        p0, n0 = mk(1088, 2048), mk(1088, 2048)
        cpl = jnp.asarray(rng.random((2, 544, 1024)).astype(np.float32))
        for th, tw in [(272, 512), (272, 1024), (544, 512), (544, 1024),
                       (272, 2048), (1088, 512)]:
            steps = (1088 // th) * (2048 // tw)
            try:
                ms = diff_time(level_fn(1088, 2048, th, tw, 1, 3, True),
                               (p0, n0, cpl)) * 1e3
            except Exception as e:  # VMEM overflow etc.
                print(f"L0 grads+coarse th={th} tw={tw} ({steps:3d} steps): "
                      f"FAILED {type(e).__name__}: {str(e)[:120]}")
                continue
            print(f"L0 grads+coarse th={th} tw={tw} ({steps:3d} steps): "
                  f"{ms:7.3f} ms  ({ms * 1e3 / steps:5.1f} us/step)")

    if sel in ("all", "l1", "fixed"):
        p1, n1 = mk(544, 1024), mk(544, 1024)
        cpl1 = jnp.asarray(rng.random((2, 272, 512)).astype(np.float32))
        ms = diff_time(level_fn(544, 1024, 272, 512, 1, 4, True),
                       (p1, n1, cpl1)) * 1e3
        print(f"L1 grads+coarse th=272 tw=512 (  4 steps): "
              f"{ms:7.3f} ms  ({ms * 1e3 / 4:5.1f} us/step)")

    if sel in ("all", "l2"):
        p2, n2 = mk(272, 512), mk(272, 512)
        f2 = jnp.zeros((272, 512, 2), jnp.float32)

        def l2(prev, nxt, finit):
            run = make_fused_lk_level_grads_resident(
                nxt, prev, n_iters=6, min_eig_threshold=1e-4,
                max_disp=16, win_k=15, local=5, planes_out=True)
            flow, _, _ = run(finit)
            return flow
        ms = diff_time(l2, (p2, n2, f2)) * 1e3
        print(f"L2 resident 6 iters (272x512):      {ms:7.3f} ms")

    if sel in ("all", "pyr"):
        f = mk(1088, 2048)
        ms = diff_time(lambda x: pyr_down(x, fast=True), (f,)) * 1e3
        print(f"pyrDown 1088x2048 -> 544x1024:       {ms:7.3f} ms")
        f1 = mk(544, 1024)
        ms = diff_time(lambda x: pyr_down(x, fast=True), (f1,)) * 1e3
        print(f"pyrDown 544x1024 -> 272x512:         {ms:7.3f} ms")

    if sel in ("all", "video"):
        cfg = LKConfig()
        dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
        f0 = mk(1080, 1920)
        f1r = mk(1080, 1920)

        def step(a, b):
            la = build_frame_levels(a, cfg, dcfg)
            lb = build_frame_levels(b, cfg, dcfg)
            return dense_flow_from_levels(la, lb, cfg, dcfg,
                                          (1080, 1920)).flow
        ms = diff_time(step, (f0, f1r)) * 1e3
        print(f"pair step (2x pyramid + 3 levels):   {ms:7.3f} ms")

        # video-mode per-frame: one pyramid + 3 levels (no warm start)
        def vstep(a, b):
            la = build_frame_levels(a, cfg, dcfg)
            lb = build_frame_levels(b, cfg, dcfg)
            r = dense_flow_from_levels(la, lb, cfg, dcfg, (1080, 1920))
            return r.flow

        # glue-free sum cross-check is the printout above; the bench's
        # video fps is the authoritative end-to-end number.


if __name__ == "__main__":
    main()
