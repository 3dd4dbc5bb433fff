"""Component-level timing of the dense LK path on the real TPU.

Measures each stage with the chained-reps methodology (axon tunnel:
block_until_ready is async; a host scalar fetch costs ~33 ms).
Usage: python scripts/profile_dense.py [component ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from lk_tpu.config import DenseLKConfig, LKConfig
from lk_tpu.flow.dense import dense_pyramidal_lk, dense_lk_level
from lk_tpu.ops.blur import pyr_down
from lk_tpu.ops.boxfilter import box_sum
from lk_tpu.ops.gradients import scharr_derivatives

H, W = 1080, 1920
CHAIN = 20
TUNNEL = 0.033


def timeit(name, make_fn, *args):
    """make_fn(*args) -> scalar-producing jitted chained fn."""
    fn = make_fn(*args)
    float(fn(*args))  # compile+warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        reps.append((time.perf_counter() - t0 - TUNNEL) / CHAIN)
    ms = sorted(reps)[len(reps) // 2] * 1e3
    print(f"{name:44s} {ms:8.3f} ms/it")
    return ms


def chained(body):
    @jax.jit
    def run(*args):
        def step(i, acc):
            out = body(*[a + acc * 1e-12 if a.dtype == jnp.float32 else a
                         for a in args])
            return acc + jnp.sum(out) * 1e-12
        return jax.lax.fori_loop(0, CHAIN, step, 0.0)
    return run


def main():
    want = set(sys.argv[1:])
    rng = np.random.default_rng(3)
    prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    flow0 = jnp.zeros((H, W, 2), jnp.float32)
    cfg = LKConfig()

    def sel(name):
        return not want or any(k in name for k in want)

    if sel("full"):
        dcfg = DenseLKConfig(use_pallas_warp=True)
        timeit("full pyramidal (pallas warp, sched 2,3,6)",
               lambda a, b: chained(
                   lambda x, y: dense_pyramidal_lk(x, y, cfg, dense_cfg=dcfg).flow),
               prev, nxt)
        dfus = DenseLKConfig(use_pallas_fused=True)
        timeit("full pyramidal (pallas FUSED, sched 2,3,6)",
               lambda a, b: chained(
                   lambda x, y: dense_pyramidal_lk(x, y, cfg, dense_cfg=dfus).flow),
               prev, nxt)

    if sel("level0"):
        for iters, fused in [(1, False), (2, False), (1, True), (2, True)]:
            d = DenseLKConfig(use_pallas_warp=not fused,
                              use_pallas_fused=fused, outer_iters=iters)
            label = f"level0 1080p {'fused' if fused else 'warp '} x{iters}"
            timeit(label,
                   lambda a, b, f, d=d: chained(
                       lambda x, y, g: dense_lk_level(
                           x, y, g, cfg, d, max_disp=8).flow),
                   prev, nxt, flow0)

    if sel("pyr"):
        timeit("pyr_down 1080p -> 540p",
               lambda a: chained(pyr_down), prev)
        timeit("scharr 1080p",
               lambda a: chained(lambda x: scharr_derivatives(x)[0]), prev)

    if sel("box"):
        timeit("box_sum 15x15 1080p (zero border)",
               lambda a: chained(lambda x: box_sum(x, (15, 15))), prev)

    if sel("warp"):
        from lk_tpu.flow.pallas_kernels import pallas_local_warp, pick_tile_w
        tw, wp = pick_tile_w(W)
        timeit(f"pallas_local_warp 1080p->1088 (tw={tw})",
               lambda a, f: chained(
                   lambda x, g: pallas_local_warp(
                       jnp.pad(x, ((0, 8), (0, wp - W)), mode="edge"),
                       jnp.pad(g, ((0, 8), (0, wp - W), (0, 0)), mode="edge"),
                       max_disp=8, tile_h=64, tile_w=tw)),
               nxt, flow0)


if __name__ == "__main__":
    main()
