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
_TUNNEL = None


def tunnel_s() -> float:
    """Measure the per-fetch round-trip directly (a trivial jit + fetch)."""
    global _TUNNEL
    if _TUNNEL is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(f(x))
        reps = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(f(x))
            reps.append(time.perf_counter() - t0)
        _TUNNEL = sorted(reps)[len(reps) // 2]
        print(f"{'tunnel round-trip':44s} {_TUNNEL * 1e3:8.3f} ms")
    return _TUNNEL


def timeit(name, make_fn, *args, chain=CHAIN):
    """make_fn(*args) -> scalar-producing jitted chained fn."""
    fn = make_fn(*args)
    float(fn(*args))  # compile+warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(fn(*args))
        reps.append((time.perf_counter() - t0 - tunnel_s()) / chain)
    ms = sorted(reps)[len(reps) // 2] * 1e3
    print(f"{name:44s} {ms:8.3f} ms/it")
    return ms


def chained(body, chain=CHAIN):
    @jax.jit
    def run(*args):
        def step(i, acc):
            out = body(*[a + acc * 1e-12 if a.dtype == jnp.float32 else a
                         for a in args])
            return acc + jnp.sum(out) * 1e-12
        return jax.lax.fori_loop(0, chain, step, 0.0)
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

    if sel("levels"):
        # budget of the production schedule's lower levels
        p1, n1 = pyr_down(prev), pyr_down(nxt)
        p2, n2 = pyr_down(p1), pyr_down(n1)
        f1 = jnp.zeros((*p1.shape, 2), jnp.float32)
        f2 = jnp.zeros((*p2.shape, 2), jnp.float32)
        d1 = DenseLKConfig(use_pallas_warp=True, outer_iters=2)
        timeit("level1 540p warp x2",
               lambda a, b, f: chained(
                   lambda x, y, g: dense_lk_level(
                       x, y, g, cfg, d1, max_disp=16).flow),
               p1, n1, f1)
        d2 = DenseLKConfig(use_pallas_fused=True, outer_iters=6)
        timeit("level2 270p fused x6",
               lambda a, b, f: chained(
                   lambda x, y, g: dense_lk_level(
                       x, y, g, cfg, d2, max_disp=8).flow),
               p2, n2, f2)

    if sel("grads"):
        # per-level budget of the PRODUCTION path (grads-in-kernel fused
        # level at every level; schedule (1,1,6), locals (3,4,5))
        import dataclasses

        p1, n1 = pyr_down(prev), pyr_down(nxt)
        p2, n2 = pyr_down(p1), pyr_down(n1)
        base = DenseLKConfig(use_pallas_fused=True)
        cases = [
            ("grads level0 1080p x1 local3", prev, nxt, 1, 32, 3, 272, 30),
            ("grads level1  540p x1 local4", p1, n1, 1, 16, 4, 272, 50),
            ("grads level2  270p x6 resident", p2, n2, 6, 8, 5, 272, 50),
            ("grads level2  270p x6 multi-tile", p2, n2, 6, 8, 5, 0, 50),
        ]
        for name, a, b, iters, disp, loc, res_h, ch in cases:
            d = dataclasses.replace(base, outer_iters=iters, warp_local=loc,
                                    fused_resident_max_h=res_h)
            f0 = jnp.zeros((*a.shape, 2), jnp.float32)
            timeit(name,
                   lambda x_, y_, g_, d=d, disp=disp, ch=ch: chained(
                       lambda x, y, g: dense_lk_level(
                           x, y, g, cfg, d, max_disp=disp).flow, chain=ch),
                   a, b, f0, chain=ch)

    if sel("pyr"):
        timeit("pyr_down 1080p -> 540p",
               lambda a: chained(pyr_down, chain=200), prev, chain=200)
        timeit("scharr 1080p",
               lambda a: chained(lambda x: scharr_derivatives(x)[0],
                                 chain=200), prev, chain=200)

    if sel("box"):
        timeit("box_sum 15x15 1080p (zero border)",
               lambda a: chained(lambda x: box_sum(x, (15, 15)), chain=200),
               prev, chain=200)
        from lk_tpu.ops.boxfilter import box_sum_matmul

        timeit("box_sum_matmul f32 15x15 1080p",
               lambda a: chained(
                   lambda x: box_sum_matmul(x, (15, 15)), chain=200),
               prev, chain=200)
        timeit("box_sum_matmul bf16 15x15 1080p",
               lambda a: chained(
                   lambda x: box_sum_matmul(
                       x, (15, 15), compute_dtype=jnp.bfloat16), chain=200),
               prev, chain=200)

    if sel("warp"):
        from lk_tpu.flow.pallas_kernels import pallas_local_warp, pick_tile_w
        tw, wp = pick_tile_w(W)
        # th=544 exceeds the 16 MB scoped-VMEM limit at this width; kept out
        for th in (64, 128, 136, 272):
            hp = -(-H // th) * th
            timeit(f"pallas_local_warp 1080p->{hp} (th={th}, tw={tw})",
                   lambda a, f, th=th, hp=hp: chained(
                       lambda x, g: pallas_local_warp(
                           jnp.pad(x, ((0, hp - H), (0, wp - W)), mode="edge"),
                           jnp.pad(g, ((0, hp - H), (0, wp - W), (0, 0)),
                                   mode="edge"),
                           max_disp=8, tile_h=th, tile_w=tw),
                       chain=100),
                   nxt, flow0, chain=100)


if __name__ == "__main__":
    main()
