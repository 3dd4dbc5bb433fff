"""A/B the fused coarse chain (in-kernel flow upsample) at 1080p on TPU."""
import dataclasses
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
from lk_tpu.flow.dense import dense_pyramidal_lk

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


def main():
    rng = np.random.default_rng(3)
    prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    cfg = LKConfig()
    for chain in (False, True, False, True):
        dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True,
                             fused_coarse_chain=chain)
        ms = diff_time(
            lambda a, b: dense_pyramidal_lk(a, b, cfg, dense_cfg=dcfg).flow,
            (prev, nxt)) * 1e3
        print(f"chain={int(chain)}  {ms:7.3f} ms/frame  ({1e3 / ms:6.1f} fps)")


if __name__ == "__main__":
    main()
