"""Quantify XLA glue around the fused levels in dense_pyramidal_lk."""
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
from lk_tpu.flow.dense import dense_pyramidal_lk, _upsample_flow

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
    dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    cfg = LKConfig()

    ms = diff_time(
        lambda a, b: dense_pyramidal_lk(a, b, cfg, dense_cfg=dcfg).flow,
        (prev, nxt)) * 1e3
    print(f"full pyramidal          {ms:7.3f} ms/frame  ({1e3 / ms:6.1f} fps)")

    f1 = jnp.asarray(rng.random((544, 1024, 2)).astype(np.float32))
    ms = diff_time(lambda f: _upsample_flow(f, 1088, 2048), (f1,),
                   c0=40, c1=160) * 1e3
    print(f"upsample L1->L0 (+moveaxis x2) {ms:7.3f} ms")
    f2 = jnp.asarray(rng.random((272, 512, 2)).astype(np.float32))
    ms = diff_time(lambda f: _upsample_flow(f, 544, 1024), (f2,),
                   c0=40, c1=160) * 1e3
    print(f"upsample L2->L1 (+moveaxis x2) {ms:7.3f} ms")

    # the kernel-side plane split/join cost: moveaxis alone
    f0 = jnp.asarray(rng.random((1088, 2048, 2)).astype(np.float32))
    ms = diff_time(lambda f: jnp.stack([f[..., 0], f[..., 1]]), (f0,),
                   c0=40, c1=160) * 1e3
    print(f"split (1088,2048,2)->(2,..)    {ms:7.3f} ms")
    g0 = jnp.asarray(rng.random((2, 1088, 2048)).astype(np.float32))
    ms = diff_time(lambda f: jnp.moveaxis(f, 0, -1) * 1.0, (g0,),
                   c0=40, c1=160) * 1e3
    print(f"join (2,1088,2048)->(...,2)    {ms:7.3f} ms")


if __name__ == "__main__":
    main()
