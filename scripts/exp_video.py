"""Video-mode (pyramid-reuse) throughput vs per-pair at 1080p on TPU."""
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
from lk_tpu.flow.dense import (build_frame_levels, dense_flow_from_levels,
                               dense_pyramidal_lk)

H, W = 1080, 1920
CFG = LKConfig()
DCFG = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)


def video_chain(n):
    """Scan n synthetic frames; returns a scalar (pyramid carried)."""
    @jax.jit
    def go(frame0):
        levels0 = build_frame_levels(frame0, CFG, DCFG)

        def step(carry, i):
            levels, acc, f = carry
            nxt_frame = f * (1.0 - 1e-6) + acc * 1e-9   # new frame each step
            nxt = build_frame_levels(nxt_frame, CFG, DCFG)
            res = dense_flow_from_levels(levels, nxt, CFG, DCFG, (H, W))
            acc = acc * (1 - 1e-9) + jnp.sum(res.flow) * 1e-9
            return (nxt, acc, nxt_frame), None

        (_, acc, _), _ = jax.lax.scan(
            step, (levels0, 0.0, frame0), None, length=n)
        return acc
    return go


def pair_chain(n):
    @jax.jit
    def go(frame0):
        def step(carry, i):
            acc, f = carry
            nxt = f * (1.0 - 1e-6) + acc * 1e-9
            res = dense_pyramidal_lk(f, nxt, CFG, dense_cfg=DCFG)
            acc = acc * (1 - 1e-9) + jnp.sum(res.flow) * 1e-9
            return (acc, nxt), None

        (acc, _), _ = jax.lax.scan(step, (0.0, frame0), None, length=n)
        return acc
    return go


def diff(make, f0, c0=10, c1=40, reps=5):
    r0, r1 = make(c0), make(c1)
    float(r0(f0)); float(r1(f0))
    t0s, t1s = [], []
    for _ in range(reps):
        t = time.perf_counter(); float(r0(f0))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(f0))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (c1 - c0)


def main():
    rng = np.random.default_rng(3)
    f0 = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    for name, make in [("pair (rebuilds pyramids)", pair_chain),
                       ("video (pyramid carried)", video_chain)]:
        ms = diff(make, f0) * 1e3
        print(f"{name:28s} {ms:7.3f} ms/frame  ({1e3 / ms:6.1f} fps)",
              flush=True)


if __name__ == "__main__":
    main()
