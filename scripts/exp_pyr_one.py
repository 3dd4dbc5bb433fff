"""Same-process A/B: video-mode chain with build_frame_levels decimating via
pallas_pyr_down_one vs the XLA fast pyr_down.  Differential chain timing
(slope between 10- and 40-frame chains) so the tunnel RTT cancels; both
variants traced in ONE process so drift cancels too.
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
from lk_tpu.flow import pallas_kernels as pk
from lk_tpu.flow.dense import build_frame_levels, dense_flow_from_levels

H, W = 1080, 1920
C0, C1 = 10, 40
REPS = 5


def make_chain(dcfg, n):
    @jax.jit
    def run(a):
        levels0 = build_frame_levels(a, LKConfig(), dcfg)

        def step(carry, _):
            levels, acc, f = carry
            nf = f * (1.0 - 1e-6) + acc * 1e-9
            nl = build_frame_levels(nf, LKConfig(), dcfg)
            r = dense_flow_from_levels(levels, nl, LKConfig(), dcfg, (H, W))
            acc = acc * (1 - 1e-9) + jnp.sum(r.flow) * 1e-9
            return (nl, acc, nf), None

        (_, acc, _), _ = jax.lax.scan(step, (levels0, 0.0, a), None, length=n)
        return acc
    return run


def measure(runs, a):
    r0, r1 = runs
    float(r0(a)); float(r1(a))  # warm
    t0s, t1s = [], []
    for _ in range(REPS):
        t = time.perf_counter(); float(r0(a)); t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(a)); t1s.append(time.perf_counter() - t)
    dt = (min(t1s) - min(t0s)) / (C1 - C0)
    return 1.0 / dt


def main():
    rng = np.random.default_rng(3)
    a = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    jax.block_until_ready(a)
    dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)

    # variant A: as-committed (single-plane pallas pyrDown per frame)
    runs_a = (make_chain(dcfg, C0), make_chain(dcfg, C1))

    # variant B: force the XLA fast pyr_down in build_frame_levels by making
    # pyr_pair_supported report False during trace (restored after)
    orig = pk.pyr_pair_supported
    pk.pyr_pair_supported = lambda h, w: False
    try:
        runs_b = (make_chain(dcfg, C0), make_chain(dcfg, C1))
        # force trace now, under the patch
        float(runs_b[0](a)); float(runs_b[1](a))
    finally:
        pk.pyr_pair_supported = orig

    for label, runs in (("pallas-one", runs_a), ("xla-fast  ", runs_b)):
        fps = measure(runs, a)
        print(f"{label}: {fps:8.1f} fps", flush=True)
    # second pass to check drift
    for label, runs in (("pallas-one", runs_a), ("xla-fast  ", runs_b)):
        fps = measure(runs, a)
        print(f"{label}: {fps:8.1f} fps (rep2)", flush=True)


if __name__ == "__main__":
    main()
