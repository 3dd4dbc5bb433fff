"""A/B: prepadded unified-layout video chain vs per-call-padding chain.

Back-to-back in ONE process (the only honest comparison under the axon
tunnel), video-mode scan timing with the bench's differential chain method.
Usage: python scripts/exp_prepad.py
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
from lk_tpu.flow import dense

H, W = 1080, 1920
C0, C1 = int(os.environ.get("C0", "10")), int(os.environ.get("C1", "40"))
REPS = int(os.environ.get("REPS", "5"))


def video_chain(dcfg, prepad: bool):
    plan = (dense._video_level_plan(
        LKConfig(), dcfg, dense.pyramid_base_geometry(H, W, LKConfig(), dcfg))
        if prepad else None)
    if prepad:
        assert plan is not None

    def build(f):
        if plan is not None:
            return dense.build_frame_levels_prepadded(
                f, LKConfig(), dcfg, plan)
        return dense.build_frame_levels(f, LKConfig(), dcfg)

    def flow_step(levels, nl):
        if plan is not None:
            return dense.dense_flow_from_levels_prepadded(
                levels, nl, LKConfig(), dcfg, (H, W), plan)
        return dense.dense_flow_from_levels(levels, nl, LKConfig(), dcfg,
                                            (H, W))

    def chained(n):
        @jax.jit
        def run(a):
            levels0 = build(a)

            def step(carry, _):
                levels, acc, f = carry
                nf = f * (1.0 - 1e-6) + acc * 1e-9
                nl = build(nf)
                r = flow_step(levels, nl)
                acc = acc * (1 - 1e-9) + jnp.sum(r.flow) * 1e-9
                return (nl, acc, nf), None

            (_, acc, _), _ = jax.lax.scan(step, (levels0, 0.0, a), None,
                                          length=n)
            return acc
        return run

    return chained


def measure(chained):
    rng = np.random.default_rng(3)
    a = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    r0, r1 = chained(C0), chained(C1)
    float(r0(a)); float(r1(a))
    t0s, t1s = [], []
    for _ in range(REPS):
        t = time.perf_counter(); float(r0(a))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(a))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (C1 - C0)


def main():
    dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    # interleave A/B/A/B to cancel slow drift
    for rnd in range(2):
        for name, pre in (("percall ", False), ("prepad  ", True)):
            dt = measure(video_chain(dcfg, pre))
            print(f"[{rnd}] {name}: {dt * 1e3:7.3f} ms/frame "
                  f"({1.0 / dt:7.1f} fps)")


if __name__ == "__main__":
    main()
