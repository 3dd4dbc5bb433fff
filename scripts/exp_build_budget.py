"""Split the 1080p video-chain frame time into solve vs build+glue.

Chain A: the production chunk chain (build K+1 pyramids + solve K pairs
per step).  Chain B: same chunk solve over CONSTANT prebuilt levels
(fresh-frame fma applied to the level-0 plane only, so the program still
has a per-step data dependence but pays no decimation/padding).  The
difference bounds what a faster pyramid build could recover.

Run alone on the TPU.
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
from lk_tpu.flow.dense import (_video_level_plan, build_frame_levels_prepadded,
                               dense_flow_chunk_prepadded,
                               pyramid_base_geometry)

H, W = 1080, 1920
CFG = LKConfig()
DCFG = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
K = DCFG.video_chunk
REPS = 6


def timed(run, args, c0, c1):
    r0, r1 = run(c0), run(c1)
    for _ in range(2):
        float(r0(*args))
        float(r1(*args))
    t0s, t1s = [], []
    for _ in range(REPS):
        t = time.perf_counter(); float(r0(*args))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(*args))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (c1 - c0)


def main():
    plan = _video_level_plan(CFG, DCFG,
                             pyramid_base_geometry(H, W, CFG, DCFG),
                             true_hw=(H, W))
    assert plan is not None
    rng = np.random.default_rng(3)
    f0 = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    scales = jnp.asarray((1.0 - 1e-6) ** np.arange(K + 1), jnp.float32)

    def chain_full(n):
        @jax.jit
        def run(a):
            def cstep(carry, _):
                f, acc = carry
                stack = f[None] * scales[:, None, None] + acc * 1e-9
                r = dense_flow_chunk_prepadded(stack, CFG, DCFG, (H, W),
                                               plan)
                return (stack[-1], acc * (1 - 1e-9)
                        + jnp.sum(r.flow) * 1e-9), None

            (_, acc), _ = jax.lax.scan(cstep, (a, 0.0), None,
                                       length=n // K)
            return acc
        return run

    # prebuilt (K+1) padded level stacks, reused every step; only the L0
    # plane gets the fresh-frame fma so the solve still sees new data
    levels0 = build_frame_levels_prepadded(f0, CFG, DCFG, plan)

    def chain_solve(n):
        stacks = [jnp.stack([lv * float(s) for s in np.asarray(scales)])
                  for lv in levels0]

        @jax.jit
        def run(a):
            from lk_tpu.flow.pallas_kernels import (
                make_fused_lk_level_grads_batched,
                make_fused_lk_level_grads_resident_batched,
            )

            top = len(plan) - 1
            pt = plan[top]
            run_top = make_fused_lk_level_grads_resident_batched(
                stacks[top], (pt.h, pt.w), n_iters=pt.iters,
                min_eig_threshold=CFG.min_eig_threshold,
                max_disp=pt.disp, local=pt.local, win_k=CFG.win_size[1],
                scharr_mxu=DCFG.scharr_mxu)
            runs = []
            for level in range(top - 1, -1, -1):
                p = plan[level]
                runs.append(make_fused_lk_level_grads_batched(
                    stacks[level], (p.h, p.w),
                    min_eig_threshold=CFG.min_eig_threshold,
                    max_disp=p.disp, tile_h=p.th, tile_w=p.tw,
                    local=p.local, win_k=CFG.win_size[1],
                    write_stats=(level == 0),
                    scharr_mxu=DCFG.scharr_mxu))

            def cstep(acc, _):
                # data dependence through the tiny top seed only: the
                # constant prebuilt stacks cost no per-step build work
                seed = jnp.zeros((K, 2, pt.h, pt.w), jnp.float32) \
                    + acc * 1e-12
                flow, _, _ = run_top(seed)
                for runl in runs:
                    flow, me, va = runl(flow)
                return acc * (1 - 1e-9) + jnp.sum(flow) * 1e-9, None

            acc, _ = jax.lax.scan(cstep, 0.0, None, length=n // K)
            return acc
        return run

    dt_full = timed(chain_full, (f0,), 12, 36)
    dt_solve = timed(chain_solve, (f0,), 12, 36)
    print(f"full chain:  {dt_full*1e6:7.1f} us/frame = {1/dt_full:7.1f} fps")
    print(f"solve only:  {dt_solve*1e6:7.1f} us/frame = "
          f"{1/dt_solve:7.1f} fps")
    print(f"build+glue:  {(dt_full-dt_solve)*1e6:7.1f} us/frame "
          f"({(dt_full-dt_solve)/dt_full*100:.1f}% of frame)")


if __name__ == "__main__":
    main()
