"""Stage split of the batched serving tracker at B=64, 860x482.

Times track_points_batched_prepped truncated after each stage (the
``_stage`` ablation hook — the REAL traced program with XLA DCE pruning
later stages), so the cost of prep / window gathers / lerp+structure
tensors / refinement separates without a harness copy that can drift.

Differential chain timing; run alone on the TPU.
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

from lk_tpu.config import PipelineConfig

B = 64
H, W = 482, 860


def diff_time(fn, args, c0=10, c1=40, reps=5):
    def chained(n):
        @jax.jit
        def go(*a):
            def body(i, acc):
                # perturb ONLY the last arg: adding acc to every f32 arg
                # would re-touch the 140 MB folded pyramid per iteration
                out = fn(*a[:-1], a[-1] + acc * 1e-12)
                return acc * (1 - 1e-9) + out * 1e-9
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
    rng = np.random.default_rng(0)
    prev = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.float32))
    cfg = PipelineConfig()
    lk = dataclasses.replace(cfg.lk, pallas_windows=True, fast_pyramid=True)
    n = cfg.tp_num
    pts = jnp.asarray(
        np.stack([rng.uniform((100, 315), (700, 385), (n, 2))
                  for _ in range(B)]).astype(np.float32))
    valid = jnp.ones((B, n), bool)
    # serving's ROI row band (pipeline.step.tracker_row_band at 482p)
    row_band = (None if os.environ.get("NO_BAND") else (297, 403))

    from lk_tpu.flow.sparse import (fold_tracking_levels,
                                    track_points_batched_prepped)

    prev_folded = fold_tracking_levels(prev, lk, row_band=row_band)
    jax.block_until_ready(prev_folded)

    n_lv = len(prev_folded)

    def run(stage=None, iters=None):
        l = lk if iters is None else dataclasses.replace(lk, max_iters=iters)

        def f(*a):
            pf, nx = a[:n_lv], a[n_lv]
            out = track_points_batched_prepped(
                pf, nx, pts, valid, l, row_band=row_band, _stage=stage)
            if stage is not None:
                return out
            return jnp.sum(out[0])
        return diff_time(f, (*prev_folded, nxt)) * 1e3

    t_prep = run("prep")
    print(f"prep (next pyramid+fold):     {t_prep:7.3f} ms", flush=True)
    t_gather = run("gather")
    print(f"+ gathers (3 levels):         {t_gather:7.3f} ms "
          f"(gathers alone {t_gather - t_prep:5.3f})", flush=True)
    t_tensor = run("tensor")
    print(f"+ lerp+structure tensors:     {t_tensor:7.3f} ms "
          f"(stage alone {t_tensor - t_gather:5.3f})", flush=True)
    for it in (1, 10):
        t_full = run(iters=it)
        print(f"full tracker max_iters={it:2d}:     {t_full:7.3f} ms "
              f"(refine+finish {t_full - t_tensor:5.3f})", flush=True)


if __name__ == "__main__":
    main()
