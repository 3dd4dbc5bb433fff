"""Post-chain sweep: tile geometry + L0 warp_local, fps + EPE guards."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import cv2 as cv

from lk_tpu.config import DenseLKConfig, LKConfig
from lk_tpu.flow.dense import dense_pyramidal_lk
from sweep_dense import scene, epe_1080, H, W


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


def cv_oracle(img, nxt):
    ys, xs = np.mgrid[40:H - 40:16, 40:W - 40:16]
    pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    p1, st, _ = cv.calcOpticalFlowPyrLK(
        img.astype(np.uint8), nxt.astype(np.uint8), pts.reshape(-1, 1, 2),
        None, winSize=(15, 15), maxLevel=2,
        criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03))
    return pts, p1.reshape(-1, 2) - pts, st.reshape(-1).astype(bool)


def main():
    rng = np.random.default_rng(3)
    prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    cfg = LKConfig()

    img_t, nxt_t = scene(np.random.default_rng(1234), H, W, 3.7, -2.2)
    base_img = scene(np.random.default_rng(77), H, W, 0, 0)[0]
    zm2 = cv.warpAffine(
        base_img, cv.getRotationMatrix2D((W / 2, H / 2), 0.0, 1.02), (W, H),
        flags=cv.INTER_LINEAR, borderMode=cv.BORDER_REFLECT_101)
    scenes = [("trans", img_t, nxt_t), ("zoom2", base_img, zm2)]
    oracles = {n: cv_oracle(a, b) for n, a, b in scenes}

    base = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    cases = [
        ("base 272x512 (3,4,5)", {}),
        ("tile 544x512", {"fused_tile_h": 544}),
        ("tile 272x1024", {"fused_tile_w": 1024}),
        ("tile 544x1024", {"fused_tile_h": 544, "fused_tile_w": 1024}),
        ("locals (2,4,5)", {"warp_local_schedule": (2, 4, 5)}),
        ("locals (2,3,5)", {"warp_local_schedule": (2, 3, 5)}),
    ]
    for name, over in cases:
        d = dataclasses.replace(base, **over)
        try:
            ms = diff_time(
                lambda a, b, d=d: dense_pyramidal_lk(
                    a, b, cfg, dense_cfg=d).flow, (prev, nxt)) * 1e3
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__} {str(e)[:120]}")
            continue
        epes = []
        for sname, a, b in scenes:
            pts, cvf, st = oracles[sname]
            epes.append(f"{sname} {epe_1080(d, a, b, cvf, st, pts):.4f}")
        print(f"{name:22s} {ms:7.3f} ms ({1e3 / ms:6.1f} fps)  "
              f"EPE: {'  '.join(epes)}", flush=True)


if __name__ == "__main__":
    main()
