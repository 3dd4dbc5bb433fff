"""Root-cause the 720p natural-texture EPE gate failure (VERDICT r4 item 1).

The r4 resolution curve gates 720p to 0: natural-scene mean EPE vs cv2 is
0.114 px (> 0.1) at 736x1280 effective geometry while 1080p passes at
0.0987.  This harness ablates the suspects one at a time on the SAME scene
and geometry the bench gates, and prints a per-point breakdown (percentiles
+ worst-region coordinates) so the mechanism is visible, not just the mean.

Run on the real TPU chip:  python scripts/exp_720p_natural.py
Optionally LK_ABL=NAME to run a single variant.
"""

import os
import sys

os.environ.setdefault("LK_BENCH_H", "720")
os.environ.setdefault("LK_BENCH_W", "1280")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench  # noqa: E402  (reads LK_BENCH_H/W at import)
from lk_tpu.config import DenseLKConfig

H, W = bench.H, bench.W


def epe_stats(dcfg, img, nxt, gt):
    """Like bench.epe_check but returns the full filtered EPE vector plus
    the point coordinates, so failures can be localized."""
    import cv2 as cv
    import jax
    import jax.numpy as jnp

    from lk_tpu.flow.dense import (build_frame_levels_prepadded,
                                   build_frame_levels, dense_flow_from_levels,
                                   dense_flow_from_levels_prepadded,
                                   pyramid_base_geometry, _video_level_plan)

    cfg = bench._lk_cfg()
    plan = _video_level_plan(cfg, dcfg,
                             pyramid_base_geometry(H, W, cfg, dcfg),
                             true_hw=(H, W))

    def flow_fn(a, b):
        if plan is not None:
            la = build_frame_levels_prepadded(a, cfg, dcfg, plan)
            lb = build_frame_levels_prepadded(b, cfg, dcfg, plan)
            return dense_flow_from_levels_prepadded(
                la, lb, cfg, dcfg, (H, W), plan).flow
        la = build_frame_levels(a, cfg, dcfg)
        lb = build_frame_levels(b, cfg, dcfg)
        return dense_flow_from_levels(la, lb, cfg, dcfg, (H, W)).flow

    flow = np.asarray(jax.jit(flow_fn)(jnp.asarray(img), jnp.asarray(nxt)))
    ys, xs = np.mgrid[40:H - 40:16, 40:W - 40:16]
    pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    p1, st, _ = cv.calcOpticalFlowPyrLK(
        img.astype(np.uint8), nxt.astype(np.uint8),
        pts.reshape(-1, 1, 2), None, winSize=(15, 15), maxLevel=2,
        criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    cv_flow = p1.reshape(-1, 2) - pts
    st = st.reshape(-1).astype(bool)
    gtv = gt(pts)
    cv_err = np.linalg.norm(cv_flow - gtv, axis=1)
    st &= cv_err < 1.0
    ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    epe = np.linalg.norm(ours - cv_flow, axis=1)
    our_gt = np.linalg.norm(ours - gtv, axis=1)
    return epe[st], our_gt[st], cv_err[st], pts[st], ours[st], cv_flow[st]


def report(name, dcfg, scene):
    img, nxt, gt = scene
    epe, our_gt, cv_gt, pts, ours, cvf = epe_stats(dcfg, img, nxt, gt)
    q = np.percentile(epe, [50, 90, 99, 100])
    sane = cv_gt < 0.3   # oracle-reliable subset (cv2 within 0.3 px of GT)
    print(f"{name:34s} mean={epe.mean():.4f} p50={q[0]:.4f} p90={q[1]:.4f}"
          f" p99={q[2]:.4f} max={q[3]:.3f}"
          f" | vsGT ours={our_gt.mean():.4f} cv2={cv_gt.mean():.4f}"
          f" n={len(epe)}"
          f" | sane@0.3: vs_cv2={epe[sane].mean():.4f}"
          f" keep={sane.mean():.2f}", flush=True)
    # worst 6 points: where and how wrong in each direction
    idx = np.argsort(epe)[-6:][::-1]
    for i in idx:
        print(f"    ({int(pts[i,0]):4d},{int(pts[i,1]):4d})"
              f" ours=({ours[i,0]:+.2f},{ours[i,1]:+.2f})"
              f" cv2=({cvf[i,0]:+.2f},{cvf[i,1]:+.2f}) epe={epe[i]:.3f}")
    return epe.mean()


def main():
    from lk_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    scene = bench._scene_natural(H, W, 2.6, -1.8)
    assert scene is not None, "reference PNG missing"
    only = os.environ.get("LK_ABL")

    P = dict(use_pallas_warp=True, pallas_pyramid=True)
    variants = {
        # production config (what bench.py gates) vs the exact-f32 XLA path:
        # the 720p gap (0.1135 vs 0.0747) lives INSIDE the Pallas kernels.
        "pallas_prod": DenseLKConfig(**P),
        "xla_all": DenseLKConfig(),
        # attribution: un-bf16 one rounding site at a time
        "pallas_scharr_f32": DenseLKConfig(**P, scharr_mxu=False),
        "pallas_xla_pyr": DenseLKConfig(use_pallas_warp=True,
                                        pallas_pyramid=False),
        # schedule levers on the production path
        "pallas_iters_1226": DenseLKConfig(**P, iter_schedule=(1, 2, 2, 6)),
        "pallas_iters_1126": DenseLKConfig(**P, iter_schedule=(1, 1, 2, 6)),
        "pallas_iters_2116": DenseLKConfig(**P, iter_schedule=(2, 1, 1, 6)),
        # same 736x1280 base + Pallas grads kernels, but per-call chain with
        # XLA upsample glue (no in-kernel MXU coarse upsample, no plan pads)
        "pallas_no_chain": DenseLKConfig(**P, fused_coarse_chain=False),
        # warp-only Pallas + XLA scharr/box-sums (isolates in-kernel grads)
        "pallas_no_grads": DenseLKConfig(**P, fused_grads_in_kernel=False),
        # warp-clamp reach: the (3,4,5,5) schedule allows only +-3 px around
        # the tile reference at L0 — the natural gate's 3.16 px shift sits
        # outside it wherever the coarse init contributed nothing (sky)
        "pallas_local_44455": DenseLKConfig(
            **P, warp_local_schedule=(4, 4, 5, 5)),
        "pallas_local_45555": DenseLKConfig(
            **P, warp_local_schedule=(4, 5, 5, 5)),
        "pallas_local_55555": DenseLKConfig(
            **P, warp_local_schedule=(5, 5, 5, 5)),
    }
    for name, dcfg in variants.items():
        if only and name != only:
            continue
        try:
            report(name, dcfg, scene)
        except Exception as e:  # geometry-gated variants may fall through
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
