"""Warm-start video mode: EPE vs per-pair OpenCV on real accelerating
motion, and throughput A/B (cold vs warm schedules)."""
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
import cv2 as cv

from lk_tpu.config import DenseLKConfig, LKConfig
from lk_tpu.flow.dense import (build_frame_levels, dense_flow_from_levels,
                               dense_pyramidal_lk_video)

H, W = 1080, 1920
CFG = LKConfig()


def make_video(T=10):
    rng = np.random.default_rng(42)
    img = rng.random((H, W)).astype(np.float32) * 255
    img = cv.GaussianBlur(img, (0, 0), 2.0)
    img += cv.GaussianBlur(rng.random((H, W)).astype(np.float32) * 255,
                           (0, 0), 8.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    frames = [img.astype(np.float32)]
    for t in range(T - 1):
        # accelerating, turning motion + mild zoom oscillation
        ang = 0.04 * t
        dx = (2.0 + 0.4 * t) * np.cos(ang)
        dy = (-1.5 - 0.3 * t) * np.sin(ang + 1.2)
        zoom = 1.0 + 0.002 * np.sin(0.7 * t)
        m = cv.getRotationMatrix2D((W / 2, H / 2), 0.05 * t, zoom)
        m[:, 2] += (dx, dy)
        frames.append(cv.warpAffine(
            frames[-1], m, (W, H), flags=cv.INTER_LINEAR,
            borderMode=cv.BORDER_REFLECT_101))
    return np.stack(frames)


def cv_pair_flow(a, b, pts):
    p1, st, _ = cv.calcOpticalFlowPyrLK(
        a.astype(np.uint8), b.astype(np.uint8), pts.reshape(-1, 1, 2), None,
        winSize=(15, 15), maxLevel=2,
        criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03))
    return p1.reshape(-1, 2) - pts, st.reshape(-1).astype(bool)


def epe_eval(frames, dcfg):
    vid = jax.jit(lambda f: dense_pyramidal_lk_video(f, CFG, dcfg).flow)(
        jnp.asarray(frames))
    flows = np.asarray(vid)
    ys, xs = np.mgrid[40:H - 40:24, 40:W - 40:24]
    pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    epes = []
    for t in range(frames.shape[0] - 1):
        cvf, st = cv_pair_flow(frames[t], frames[t + 1], pts)
        ours = flows[t][pts[:, 1].astype(int), pts[:, 0].astype(int)]
        epes.append(np.linalg.norm(ours[st] - cvf[st], axis=1).mean())
    return epes


def fps_chain(dcfg, n):
    @jax.jit
    def run(f0):
        levels0 = build_frame_levels(f0, CFG, dcfg)
        # the dense paths run DenseLKConfig.pyramid_levels deep, not
        # CFG.max_level (flow/dense._effective_cfg) — derive from the
        # built levels so the seed matches the real top geometry
        top = len(levels0) - 1
        h_top = levels0[top].shape[0]
        w_top = levels0[top].shape[1]
        seed0 = jnp.zeros((h_top, w_top, 2), jnp.float32)

        def step(carry, _):
            levels, seed, acc, f = carry
            nf = f * (1.0 - 1e-6) + acc * 1e-9
            nl = build_frame_levels(nf, CFG, dcfg)
            r, topf = dense_flow_from_levels(
                levels, nl, CFG, dcfg, (H, W), init_flow=seed,
                return_top_flow=True)
            acc = acc * (1 - 1e-9) + jnp.sum(r.flow) * 1e-9
            return (nl, topf, acc, nf), None

        (_, _, acc, _), _ = jax.lax.scan(
            step, (levels0, seed0, 0.0, f0), None, length=n)
        return acc
    return run


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
    frames = make_video(10)
    for warm, wt in [(False, 0), (True, 2), (True, 1), (True, 3)]:
        d = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True,
                          video_warm_start=warm, warm_top_iters=wt)
        epes = epe_eval(frames, d)
        tag = f"warm={int(warm)} top_iters={wt}"
        print(f"{tag:24s} EPE/frame: "
              + " ".join(f"{e:.4f}" for e in epes), flush=True)

    rng = np.random.default_rng(3)
    f0 = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    for wt in (6, 2, 1):
        d = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True,
                          iter_schedule=(1, 1, wt))
        ms = diff(lambda n, d=d: fps_chain(d, n), f0) * 1e3
        print(f"chain top_iters={wt}:  {ms:7.3f} ms/frame "
              f"({1e3 / ms:6.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
