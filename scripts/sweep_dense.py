"""Sweep dense-LK configs on the real TPU: fps@1080p + EPE@1080p per config.

Usage: python scripts/sweep_dense.py [quick|levels|sched]
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
from lk_tpu.flow.dense import dense_pyramidal_lk, dense_lk_level

H, W = 1080, 1920
CHAIN = 20
cfg = LKConfig()
_TUNNEL = None


def TUNNEL_S() -> float:
    """Measured per-fetch round-trip (session-dependent, 24-33 ms)."""
    global _TUNNEL
    if _TUNNEL is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(f(x))
        reps = []
        for _ in range(7):
            t0 = time.perf_counter()
            float(f(x))
            reps.append(time.perf_counter() - t0)
        _TUNNEL = sorted(reps)[len(reps) // 2]
    return _TUNNEL


def scene(rng, h, w, dx, dy):
    import cv2 as cv

    img = rng.random((h, w)).astype(np.float32) * 255
    img = cv.GaussianBlur(img, (0, 0), 2.0)
    img += cv.GaussianBlur(rng.random((h, w)).astype(np.float32) * 255,
                           (0, 0), 8.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                        borderMode=cv.BORDER_REFLECT_101)
    return img.astype(np.float32), nxt


def epe_1080(dcfg, img, nxt, cv_flow, st, pts):
    res = jax.jit(
        lambda a, b: dense_pyramidal_lk(a, b, cfg, dense_cfg=dcfg).flow
    )(jnp.asarray(img), jnp.asarray(nxt))
    flow = np.asarray(res)
    ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    return float(np.linalg.norm(ours[st] - cv_flow[st], axis=1).mean())


def time_fn(fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + jnp.sum(fn(a[0] + acc * 1e-12, *a[1:])) * 1e-12
        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    float(chained(*args))
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(chained(*args))
        reps.append((time.perf_counter() - t0 - TUNNEL_S()) / CHAIN)
    return sorted(reps)[len(reps) // 2] * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sched"
    rng = np.random.default_rng(3)
    prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    nxt_r = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))

    if mode == "levels":
        # production per-level costs (max_disp per level_disp, pallas warp)
        for lv, (h, w) in enumerate([(1080, 1920), (540, 960), (270, 480)]):
            d = DenseLKConfig(use_pallas_warp=True)
            it = d.level_iters(lv)
            disp = d.level_disp(lv)
            p = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
            n = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
            f0 = jnp.zeros((h, w, 2), jnp.float32)
            dd = __import__("dataclasses").replace(d, outer_iters=it)
            ms = time_fn(
                lambda a, b, f, dd=dd, disp=disp: dense_lk_level(
                    a, b, f, cfg, dd, max_disp=disp).flow,
                p, n, f0)
            print(f"level{lv} {h}x{w} x{it} disp{disp}: {ms:7.3f} ms")
        from lk_tpu.flow.dense import _upsample_flow
        f = jnp.zeros((540, 960, 2), jnp.float32)
        print(f"upsample 540->1080: {time_fn(lambda x: _upsample_flow(x, 1080, 1920), f):7.3f} ms")
        from lk_tpu.ops.blur import pyr_down
        print(f"pyr_down 1080p: {time_fn(pyr_down, prev):7.3f} ms")
        print(f"pyr_down 540p: {time_fn(pyr_down, jnp.zeros((540,960))):7.3f} ms")
        return

    import cv2 as cv

    def cv_oracle(img, nxt):
        ys, xs = np.mgrid[40:H - 40:16, 40:W - 40:16]
        pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        p1, st, _ = cv.calcOpticalFlowPyrLK(
            img.astype(np.uint8), nxt.astype(np.uint8), pts.reshape(-1, 1, 2),
            None, winSize=(15, 15), maxLevel=2,
            criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03))
        return pts, p1.reshape(-1, 2) - pts, st.reshape(-1).astype(bool)

    # translation (the bench-gate scene), rotation, zoom
    img_t, nxt_t = scene(np.random.default_rng(1234), H, W, 3.7, -2.2)
    base = scene(np.random.default_rng(77), H, W, 0, 0)[0]
    rot = cv.warpAffine(
        base, cv.getRotationMatrix2D((W / 2, H / 2), 0.35, 1.0), (W, H),
        flags=cv.INTER_LINEAR, borderMode=cv.BORDER_REFLECT_101)
    zm = cv.warpAffine(
        base, cv.getRotationMatrix2D((W / 2, H / 2), 0.0, 1.01), (W, H),
        flags=cv.INTER_LINEAR, borderMode=cv.BORDER_REFLECT_101)
    scenes = [("trans", img_t, nxt_t), ("rot", base, rot), ("zoom", base, zm)]
    oracles = {name: cv_oracle(a, b) for name, a, b in scenes}

    if mode == "tilesd":
        # differential timing: per-frame ms = slope between chain lengths
        # measured in ONE process — the tunnel constant cancels exactly,
        # so this is immune to RTT drift (which corrupted two sweeps)
        def time_diff(fn, *args, c0=10, c1=40, reps=7):
            def chained(n):
                @jax.jit
                def run(*a):
                    def body(i, acc):
                        return acc + jnp.sum(fn(a[0] + acc * 1e-12, *a[1:]))
                    return jax.lax.fori_loop(0, n, body, 0.0)
                return run
            r0, r1 = chained(c0), chained(c1)
            float(r0(*args)); float(r1(*args))
            t0s, t1s = [], []
            for _ in range(reps):
                t = time.perf_counter(); float(r0(*args))
                t0s.append(time.perf_counter() - t)
                t = time.perf_counter(); float(r1(*args))
                t1s.append(time.perf_counter() - t)
            return (min(t1s) - min(t0s)) / (c1 - c0) * 1e3

        for th, tw in [(0, 0), (136, 384), (272, 384), (272, 640)]:
            d = DenseLKConfig(use_pallas_warp=True,
                              fused_tile_h=th, fused_tile_w=tw)
            ms = time_diff(
                lambda a, b, d=d: dense_pyramidal_lk(
                    a, b, cfg, dense_cfg=d).flow,
                prev, nxt_r)
            print(f"tilesd ({th:4d},{tw:4d}): {ms:7.3f} ms/frame "
                  f"({1000 / ms:6.1f} fps)", flush=True)
        return

    if mode == "tiles":
        # tile geometry of the grads kernel: bigger tiles cut the ~16 us
        # fixed per-grid-step cost; EPE guards the residual-clamp margin
        for th, tw in [(0, 0), (272, 384), (272, 640), (136, 384),
                       (136, 640)]:
            d = DenseLKConfig(use_pallas_warp=True,
                              fused_tile_h=th, fused_tile_w=tw)
            ms = time_fn(
                lambda a, b, d=d: dense_pyramidal_lk(
                    a, b, cfg, dense_cfg=d).flow,
                prev, nxt_r)
            epes = []
            for name, a, b in scenes:
                pts, cvf, st = oracles[name]
                epes.append(f"{name} {epe_1080(d, a, b, cvf, st, pts):.4f}")
            print(f"tiles ({th:4d},{tw:4d}): {ms:7.3f} ms "
                  f"({1000 / ms:6.1f} fps)  EPE px: {'  '.join(epes)}",
                  flush=True)
        return

    schedules = [(2, 3, 6), (1, 3, 6), (1, 2, 6), (1, 2, 4), (2, 2, 4),
                 (1, 4, 6), (1, 3, 4), (1, 1, 6), (1, 1, 4), (1, 2, 3),
                 (1, 2, 5)]
    for sched in schedules:
        d = DenseLKConfig(use_pallas_warp=True, iter_schedule=sched)
        ms = time_fn(
            lambda a, b, d=d: dense_pyramidal_lk(a, b, cfg, dense_cfg=d).flow,
            prev, nxt_r)
        epes = []
        for name, a, b in scenes:
            pts, cvf, st = oracles[name]
            epes.append(f"{name} {epe_1080(d, a, b, cvf, st, pts):.4f}")
        print(f"sched {sched}: {ms:7.3f} ms ({1000 / ms:6.1f} fps)  "
              f"EPE px: {'  '.join(epes)}")


if __name__ == "__main__":
    main()
