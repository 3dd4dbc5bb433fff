"""Benchmark: dense pyramidal LK at 1080p, frames/sec/chip (+ EPE gates).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's only measured number — 27 fps
for its full pipeline on a desktop CPU (BASELINE.md; vps.png overlay).

Accuracy gate (r5 dual form, see epe_check): the reported throughput only
counts if the WORST of six terms stays under 0.1 px — per-scene
(translation / zoom+rotation / real-photograph) mean EPE vs OpenCV's
calcOpticalFlowPyrLK on oracle-reliable points AND vs exact ground
truth; otherwise the benchmark reports 0.
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
from lk_tpu.flow.dense import (build_frame_levels,
                               build_frame_levels_prepadded,
                               dense_flow_from_levels,
                               dense_flow_from_levels_prepadded,
                               dense_pyramidal_lk, pyramid_base_geometry,
                               _video_level_plan)

# The shipped benchmark is 1080p; LK_BENCH_H/W exist for the measured
# streams-vs-resolution curve in BENCH_NOTES (e.g. 272x480 for the 270p
# datum) — the driver always runs the default geometry.
H = int(os.environ.get("LK_BENCH_H", "1080"))
W = int(os.environ.get("LK_BENCH_W", "1920"))
# Measured on v5e: batch 1 is fastest per frame (batched 3-D stencils lower
# poorly, and even row-folded batches scale sublinearly on this backend).
BATCH = int(os.environ.get("LK_BENCH_BATCH", "1"))
REPS = int(os.environ.get("LK_BENCH_REPS", "8"))
# Video mode (default): a lax.scan carries each frame's pyramid to the next
# step so every frame is padded/decimated ONCE — the production streaming
# form (cv.buildOpticalFlowPyramid is OpenCV's same reuse affordance).
# LK_BENCH_VIDEO=0 measures the standalone per-pair call instead.
VIDEO = int(os.environ.get("LK_BENCH_VIDEO", "1")) == 1 and BATCH == 1
BASELINE_FPS = 27.0  # reference full pipeline on CPU (BASELINE.md)

# LKConfig override hook for experiment scripts (e.g. window sweeps): set
# bench.LK_OVERRIDES = {"win_size": (21, 21)} before calling
# epe_check/throughput.  NOTE a "max_level" override here is a silent no-op
# on every dense path: DenseLKConfig.pyramid_levels (default 4) overwrites
# it in flow/dense._effective_cfg — sweep depth via
# DenseLKConfig(pyramid_levels=N) instead (pyramid_levels=0 honors
# max_level).  The shipped bench always runs the production LKConfig()
# (empty overrides).
LK_OVERRIDES: dict = {}


def _lk_cfg() -> LKConfig:
    return LKConfig(**LK_OVERRIDES) if LK_OVERRIDES else LKConfig()


def default_chains() -> tuple[int, int]:
    """Differential-timing chain lengths (C0, C1), honoring
    LK_BENCH_CHAIN0/1 overrides.

    Defaults: 12/36 at 1080p (both divisible by the production
    video_chunk=4 and by 3/6/12 for chunk sweeps), scaled UP with
    geometry so the run-length DIFFERENCE stays >> the multi-ms axon RTT
    drift at sub-1080p sizes — at 270p the 1080p chains are ~1.3 ms of
    device time and the slope measures tunnel noise (r5 curve
    re-measure saw 17.7k vs 30.9k fps run-to-run; scaled chains agree
    within 1.5%)."""
    scale = max(1, (1080 * 1920) // (H * W))
    c0_default = -(-12 * scale // 4) * 4
    c0 = int(os.environ.get("LK_BENCH_CHAIN0", str(c0_default)))
    c1 = int(os.environ.get("LK_BENCH_CHAIN1", str(3 * c0_default)))
    return c0, c1


def measure_tunnel_s() -> float:
    """Per-fetch round-trip via the axon tunnel, measured (a trivial jit +
    scalar fetch; ~24-33 ms depending on session).  Subtracting a stale
    constant skews per-frame time by (error / chain) per frame."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))  # warm
    reps = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(x))
        reps.append(time.perf_counter() - t0)
    return sorted(reps)[len(reps) // 2]


def _texture(rng, h, w):
    import cv2 as cv

    img = rng.random((h, w)).astype(np.float32) * 255
    img = cv.GaussianBlur(img, (0, 0), 2.0)
    img += cv.GaussianBlur(
        rng.random((h, w)).astype(np.float32) * 255, (0, 0), 8.0
    )
    return (img - img.min()) / (img.max() - img.min()) * 255


def _scene(rng, h, w, dx, dy):
    """Pure-translation scene: the lateral pan / small ego-motion regime."""
    import cv2 as cv

    img = _texture(rng, h, w)
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                        borderMode=cv.BORDER_REFLECT_101)
    gt = lambda pts: np.broadcast_to(  # noqa: E731
        np.float32([dx, dy]), pts.shape)
    return img.astype(np.float32), nxt, gt


def _scene_natural(h, w, dx, dy):
    """Real-photograph texture: the reference's own dashcam frame
    (/root/reference/GRMN0307.png live-window capture, client area measured
    in tests/test_natural_image.py), upscaled to the bench geometry and
    shifted.  Blurred noise flatters the residual clamp; asphalt/sky/cars
    are the textures the pipeline actually ships on.  Returns None when the
    reference tree is absent (the gate then runs the synthetic scenes only).
    """
    import cv2 as cv

    path = "/root/reference/GRMN0307.png"
    if not os.path.exists(path):
        return None
    img = cv.imread(path)
    frame = cv.cvtColor(img[41:524, 871:1731], cv.COLOR_BGR2GRAY)
    img = cv.resize(frame, (w, h), interpolation=cv.INTER_CUBIC)
    img = img.astype(np.float32)
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                        borderMode=cv.BORDER_REFLECT_101)
    gt = lambda pts: np.broadcast_to(  # noqa: E731
        np.float32([dx, dy]), pts.shape)
    return img, nxt, gt


def _scene_zoom(rng, h, w, scale, angle_deg):
    """Divergent-flow scene: zoom about the frame center plus a slight
    rotation — the forward dashcam ego-motion regime where the Pallas
    residual clamp (local window) is the known weak spot (BENCH_NOTES.md
    accuracy envelope).  Gating on this scene keeps perf changes honest
    for exactly the motion the reference pipeline exists to track
    (/root/reference/LK_Final.py:94-96 forward-motion flow lines)."""
    import cv2 as cv

    img = _texture(rng, h, w)
    m = cv.getRotationMatrix2D((w / 2.0, h / 2.0), angle_deg, scale)
    nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                        borderMode=cv.BORDER_REFLECT_101)

    def gt(pts):
        ones = np.ones((len(pts), 1), np.float32)
        return (np.concatenate([pts, ones], 1) @ m.T.astype(np.float32)
                - pts)

    return img.astype(np.float32), nxt, gt


def epe_check(dcfg: "DenseLKConfig", img, nxt, gt=None):
    """Accuracy of the production program on one (img, nxt) scene pair:
    returns (mean EPE vs cv.calcOpticalFlowPyrLK on oracle-reliable
    points, mean EPE vs exact ground truth on cv2-successful points).

    Runs at the SAME 1080p geometry the throughput measures, so the gate
    exercises the identical compiled program including the pad-and-crop
    path (1080 -> 1088 rows) and the production tile sizes.

    gt: callable pts -> (N, 2) exact ground-truth flow.  The parity term
    counts only points where the ORACLE itself is within 0.3 px of the
    exact answer.  Why 0.3 (r5; was 1.0): on the natural scene cv2's own
    mean error vs ground truth is 0.118 px — MORE than the 0.1 gate — and
    at the old filter every one of the top-8 'errors' was a point where
    this implementation sits within ~0.1 px of truth while cv2 is
    0.85-1.0 px off (scripts/exp_720p_natural.py per-point dumps).  A
    vs-cv2 mean over such points measures oracle noise, and converging
    CLOSER to truth pushes it UP.  The filter keeps ~92% of natural-scene
    points (~100% synthetic).  So parity can't hide absolute drift, the
    second term bounds EPE vs exact ground truth over ALL cv2-successful
    points with the same 0.1 limit — strictly tighter than the old gate
    in the absolute-accuracy direction (gt=None: parity term only, no
    sanity filter)."""
    import cv2 as cv

    if VIDEO:
        # Gate the per-frame prepadded chain.  When video_chunk > 1 the
        # throughput path runs the frame-batched chunk kernels instead;
        # their per-pair bit-identity to this chain is pinned by
        # tests/test_pallas_warp.py (CPU interpret), so gating the
        # per-frame form gates the chunked program too.
        plan = _video_level_plan(
            _lk_cfg(), dcfg, pyramid_base_geometry(H, W, _lk_cfg(), dcfg),
            true_hw=(H, W))

        def flow_fn(a, b):
            if plan is not None:   # the unified-prepadded production chain
                la = build_frame_levels_prepadded(a, _lk_cfg(), dcfg, plan)
                lb = build_frame_levels_prepadded(b, _lk_cfg(), dcfg, plan)
                return dense_flow_from_levels_prepadded(
                    la, lb, _lk_cfg(), dcfg, (H, W), plan).flow
            la = build_frame_levels(a, _lk_cfg(), dcfg)
            lb = build_frame_levels(b, _lk_cfg(), dcfg)
            return dense_flow_from_levels(
                la, lb, _lk_cfg(), dcfg, (H, W)).flow
    else:
        def flow_fn(a, b):
            return dense_pyramidal_lk(a, b, _lk_cfg(), dense_cfg=dcfg).flow
    res = jax.jit(flow_fn)(jnp.asarray(img), jnp.asarray(nxt))
    flow = np.asarray(res)
    ys, xs = np.mgrid[40:H - 40:16, 40:W - 40:16]
    pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
    p1, st, _ = cv.calcOpticalFlowPyrLK(
        img.astype(np.uint8), nxt.astype(np.uint8),
        pts.reshape(-1, 1, 2), None, winSize=(15, 15), maxLevel=2,
        criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    cv_flow = p1.reshape(-1, 2) - pts
    st = st.reshape(-1).astype(bool)
    ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
    if gt is None:
        return float(np.linalg.norm(ours[st] - cv_flow[st], axis=1).mean())
    gtv = gt(pts)
    sane = st & (np.linalg.norm(cv_flow - gtv, axis=1) < 0.3)
    epe_cv = float(np.linalg.norm(ours[sane] - cv_flow[sane], axis=1).mean())
    epe_gt = float(np.linalg.norm(ours[st] - gtv[st], axis=1).mean())
    return epe_cv, epe_gt


def throughput(dcfg: "DenseLKConfig") -> float:
    rng = np.random.default_rng(3)
    if BATCH == 1:
        prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
        nxt = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    else:
        prev = jnp.asarray(
            (rng.random((BATCH, H, W)) * 255).astype(np.float32)
        )
        nxt = jnp.asarray(
            (rng.random((BATCH, H, W)) * 255).astype(np.float32)
        )
    if BATCH == 1:
        fn = lambda a, b: dense_pyramidal_lk(  # noqa: E731
            a, b, _lk_cfg(), dense_cfg=dcfg
        ).flow
    else:
        from lk_tpu.flow.dense import dense_pyramidal_lk_batched

        fn = jax.jit(
            lambda a, b: dense_pyramidal_lk_batched(
                a, b, _lk_cfg(), dense_cfg=dcfg
            )
        )

    # Differential timing: chain C0 and C1 frames inside one jit each and
    # take the SLOPE between the two chain lengths.  The ~24-35 ms axon
    # fetch round trip (harness artifact; production runs scan on-device)
    # cancels exactly in the subtraction, making the statistic immune to
    # the RTT drift that skewed fixed-constant subtraction by up to ±10%
    # (measured round 2: the constant moves several ms within one process).
    # min-of-reps: RTT noise is one-sided (positive outliers only).
    c0, c1 = default_chains()

    def chained(n):
        if VIDEO:
            plan = _video_level_plan(
                _lk_cfg(), dcfg,
                pyramid_base_geometry(H, W, _lk_cfg(), dcfg),
                true_hw=(H, W))

            kc = dcfg.video_chunk
            if plan is not None and kc > 1:
                # frame-batched chunks: each scan step generates its K+1
                # frames from the carried frame (same fresh-frame fma the
                # per-frame harness pays per step) and solves K pairs in
                # one launch per level; chunks chain through acc
                from lk_tpu.flow.dense import dense_flow_chunk_prepadded

                assert n % kc == 0, (
                    f"chain length {n} not divisible by video_chunk={kc}; "
                    "set LK_BENCH_CHAIN0/1 to multiples")
                scales = jnp.asarray(
                    (1.0 - 1e-6) ** np.arange(kc + 1), jnp.float32)

                @jax.jit
                def run(a, b):
                    def cstep(carry, _):
                        f, acc = carry
                        stack = f[None] * scales[:, None, None] + acc * 1e-9
                        r = dense_flow_chunk_prepadded(
                            stack, _lk_cfg(), dcfg, (H, W), plan)
                        acc = acc * (1 - 1e-9) + jnp.sum(r.flow) * 1e-9
                        return (stack[-1], acc), None

                    (_, acc), _ = jax.lax.scan(
                        cstep, (a, 0.0), None, length=n // kc)
                    return acc
                return run

            def build(f):
                if plan is not None:
                    return build_frame_levels_prepadded(
                        f, _lk_cfg(), dcfg, plan)
                return build_frame_levels(f, _lk_cfg(), dcfg)

            def flow_step(levels, nl):
                if plan is not None:
                    return dense_flow_from_levels_prepadded(
                        levels, nl, _lk_cfg(), dcfg, (H, W), plan)
                return dense_flow_from_levels(
                    levels, nl, _lk_cfg(), dcfg, (H, W))

            @jax.jit
            def run(a, b):
                levels0 = build(a)

                def step(carry, _):
                    levels, acc, f = carry
                    nf = f * (1.0 - 1e-6) + acc * 1e-9  # fresh frame/step
                    nl = build(nf)
                    r = flow_step(levels, nl)
                    acc = acc * (1 - 1e-9) + jnp.sum(r.flow) * 1e-9
                    return (nl, acc, nf), None

                (_, acc, _), _ = jax.lax.scan(
                    step, (levels0, 0.0, a), None, length=n)
                return acc
            return run

        @jax.jit
        def run(a, b):
            def body(i, acc):
                return acc + jnp.sum(fn(a + acc * 1e-12, b))
            return jax.lax.fori_loop(0, n, body, 0.0)
        return run

    run0, run1 = chained(c0), chained(c1)
    # compile + warm TWICE: the device/tunnel warms across the first few
    # executions (serve walls measured up to +30% cold-to-warm), and the
    # driver's one-process run otherwise inherits the cold state — r4's
    # driver artifact sat ~10% under the same-process A/B range
    for _ in range(2):
        float(run0(prev, nxt))
        float(run1(prev, nxt))
    t0s, t1s = [], []
    for _ in range(REPS):
        t = time.perf_counter()
        float(run0(prev, nxt))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter()
        float(run1(prev, nxt))
        t1s.append(time.perf_counter() - t)
    dt = (min(t1s) - min(t0s)) / (c1 - c0)
    return BATCH / max(dt, 1e-9)


def main():
    pallas = os.environ.get("LK_BENCH_PALLAS", "1") == "1"
    dcfg = DenseLKConfig(use_pallas_warp=pallas, pallas_pyramid=pallas)
    rng = np.random.default_rng(1234)
    # Gate on the WORST of two regimes: pure translation (lateral pan) and
    # zoom+rotation (forward dashcam ego-motion — divergent flow, where the
    # local residual clamp is the known weak spot).  A perf change that
    # hurts only divergent flow can no longer sail through.
    st, sz = _scene(rng, H, W, 3.7, -2.2), _scene_zoom(rng, H, W, 1.004, 0.3)
    epe_t, gt_t = epe_check(dcfg, st[0], st[1], gt=st[2])
    epe_z, gt_z = epe_check(dcfg, sz[0], sz[1], gt=sz[2])
    nat = _scene_natural(H, W, 2.6, -1.8)
    epe_n, gt_n = epe_check(dcfg, nat[0], nat[1], gt=nat[2]) if nat \
        else (0.0, 0.0)
    # Dual gate (see epe_check): parity with the oracle where the oracle
    # is reliable AND absolute accuracy vs exact ground truth, worst
    # scene, worst term.
    epe = max(epe_t, epe_z, epe_n, gt_t, gt_z, gt_n)
    fps = throughput(dcfg) if epe < 0.1 else 0.0
    print(json.dumps({
        # vs_baseline is apples-to-oranges by necessity: the reference
        # publishes exactly one number — 27 fps for its SPARSE 20-point
        # full pipeline on a desktop CPU (BASELINE.md; vps.png overlay) —
        # while this measures DENSE per-pixel flow at 1080p.  The metric
        # string names the baseline workload so the artifact carries the
        # caveat itself.
        "metric": "dense_pyramidal_lk_1080p_fps_per_chip"
                  " (epe vs_cv2|vs_groundtruth px:"
                  f" shift={epe_t:.4f}|{gt_t:.4f}"
                  f" zoom+rot={epe_z:.4f}|{gt_z:.4f}"
                  f" natural={epe_n:.4f}|{gt_n:.4f},"
                  " gate=worst-of-all<0.1, cv2 terms on oracle-sane pts"
                  " [cv2 within 0.3px of truth; cv2's own natural-scene"
                  " error is 0.118px];"
                  " vs_baseline ref=27fps sparse 20-pt CPU pipeline"
                  " — generous: dense-vs-sparse workloads differ)",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
