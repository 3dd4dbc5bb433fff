"""Dense pyramidal LK vs ground truth and vs OpenCV per-point tracking."""

import cv2 as cv
import numpy as np

import jax
import jax.numpy as jnp

from lk_tpu.config import LKConfig
from lk_tpu.flow.dense import dense_pyramidal_lk, dense_lk_level


def _natural_image(rng, h, w):
    img = rng.random((h, w)).astype(np.float32) * 255
    img = cv.GaussianBlur(img, (0, 0), 2.0)
    img += cv.GaussianBlur(rng.random((h, w)).astype(np.float32) * 255, (0, 0), 8.0)
    img = (img - img.min()) / (img.max() - img.min()) * 255
    return img.astype(np.float32)


def _shift_image(img, dx, dy):
    m = np.float32([[1, 0, dx], [0, 1, dy]])
    return cv.warpAffine(img, m, (img.shape[1], img.shape[0]),
                         flags=cv.INTER_LINEAR, borderMode=cv.BORDER_REFLECT_101)


class TestDenseLK:
    def test_single_scale_small_shift(self, rng):
        """BASELINE.json config #1: single-scale dense LK on a frame pair."""
        img = _natural_image(rng, 480, 640)
        nxt = _shift_image(img, 0.8, -0.6)
        flow0 = jnp.zeros((480, 640, 2), jnp.float32)
        res = jax.jit(dense_lk_level)(jnp.asarray(img), jnp.asarray(nxt), flow0)
        flow = np.asarray(res.flow)
        valid = np.asarray(res.valid)
        interior = np.zeros_like(valid)
        interior[20:-20, 20:-20] = True
        m = valid & interior
        # ground truth: (-dx, -dy)? no: flow maps prev->next sampling next at
        # p+v matching prev at p, so v = -shift of content = (+0.8, -0.6)?
        # content moved by (dx,dy): next(x) = prev(x - dx) => prev(p) = next(p + dx)
        epe = np.linalg.norm(flow[m] - np.array([0.8, -0.6]), axis=1)
        assert epe.mean() < 0.05, epe.mean()

    def test_pyramidal_large_shift_epe_vs_gt(self, rng):
        img = _natural_image(rng, 480, 640)
        nxt = _shift_image(img, 9.0, 6.5)
        res = jax.jit(lambda a, b: dense_pyramidal_lk(a, b, LKConfig()))(
            jnp.asarray(img), jnp.asarray(nxt)
        )
        flow = np.asarray(res.flow)
        valid = np.asarray(res.valid)
        interior = np.zeros_like(valid)
        interior[30:-30, 30:-30] = True
        m = valid & interior
        epe = np.linalg.norm(flow[m] - np.array([9.0, 6.5]), axis=1)
        assert epe.mean() < 0.1, epe.mean()

    def test_pyramidal_vs_opencv_sparse_grid(self, rng):
        """EPE vs the reference implementation (BASELINE.json metric)."""
        img = _natural_image(rng, 240, 320)
        m = cv.getRotationMatrix2D((160, 120), 1.5, 1.02)
        nxt = cv.warpAffine(img, m, (320, 240), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        res = jax.jit(lambda a, b: dense_pyramidal_lk(a, b, LKConfig()))(
            jnp.asarray(img), jnp.asarray(nxt)
        )
        flow = np.asarray(res.flow)
        valid = np.asarray(res.valid)

        ys, xs = np.mgrid[30:210:12, 30:290:12]
        pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        p1, st, _ = cv.calcOpticalFlowPyrLK(
            img.astype(np.uint8), nxt.astype(np.uint8),
            pts.reshape(-1, 1, 2), None,
            winSize=(15, 15), maxLevel=2,
            criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03),
        )
        cv_flow = p1.reshape(-1, 2) - pts
        st = st.reshape(-1).astype(bool)
        ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
        ok = st & valid[pts[:, 1].astype(int), pts[:, 0].astype(int)]
        epe = np.linalg.norm(ours[ok] - cv_flow[ok], axis=1)
        assert ok.sum() > len(pts) * 0.8
        assert epe.mean() < 0.1, epe.mean()

    def test_video_mode_matches_per_pair(self, rng):
        """dense_pyramidal_lk_video (scanned pyramid carry) == the per-pair
        calls: only redundant pyramid recomputation is eliminated."""
        from lk_tpu.flow.dense import dense_pyramidal_lk_video

        frames = [_natural_image(rng, 96, 160)]
        for t in range(3):
            frames.append(_shift_image(frames[-1], 1.2, -0.8))
        fr = np.stack(frames)
        cfg = LKConfig(max_level=2)
        vid = dense_pyramidal_lk_video(jnp.asarray(fr), cfg)
        assert vid.flow.shape == (3, 96, 160, 2)
        for t in range(3):
            pair = dense_pyramidal_lk(
                jnp.asarray(fr[t]), jnp.asarray(fr[t + 1]), cfg)
            d = np.abs(np.asarray(vid.flow[t]) - np.asarray(pair.flow))
            assert d.max() < 1e-4, (t, d.max())
            assert bool(jnp.all(vid.valid[t] == pair.valid)), t

    def test_video_warm_start_smooth_motion(self, rng):
        """Opt-in temporal warm start tracks smooth constant motion as well
        as the cold schedule (the discontinuity failure mode is documented
        in DenseLKConfig and is why the default is off)."""
        import dataclasses

        from lk_tpu.config import DenseLKConfig
        from lk_tpu.flow.dense import dense_pyramidal_lk_video

        frames = [_natural_image(rng, 96, 160)]
        for t in range(4):
            frames.append(_shift_image(frames[-1], 1.2, -0.8))
        fr = jnp.asarray(np.stack(frames))
        cfg = LKConfig(max_level=2)
        base = DenseLKConfig()
        cold = dense_pyramidal_lk_video(fr, cfg, base)
        warm = dense_pyramidal_lk_video(
            fr, cfg,
            dataclasses.replace(base, video_warm_start=True,
                                warm_top_iters=1))
        for t in range(4):
            f = np.asarray(warm.flow[t])[16:-16, 16:-16]
            err = np.hypot(f[..., 0] - 1.2, f[..., 1] + 0.8).mean()
            cf = np.asarray(cold.flow[t])[16:-16, 16:-16]
            cerr = np.hypot(cf[..., 0] - 1.2, cf[..., 1] + 0.8).mean()
            assert err < max(0.1, cerr * 1.5), (t, err, cerr)

    def test_batched_vmap(self, rng):
        imgs = np.stack([_natural_image(rng, 96, 128) for _ in range(3)])
        nxts = np.stack([_shift_image(im, 1.5, -1.0) for im in imgs])
        fn = jax.jit(jax.vmap(lambda a, b: dense_pyramidal_lk(a, b, LKConfig()).flow))
        flows = np.asarray(fn(jnp.asarray(imgs), jnp.asarray(nxts)))
        assert flows.shape == (3, 96, 128, 2)
        err = np.abs(flows[:, 20:-20, 20:-20] - np.array([1.5, -1.0])).mean()
        assert err < 0.1, err


class TestDenseConfigSchedules:
    def test_level_schedules(self):
        from lk_tpu.config import DenseLKConfig

        d = DenseLKConfig(iter_schedule=(1, 2, 6), warp_local_schedule=(3, 4, 5),
                          outer_iters=9, warp_local=7, max_disp=32)
        assert [d.level_iters(lv) for lv in (0, 1, 2, 3)] == [1, 2, 6, 6]
        assert [d.level_local(lv) for lv in (0, 1, 2, 3)] == [3, 4, 5, 5]
        # empty schedules fall back to the scalar knobs
        d2 = DenseLKConfig(iter_schedule=(), warp_local_schedule=(),
                           outer_iters=9, warp_local=7)
        assert d2.level_iters(2) == 9 and d2.level_local(2) == 7
        assert [d.level_disp(lv) for lv in (0, 1, 2, 4)] == [32, 16, 8, 4]


def test_multistream_matches_per_stream_video(rng):
    """dense_pyramidal_lk_multistream == per-stream dense_pyramidal_lk_video
    (it is a lax.map of the same program; parity guards the carry
    threading and any future cross-stream batching)."""
    from lk_tpu.flow.dense import (dense_pyramidal_lk_multistream,
                                   dense_pyramidal_lk_video)

    n, t, h, w = 3, 4, 64, 96
    fr = np.empty((n, t, h, w), np.float32)
    for i in range(n):
        img = cv.GaussianBlur(
            (rng.random((h, w)) * 255).astype(np.float32), (0, 0), 2.0)
        for k in range(t):
            m = np.float32([[1, 0, 0.9 * k + 0.3 * i], [0, 1, -0.6 * k]])
            fr[i, k] = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                                     borderMode=cv.BORDER_REFLECT_101)
    ms = dense_pyramidal_lk_multistream(jnp.asarray(fr))
    for i in range(n):
        single = dense_pyramidal_lk_video(jnp.asarray(fr[i]))
        np.testing.assert_allclose(np.asarray(ms.flow[i]),
                                   np.asarray(single.flow), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ms.valid[i]),
                                      np.asarray(single.valid))


def test_base_prepad_only_when_plan_materializes():
    """The pyramid base pre-pad is taken ONLY when the pad-free video plan
    exists at the padded base (r5: a speculative 720->768-row pad fed
    decimated replication into the coarse search and broke the natural
    gate — see BENCH_NOTES round-5 accuracy wave)."""
    from lk_tpu.config import DenseLKConfig
    from lk_tpu.flow.dense import pyramid_base_geometry, _video_level_plan

    cfg = LKConfig()
    dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    for h, w in [(720, 1280), (544, 960), (272, 480), (1080, 1920),
                 (128, 1024), (860, 483)]:
        base = pyramid_base_geometry(h, w, cfg, dcfg)
        # the SAME plan call pyramid_base_geometry gates on (true_hw
        # included — the depth clamps must agree near the threshold)
        plan = _video_level_plan(cfg, dcfg, base, true_hw=(h, w))
        if base != (h, w):
            # any pad must come with a materialized plan
            assert plan is not None, (h, w, base)
    # the two known plan geometries keep their (thin) pads
    assert pyramid_base_geometry(1080, 1920, cfg, dcfg) == (1088, 2048)
    assert pyramid_base_geometry(720, 1280, cfg, dcfg) == (720, 1280)


def test_effective_cfg_depth_clamped_by_window():
    """cv2 caps maxLevel so the top level >= winSize; small frames must
    not build a top level smaller than the LK window (ADVICE r4)."""
    from lk_tpu.config import DenseLKConfig
    from lk_tpu.flow.dense import _effective_cfg

    cfg = LKConfig()  # win 15x15
    dcfg = DenseLKConfig()  # pyramid_levels=4
    assert _effective_cfg(cfg, dcfg, (1080, 1920)).max_level == 3
    # 64 px: 64>>3=8 < 15 -> clamp to 2 levels of halving (16 >= 15)
    assert _effective_cfg(cfg, dcfg, (64, 64)).max_level == 2
    # tiny frame: no pyramid at all
    assert _effective_cfg(cfg, dcfg, (20, 20)).max_level == 0


def test_plan_depth_agrees_with_builders_near_clamp_threshold(rng):
    """_video_level_plan must clamp depth by the TRUE frame dims like the
    builders/solvers do: at 119 true rows (padded base 128) the old code
    planned 4 levels while consumers clamped to 3 and silently solved a
    mid-plan level as the top (r5 review finding)."""
    import cv2 as cv

    from lk_tpu.config import DenseLKConfig
    from lk_tpu.flow import dense

    cfg = LKConfig()
    dcfg = DenseLKConfig(use_pallas_warp=True, pallas_pyramid=True)
    for h, w in [(119, 1024), (115, 512), (113, 256)]:
        base = dense.pyramid_base_geometry(h, w, cfg, dcfg)
        plan = dense._video_level_plan(cfg, dcfg, base, true_hw=(h, w))
        eff = dense._effective_cfg(cfg, dcfg, (h, w))
        if plan is not None:
            assert len(plan) == eff.max_level + 1, (h, w, len(plan))
    # and the video entry runs end-to-end at such a geometry (CPU path)
    h, w = 119, 256
    img = cv.GaussianBlur(
        (rng.random((h, w)) * 255).astype(np.float32), (0, 0), 2.0)
    fr = np.stack([img, np.roll(img, 1, axis=1)])
    out = dense.dense_pyramidal_lk_video(jnp.asarray(fr))
    assert out.flow.shape == (1, h, w, 2)


def test_padded_build_matches_two_step_build(rng):
    """padded_build (combined pad + offset band-matmul decimation) must
    reproduce the two-step prepadded build to f32 rounding at every
    level, and the video flows through it must match the two-step chain
    closely (the deviation class is accumulation-split rounding of the
    same bf16-input matmul taps — ~3e-5 intensity)."""
    import cv2 as cv
    import dataclasses

    from lk_tpu.config import DenseLKConfig
    from lk_tpu.flow import dense

    cfg = LKConfig(max_level=1)
    d0 = DenseLKConfig(use_pallas_fused=True, iter_schedule=(1, 4),
                       fused_coarse_chain=True, pyramid_levels=2,
                       video_chunk=0)
    dp = dataclasses.replace(d0, padded_build=True)
    h, w = 128, 1024
    plan = dense._video_level_plan(
        cfg, d0, dense.pyramid_base_geometry(h, w, cfg, d0),
        true_hw=(h, w))
    assert plan is not None
    img = cv.GaussianBlur(
        (rng.random((h, w)) * 255).astype(np.float32), (0, 0), 2.0)
    lv0 = dense.build_frame_levels_prepadded(jnp.asarray(img), cfg, d0,
                                             plan)
    lvp = dense.build_frame_levels_prepadded(jnp.asarray(img), cfg, dp,
                                             plan)
    assert len(lv0) == len(lvp)
    for a, b in zip(lv0, lvp):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3)

    # chunk build bit-identical to per-frame build within the flag
    fr = np.stack([img, np.roll(img, 2, axis=1),
                   np.roll(img, 4, axis=1)]).astype(np.float32)
    ch = dense._build_levels_padded(jnp.asarray(fr), cfg, dp, plan,
                                    batched=True)
    for i, f in enumerate(fr):
        per = dense.build_frame_levels_prepadded(jnp.asarray(f), cfg, dp,
                                                 plan)
        for lv, stack in zip(per, ch):
            np.testing.assert_array_equal(np.asarray(stack[i]),
                                          np.asarray(lv))
