"""Pallas locality-exploiting warp kernel (interpret mode on CPU).

Hardware behavior (Mosaic alignment rules, dynamic roll lane-group quirk) is
exercised on the real chip by bench/verify runs; these tests pin down the
kernel's math against the gather oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import lk_tpu.flow.pallas_kernels as pk
from lk_tpu.ops.warp import warp_by_flow


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)


class TestPallasLocalWarp:
    @pytest.mark.parametrize(
        "shift", [(0.0, 0.0), (2.5, -1.5), (31.0, 14.0), (-20.5, 9.25)]
    )
    def test_constant_flow_exact(self, rng, shift):
        h, w = 64, 768
        img = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
        flow = jnp.asarray(
            np.broadcast_to(np.array(shift, np.float32), (h, w, 2)).copy()
        )
        out = pk.pallas_local_warp(img, flow)
        ref = warp_by_flow(img, flow)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)

    def test_smooth_zoom_close(self, rng):
        h, w = 64, 768
        img = jnp.asarray(rng.random((h, w)).astype(np.float32) * 255)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        flow = jnp.asarray(
            np.stack([(xs - w / 2) * 0.02 + 3.0, (ys - h / 2) * 0.02 - 2.0],
                     -1).astype(np.float32)
        )
        out = pk.pallas_local_warp(img, flow)
        ref = warp_by_flow(img, flow)
        d = np.abs(np.asarray(out) - np.asarray(ref))
        # second-order separable error only (same class as the XLA 2-pass)
        assert d.max() < 0.05, d.max()

    def test_fused_iter_matches_xla_body(self, rng):
        """One fused IC iteration == the XLA iteration in the interior."""
        import cv2 as cv

        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow.dense import dense_lk_level

        h, w = 128, 384
        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1, 0, 2.0], [0, 1, 1.5]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        flow0 = jnp.zeros((h, w, 2), jnp.float32)
        ref = dense_lk_level(jnp.asarray(img), jnp.asarray(nxt), flow0,
                             LKConfig(), DenseLKConfig(outer_iters=1),
                             max_disp=8).flow
        fused = dense_lk_level(jnp.asarray(img), jnp.asarray(nxt), flow0,
                               LKConfig(),
                               DenseLKConfig(outer_iters=1,
                                             use_pallas_fused=True,
                                             fused_grads_in_kernel=False),
                               max_disp=8).flow
        d = np.abs(np.asarray(ref) - np.asarray(fused))
        assert d[16:-16, 16:-16].max() < 1e-3, d[16:-16, 16:-16].max()

    def test_fused_level_two_iters_matches_xla(self, rng):
        """Two fused iterations inside one pallas_call (ping-pong slots)
        == two XLA iterations in the interior."""
        import cv2 as cv

        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow.dense import dense_lk_level

        h, w = 128, 384
        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1, 0, 2.0], [0, 1, 1.5]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        flow0 = jnp.zeros((h, w, 2), jnp.float32)
        # like-for-like reference: XLA glue around the same pallas warp —
        # isolates the fusion/ping-pong mechanics from warp-implementation
        # differences (pallas local warp vs shift-select differ to second
        # order on the noisy iter-1 flow field; both are gated end-to-end
        # against OpenCV by bench.py's EPE check)
        ref = dense_lk_level(jnp.asarray(img), jnp.asarray(nxt), flow0,
                             LKConfig(),
                             DenseLKConfig(outer_iters=2,
                                           use_pallas_warp=True),
                             max_disp=8).flow
        fused = dense_lk_level(jnp.asarray(img), jnp.asarray(nxt), flow0,
                               LKConfig(),
                               DenseLKConfig(outer_iters=2,
                                             use_pallas_fused=True,
                                             fused_grads_in_kernel=False),
                               max_disp=8).flow
        d = np.abs(np.asarray(ref) - np.asarray(fused))
        # interior crop: the XLA path's per-pixel eps freeze and per-iter
        # halo re-replication differ within ~2 window radii of the edge;
        # the remaining interior difference is the eps-freeze semantics
        assert d[32:-32, 32:-32].max() < 0.1, d[32:-32, 32:-32].max()

    @pytest.mark.parametrize("scharr_mxu", [False, True])
    @pytest.mark.parametrize("iters,w", [(1, 384), (2, 384), (1, 640)])
    def test_fused_grads_kernel_matches_xla(self, rng, iters, w, scharr_mxu):
        """The self-contained kernel (Scharr + A in-kernel) == the XLA path
        in the interior, including the min_eig/valid stats outputs.
        w=384 exercises the VMEM-resident single-tile variant, w=640 the
        multi-tile ping-pong variant.  scharr_mxu=False pins the exact
        in-kernel Scharr mechanics; True additionally rounds the gradient
        data to bf16 (production default — ~0.04 px measured on 1080p
        smooth flow, r4 ablation) so its bound is looser."""
        import cv2 as cv

        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow.dense import dense_lk_level

        h = 128
        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1, 0, 2.0], [0, 1, 1.5]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        flow0 = jnp.zeros((h, w, 2), jnp.float32)
        # like-for-like reference at iters=2: XLA glue around the pallas warp
        ref_cfg = DenseLKConfig(outer_iters=iters,
                                use_pallas_warp=(iters > 1))
        ref = dense_lk_level(jnp.asarray(img), jnp.asarray(nxt), flow0,
                             LKConfig(), ref_cfg, max_disp=8)
        fused = dense_lk_level(jnp.asarray(img), jnp.asarray(nxt), flow0,
                               LKConfig(),
                               DenseLKConfig(outer_iters=iters,
                                             use_pallas_fused=True,
                                             fused_grads_in_kernel=True,
                                             scharr_mxu=scharr_mxu),
                               max_disp=8)
        c = 32
        d = np.abs(np.asarray(ref.flow) - np.asarray(fused.flow))
        # the kernel's MXU box sums round data to bf16 (~1e-2 relative by
        # design, gated end-to-end by bench.py's EPE check); the MXU scharr
        # adds gradient-data rounding on top
        tol = (0.02 if iters == 1 else 0.1) + (0.06 if scharr_mxu else 0.0)
        assert d[c:-c, c:-c].max() < tol, d[c:-c, c:-c].max()
        # A borders differ (zero vs edge) only within the window radius;
        # magnitudes carry the same bf16 rounding (plus the gradient-data
        # rounding under scharr_mxu)
        np.testing.assert_allclose(
            np.asarray(fused.min_eig)[c:-c, c:-c],
            np.asarray(ref.min_eig)[c:-c, c:-c],
            rtol=4e-2 if scharr_mxu else 2e-2,
            atol=3e-2 if scharr_mxu else 1e-2,
        )
        # validity may flip only where min_eig sits on the threshold
        vr = np.asarray(ref.valid)[c:-c, c:-c]
        vf = np.asarray(fused.valid)[c:-c, c:-c]
        assert (vf != vr).mean() < (0.02 if scharr_mxu else 0.01), (
            (vf != vr).mean())

    def test_fused_grads_pyramid_epe(self, rng):
        """Full pyramid with every level on the grads kernel tracks a known
        shift to sub-0.1 px (the bench gate's criterion, tiny geometry)."""
        import cv2 as cv

        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow.dense import dense_pyramidal_lk

        h, w = 128, 256
        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1, 0, 3.0], [0, 1, -2.0]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        res = dense_pyramidal_lk(
            jnp.asarray(img), jnp.asarray(nxt), LKConfig(max_level=2),
            dense_cfg=DenseLKConfig(use_pallas_warp=True,
                                    fused_grads_in_kernel=True,
                                    pyramid_levels=3),
        )
        flow = np.asarray(res.flow)[16:-16, 16:-16]
        err = np.hypot(flow[..., 0] - 3.0, flow[..., 1] + 2.0)
        assert err.mean() < 0.1, err.mean()

    def test_fused_coarse_chain_matches_xla_upsample(self, rng):
        """The in-kernel coarse-flow upsample chain == the per-level XLA
        upsample path (same kernels), up to the bf16 rounding of the coarse
        flow data and the halo-band border semantics."""
        import cv2 as cv

        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow.dense import dense_pyramidal_lk

        h, w = 128, 1024     # w > 512 so level 0 is multi-tile (non-resident)
        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1.003, 0.001, 2.0], [-0.001, 0.998, -1.5]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        outs = {}
        for chain in (False, True):
            # fused_tile_h=64 forces a 2x2 grid: both coarse-window DMA
            # offsets (ti, tj) exercised
            d = DenseLKConfig(use_pallas_fused=True, iter_schedule=(1, 4),
                              fused_tile_h=64, fused_coarse_chain=chain,
                              pyramid_levels=2)
            outs[chain] = np.asarray(dense_pyramidal_lk(
                jnp.asarray(img), jnp.asarray(nxt), LKConfig(max_level=1),
                dense_cfg=d).flow)
        diff = np.abs(outs[True] - outs[False])
        c = 16
        assert diff[c:-c, c:-c].max() < 0.05, diff[c:-c, c:-c].max()
        # and the chain still tracks the ground-truth affine motion
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        gx = (m[0, 0] - 1) * xs + m[0, 1] * ys + m[0, 2]
        gy = m[1, 0] * xs + (m[1, 1] - 1) * ys + m[1, 2]
        err = np.hypot(outs[True][..., 0] - gx, outs[True][..., 1] - gy)
        assert err[c:-c, c:-c].mean() < 0.1, err[c:-c, c:-c].mean()

    def test_point_window_gather_matches_dynamic_slice(self, rng):
        """track_points_batched(pallas_windows=True) == the vmapped
        dynamic_slice path bit-for-bit (same contents, pipelined DMAs)."""
        from lk_tpu.config import LKConfig
        from lk_tpu.flow.sparse import track_points_batched

        b, n, h, w = 3, 7, 96, 160
        import cv2 as cv

        prev = (rng.random((b, h, w)) * 255).astype(np.float32)
        for i in range(b):
            prev[i] = cv.GaussianBlur(prev[i], (0, 0), 1.5)
        m = np.float32([[1, 0, 1.7], [0, 1, -1.2]])
        nxt = np.stack([
            cv.warpAffine(prev[i], m, (w, h), flags=cv.INTER_LINEAR,
                          borderMode=cv.BORDER_REFLECT_101)
            for i in range(b)
        ])
        pts = np.stack([rng.uniform(20, w - 20, (b, n)),
                        rng.uniform(20, h - 20, (b, n))], -1).astype(
            np.float32)
        val = np.ones((b, n), bool)
        ref = track_points_batched(
            jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts),
            jnp.asarray(val), LKConfig())
        got = track_points_batched(
            jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts),
            jnp.asarray(val), LKConfig(pallas_windows=True))
        np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(ref[2]), np.asarray(got[2]),
                                   atol=1e-5)

    def test_band_gather_matches_point_gather(self, rng, monkeypatch):
        """make_frame_band_gather (2 DMAs per frame, in-VMEM extraction)
        == make_point_window_gather (per-point DMAs) bit-for-bit through
        the batched tracker."""
        from lk_tpu.config import LKConfig
        from lk_tpu.flow import sparse
        from lk_tpu.flow.sparse import track_points_batched

        b, n, h, w = 3, 5, 88, 152
        prev = (rng.random((b, h, w)) * 255).astype(np.float32)
        nxt = np.roll(prev, (1, -2), axis=(1, 2))
        pts = np.stack([rng.uniform(18, w - 18, (b, n)),
                        rng.uniform(18, h - 18, (b, n))], -1).astype(
            np.float32)
        val = np.ones((b, n), bool)
        args = (jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts),
                jnp.asarray(val), LKConfig(pallas_windows=True))
        monkeypatch.setattr(sparse, "_USE_BAND_GATHER", True)
        band = track_points_batched(*args)
        monkeypatch.setattr(sparse, "_USE_BAND_GATHER", False)
        point = track_points_batched(*args)
        for x, y in zip(band, point):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_row_band_tracker_parity(self, rng):
        """track_points_batched with a row_band covering the points ==
        unbanded, bit-for-bit (band-cropped levels + band-relative memory
        coords; pipeline serving crops to the ROI row band)."""
        from lk_tpu.config import LKConfig
        from lk_tpu.flow.sparse import track_points_batched

        b, n, h, w = 2, 6, 140, 160
        prev = (rng.random((b, h, w)) * 255).astype(np.float32)
        nxt = np.roll(prev, (2, -1), axis=(1, 2))
        # points confined to a mid-frame row band (the ROI situation)
        pts = np.stack([rng.uniform(20, w - 20, (b, n)),
                        rng.uniform(60, 86, (b, n))], -1).astype(np.float32)
        val = np.ones((b, n), bool)
        args = (jnp.asarray(prev), jnp.asarray(nxt), jnp.asarray(pts),
                jnp.asarray(val))
        for lk in (LKConfig(pallas_windows=True), LKConfig()):
            ref = track_points_batched(*args, lk)
            banded = track_points_batched(*args, lk, row_band=(58, 88))
            for x, y in zip(banded, ref):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_residual_clamp_behavior(self, rng):
        """Flow deviating more than `local` from the tile reference clamps."""
        h, w = 16, 384
        img = jnp.asarray(np.tile(np.arange(w, dtype=np.float32), (h, 1)))
        flow = np.zeros((h, w, 2), np.float32)
        flow[0, 0, 0] = 20.0   # outlier vs tile reference ~0
        out = np.asarray(pk.pallas_local_warp(jnp.asarray(img),
                                              jnp.asarray(flow), tile_h=16))
        # clamped to local range (8 + fractional margin), not 20
        assert out[0, 0] <= 17.0
        # non-outlier pixels exact
        assert abs(out[5, 100] - 100.0) < 1e-4


class TestPallasPyrDownPair:
    """Dual-plane in-kernel-prep pyrDown (pallas_pyr_down_pair).

    Reference role: cv.pyrDown inside cv.calcOpticalFlowPyrLK's pyramid
    build (LK_Final.py:531-532).  Parity target is ops.blur.pyr_down
    (itself bit-checked against cv2) to bf16 data rounding in the column
    matmul — the same accuracy class as pyr_down(fast=True).
    """

    @pytest.mark.parametrize(
        "h,w", [(16, 512), (96, 512), (512, 640), (576, 512)]
    )
    def test_parity_vs_pyr_down(self, rng, h, w):
        from lk_tpu.ops.blur import pyr_down

        assert pk.pyr_pair_supported(h, w)
        a = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
        b = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
        pa, pb = pk.pallas_pyr_down_pair(a, b)
        ea, eb = pyr_down(a), pyr_down(b)
        assert pa.shape == ea.shape and pb.shape == eb.shape
        np.testing.assert_allclose(np.asarray(pa), np.asarray(ea), atol=0.6)
        np.testing.assert_allclose(np.asarray(pb), np.asarray(eb), atol=0.6)
        # borders get dedicated masked fixes in-kernel — check them hard
        for got, exp in ((pa, ea), (pb, eb)):
            g, e = np.asarray(got), np.asarray(exp)
            assert np.abs(g[[0, -1], :] - e[[0, -1], :]).max() < 0.6
            assert np.abs(g[:, [0, -1]] - e[:, [0, -1]]).max() < 0.6

    @pytest.mark.parametrize("h,w", [(16, 512), (96, 512), (576, 512)])
    def test_single_plane_parity(self, rng, h, w):
        """pallas_pyr_down_one (video mode: one new frame per scan step)
        matches the pair kernel's plane-a output exactly — same grid body,
        n_planes=1."""
        a = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
        b = jnp.asarray((rng.random((h, w)) * 255).astype(np.float32))
        one = np.asarray(pk.pallas_pyr_down_one(a))
        pair_a, _ = pk.pallas_pyr_down_pair(a, b)
        np.testing.assert_array_equal(one, np.asarray(pair_a))

    def test_unsupported_geometry_rejected(self):
        assert not pk.pyr_pair_supported(100, 512)   # h % 16
        assert not pk.pyr_pair_supported(544, 960)   # w % 128
        assert not pk.pyr_pair_supported(544, 384)   # w < 512

    def test_dense_pyramid_with_pallas_pyramid(self, rng):
        """pallas_pyramid pads the base to h%16==0, decimates supported
        levels with the pair kernel, and crops the flow back — EPE stays in
        the bench gate's class and the output keeps the input geometry."""
        import cv2 as cv

        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow.dense import dense_pyramidal_lk

        h, w = 104, 512   # pads to 112 rows; L0 (112, 512) is supported
        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1, 0, 3.0], [0, 1, -2.0]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        res = dense_pyramidal_lk(
            jnp.asarray(img), jnp.asarray(nxt), LKConfig(max_level=2),
            dense_cfg=DenseLKConfig(use_pallas_warp=True,
                                    fused_grads_in_kernel=True,
                                    pallas_pyramid=True,
                                    pyramid_levels=3),
        )
        assert res.flow.shape == (h, w, 2)
        assert res.min_eig.shape == (h, w)
        flow = np.asarray(res.flow)[16:-16, 16:-16]
        err = np.hypot(flow[..., 0] - 3.0, flow[..., 1] + 2.0)
        assert err.mean() < 0.1, err.mean()


class TestPrepaddedLevels:
    """The unified-prepadded video chain (zero per-call XLA pad/slice glue)
    must be value-identical to the per-call-padding kernels: the unified pad
    regions replicate the same frame edges the per-call jnp.pads produced,
    and the kernels read the same windows through shifted origins."""

    def _pair(self, rng, h, w):
        import cv2 as cv

        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        m = np.float32([[1.002, 0.0005, 1.2], [-0.0005, 0.999, -0.8]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        return jnp.asarray(img), jnp.asarray(nxt)

    def test_prepadded_grads_kernel_parity(self, rng):
        """prepadded=True (unified layout in, tight out) == the per-call
        padding maker, bit-for-bit; write_stats=False drops the stats
        planes without touching the flow."""
        h, w = 128, 512
        th, tw, disp, local = 64, 256, 6, 4
        prv, nxt = self._pair(rng, h, w)
        coarse = jnp.asarray(
            (rng.random((2, h // 2, w // 2)).astype(np.float32) - 0.5) * 2.0)
        legacy = pk.make_fused_lk_level_grads(
            nxt, prv, n_iters=1, min_eig_threshold=1e-4, max_disp=disp,
            tile_h=th, tile_w=tw, local=local, coarse_flow=True)
        fl, me_l, va_l = legacy(coarse)
        pt, pb, pl_, pr = pk.unified_pad_geometry(th, tw, disp, local)
        pad = lambda x: jnp.pad(x, ((pt, pb), (pl_, pr)), mode="edge")
        prep = pk.make_fused_lk_level_grads(
            pad(nxt), pad(prv), n_iters=1, min_eig_threshold=1e-4,
            max_disp=disp, tile_h=th, tile_w=tw, local=local,
            coarse_flow=True, prepadded=True)
        fp, me_p, va_p = prep(coarse)
        np.testing.assert_array_equal(np.asarray(fp), np.asarray(fl))
        np.testing.assert_array_equal(np.asarray(me_p), np.asarray(me_l))
        np.testing.assert_array_equal(np.asarray(va_p), np.asarray(va_l))
        nostats = pk.make_fused_lk_level_grads(
            pad(nxt), pad(prv), n_iters=1, min_eig_threshold=1e-4,
            max_disp=disp, tile_h=th, tile_w=tw, local=local,
            coarse_flow=True, prepadded=True, write_stats=False)
        fn, me_n, va_n = nostats(coarse)
        assert me_n is None and va_n is None
        np.testing.assert_array_equal(np.asarray(fn), np.asarray(fl))

    def test_prepadded_resident_parity(self, rng):
        """prepadded_hw on the VMEM-resident maker == the per-call form."""
        h, w = 64, 384
        disp, local = 6, 4
        prv, nxt = self._pair(rng, h, w)
        seed = jnp.zeros((h, w, 2), jnp.float32)
        legacy = pk.make_fused_lk_level_grads_resident(
            nxt, prv, n_iters=3, min_eig_threshold=1e-4, max_disp=disp,
            local=local)
        fl, me_l, va_l = legacy(seed)
        pt, pb, pl_, pr = pk.unified_pad_geometry(h, w, disp, local)
        pad = lambda x: jnp.pad(x, ((pt, pb), (pl_, pr)), mode="edge")
        prep = pk.make_fused_lk_level_grads_resident(
            pad(nxt), pad(prv), n_iters=3, min_eig_threshold=1e-4,
            max_disp=disp, local=local, prepadded_hw=(h, w))
        fp, me_p, va_p = prep(seed)
        np.testing.assert_array_equal(np.asarray(fp), np.asarray(fl))
        np.testing.assert_array_equal(np.asarray(me_p), np.asarray(me_l))
        np.testing.assert_array_equal(np.asarray(va_p), np.asarray(va_l))

    def _video_frames(self, rng, h, w, n):
        import cv2 as cv

        img = (rng.random((h, w)) * 255).astype(np.float32)
        img = cv.GaussianBlur(img, (0, 0), 2.0)
        frames = [img]
        m = np.float32([[1.002, 0.0005, 1.2], [-0.0005, 0.999, -0.8]])
        for _ in range(n - 1):
            frames.append(cv.warpAffine(
                frames[-1], m, (w, h), flags=cv.INTER_LINEAR,
                borderMode=cv.BORDER_REFLECT_101))
        return jnp.asarray(np.stack(frames))

    def test_chunked_video_chain_matches_perframe(self, rng):
        """video_chunk=K (frame-batched kernels, scan over chunks + tail)
        == the per-frame prepadded chain, bit-for-bit, on every output."""
        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow import dense

        cfg = LKConfig(max_level=1)
        d0 = DenseLKConfig(use_pallas_fused=True, iter_schedule=(1, 4),
                           fused_coarse_chain=True, pyramid_levels=2,
                           video_chunk=0)
        dc = DenseLKConfig(use_pallas_fused=True, iter_schedule=(1, 4),
                           fused_coarse_chain=True, pyramid_levels=2,
                           video_chunk=3)
        # 8 frames = 7 pairs: two chunks of 3 plus a 1-pair per-frame tail
        fr = self._video_frames(rng, 128, 1024, 8)
        plan = dense._video_level_plan(
            cfg, dc, dense.pyramid_base_geometry(128, 1024, cfg, dc))
        assert plan is not None
        out_c = dense.dense_pyramidal_lk_video(fr, cfg, dc)
        out_f = dense.dense_pyramidal_lk_video(fr, cfg, d0)
        np.testing.assert_array_equal(np.asarray(out_c.flow),
                                      np.asarray(out_f.flow))
        np.testing.assert_array_equal(np.asarray(out_c.min_eig),
                                      np.asarray(out_f.min_eig))
        np.testing.assert_array_equal(np.asarray(out_c.valid),
                                      np.asarray(out_f.valid))

    @pytest.mark.parametrize("warm", [False, True])
    def test_prepadded_video_chain_matches_percall(self, rng, monkeypatch,
                                                   warm):
        """dense_pyramidal_lk_video's prepadded chain (plan active) == the
        per-call-padding chain (plan monkeypatched away), cold and warm."""
        from lk_tpu.config import DenseLKConfig, LKConfig
        from lk_tpu.flow import dense

        cfg = LKConfig(max_level=1)
        d = DenseLKConfig(use_pallas_fused=True, iter_schedule=(1, 4),
                          fused_coarse_chain=True, video_warm_start=warm,
                          pyramid_levels=2, video_chunk=0)
        fr = self._video_frames(rng, 128, 1024, 5 if warm else 4)
        plan = dense._video_level_plan(
            cfg, d, dense.pyramid_base_geometry(128, 1024, cfg, d))
        assert plan is not None
        out_p = dense.dense_pyramidal_lk_video(fr, cfg, d)
        monkeypatch.setattr(dense, "_video_level_plan",
                            lambda *a, **k: None)
        out_l = dense.dense_pyramidal_lk_video(fr, cfg, d)
        np.testing.assert_array_equal(np.asarray(out_p.flow),
                                      np.asarray(out_l.flow))
        np.testing.assert_array_equal(np.asarray(out_p.min_eig),
                                      np.asarray(out_l.min_eig))
        np.testing.assert_array_equal(np.asarray(out_p.valid),
                                      np.asarray(out_l.valid))
