"""EPE gates on a REAL photograph — the reference's own dashcam frame.

Every other accuracy test in the suite synthesizes texture from blurred
noise; this one loads the annotated dashcam screenshot the reference ships
(/root/reference/GRMN0307.png — a live `frame` window capture rendered by
LK_Final.py:655-667) and applies known synthetic warps, so the texture is
natural (asphalt, cars, foliage, signage — including low-texture sky and
saturated regions that blurred noise never produces) while ground truth
stays exact.  The drawn flow-line overlay pixels are simply part of the
texture.

The two reference screenshots are different scenes on different days, so a
true temporal pair is impossible (SURVEY §4: the input videos are absent);
warping a single real frame is the honest substitute.
"""

import os

import cv2 as cv
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lk_tpu.config import LKConfig
from lk_tpu.flow.dense import dense_pyramidal_lk

_REF_PNG = "/root/reference/GRMN0307.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(_REF_PNG), reason="reference screenshot not present"
)


def _dashcam_gray():
    """The 483x860 dashcam frame inside the screenshot.

    The capture window's client area is rows 41..523, cols 871..1730
    (measured: title-bar chrome is white rows 4..40; the frame is 860 wide
    flush with the screenshot's right edge, 1731-860=871).
    """
    img = cv.imread(_REF_PNG)
    frame = img[41:524, 871:1731]
    assert frame.shape == (483, 860, 3)
    return cv.cvtColor(frame, cv.COLOR_BGR2GRAY).astype(np.float32)


def _crop(img, h=480, w=640, x0=110):
    return np.ascontiguousarray(img[:h, x0:x0 + w])


def _cv_flow_on_grid(img, nxt, pts):
    p1, st, _ = cv.calcOpticalFlowPyrLK(
        img.astype(np.uint8), nxt.astype(np.uint8),
        pts.reshape(-1, 1, 2), None, winSize=(15, 15), maxLevel=2,
        criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03),
    )
    return p1.reshape(-1, 2) - pts, st.reshape(-1).astype(bool)


class TestNaturalImageDense:
    def test_translation_epe_vs_gt_and_opencv(self):
        img = _crop(_dashcam_gray())
        h, w = img.shape
        dx, dy = 3.7, -2.2
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        res = jax.jit(lambda a, b: dense_pyramidal_lk(a, b, LKConfig()))(
            jnp.asarray(img), jnp.asarray(nxt))
        flow = np.asarray(res.flow)
        valid = np.asarray(res.valid)

        ys, xs = np.mgrid[30:h - 30:14, 30:w - 30:14]
        pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        cv_flow, st = _cv_flow_on_grid(img, nxt, pts)
        ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
        ok = st & valid[pts[:, 1].astype(int), pts[:, 0].astype(int)]
        assert ok.sum() > len(pts) * 0.7, ok.sum()
        # Real texture breaks the oracle itself: on the overlay graphics /
        # occlusion boundaries cv2 diverges from the exact ground truth by
        # up to ~26 px (measured; our result stays within 2.3 px there), so
        # a raw mean-vs-cv2 measures cv2's failures, not ours.  Three
        # robust gates instead:
        gt = np.array([dx, dy], np.float32)
        err_cv = np.linalg.norm(ours - cv_flow, axis=1)
        cv_gt = np.linalg.norm(cv_flow - gt, axis=1)
        our_gt = np.linalg.norm(ours - gt, axis=1)
        # 1) parity where the oracle is sane (cv2 within 1 px of exact GT;
        #    drops ~2% of points on this frame, ~0% on synthetic scenes)
        sane = ok & (cv_gt < 1.0)
        assert sane.sum() > len(pts) * 0.7, sane.sum()
        assert err_cv[sane].mean() < 0.1, err_cv[sane].mean()
        # 2) median parity over ALL valid points (tail-immune)
        assert np.median(err_cv[ok]) < 0.05, np.median(err_cv[ok])
        # 3) vs exact ground truth we must be at least as good as the
        #    oracle itself on the same points (measured 0.108 vs 0.181)
        assert our_gt[ok].mean() <= cv_gt[ok].mean() + 1e-3, (
            our_gt[ok].mean(), cv_gt[ok].mean())

    def test_zoom_rotation_epe_vs_opencv(self):
        """Forward ego-motion regime (divergent flow) on real texture —
        the residual-clamp weak spot the accuracy envelope documents."""
        img = _crop(_dashcam_gray())
        h, w = img.shape
        m = cv.getRotationMatrix2D((w / 2.0, h / 2.0), 0.3, 1.004)
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)
        res = jax.jit(lambda a, b: dense_pyramidal_lk(a, b, LKConfig()))(
            jnp.asarray(img), jnp.asarray(nxt))
        flow = np.asarray(res.flow)
        valid = np.asarray(res.valid)

        ys, xs = np.mgrid[30:h - 30:14, 30:w - 30:14]
        pts = np.stack([xs, ys], -1).reshape(-1, 2).astype(np.float32)
        cv_flow, st = _cv_flow_on_grid(img, nxt, pts)
        ours = flow[pts[:, 1].astype(int), pts[:, 0].astype(int)]
        ok = st & valid[pts[:, 1].astype(int), pts[:, 0].astype(int)]
        assert ok.sum() > len(pts) * 0.7, ok.sum()
        # Same robust gates as the translation test (cv2 fails on the same
        # overlay/occlusion texture here; exact GT is the affine map).
        gt = (np.concatenate([pts, np.ones((len(pts), 1), np.float32)], 1)
              @ m.T.astype(np.float32)) - pts
        err_cv = np.linalg.norm(ours - cv_flow, axis=1)
        cv_gt = np.linalg.norm(cv_flow - gt, axis=1)
        our_gt = np.linalg.norm(ours - gt, axis=1)
        sane = ok & (cv_gt < 1.0)
        assert sane.sum() > len(pts) * 0.7, sane.sum()
        assert err_cv[sane].mean() < 0.1, err_cv[sane].mean()
        assert np.median(err_cv[ok]) < 0.05, np.median(err_cv[ok])
        assert our_gt[ok].mean() <= cv_gt[ok].mean() + 1e-3, (
            our_gt[ok].mean(), cv_gt[ok].mean())


class TestNaturalImageSparse:
    def test_tracker_epe_and_status_parity(self):
        """Sparse tracker (the reference's actual workload) on real corners
        found by our own Shi-Tomasi, vs cv2's tracker."""
        from lk_tpu.config import FeatureConfig
        from lk_tpu.features.shi_tomasi import good_features_to_track
        from lk_tpu.flow.sparse import track_points

        img = _crop(_dashcam_gray())
        h, w = img.shape
        dx, dy = 2.4, 1.6
        m = np.float32([[1, 0, dx], [0, 1, dy]])
        nxt = cv.warpAffine(img, m, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_REFLECT_101)

        pts, pvalid = good_features_to_track(
            jnp.asarray(img), None,
            FeatureConfig(max_corners=40, quality_level=0.3,
                          min_distance=7.0, block_size=7))
        pts = np.asarray(pts)[np.asarray(pvalid)]
        # keep interior points so the border doesn't dominate
        keep = ((pts[:, 0] > 25) & (pts[:, 0] < w - 25)
                & (pts[:, 1] > 25) & (pts[:, 1] < h - 25))
        pts = pts[keep].astype(np.float32)
        assert len(pts) >= 10, len(pts)

        cfg = LKConfig()
        p1, st, _ = track_points(
            jnp.asarray(img), jnp.asarray(nxt), jnp.asarray(pts),
            jnp.ones((len(pts),), bool), cfg)
        p1 = np.asarray(p1)
        st = np.asarray(st).astype(bool).reshape(-1)

        cv_flow, cv_st = _cv_flow_on_grid(img, nxt, pts)
        both = st & cv_st
        # status parity: we keep at least as much as cv2 agrees on
        assert both.sum() >= cv_st.sum() * 0.9
        epe = np.linalg.norm((p1 - pts)[both] - cv_flow[both], axis=1)
        assert epe.mean() < 0.1, epe.mean()
