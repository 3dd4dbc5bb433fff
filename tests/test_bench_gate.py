"""CPU smoke of bench.py's accuracy-gate machinery (the driver-critical
path otherwise exercised only on the real chip): the dual epe_check
terms, the oracle-sane filter, and the geometry-scaled chain defaults."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# small geometry BEFORE the import (bench reads env at module load)
os.environ["LK_BENCH_H"] = "240"
os.environ["LK_BENCH_W"] = "320"

import bench  # noqa: E402
from lk_tpu.config import DenseLKConfig  # noqa: E402


def test_epe_check_dual_terms_small_geometry(rng):
    dcfg = DenseLKConfig()  # XLA path (CPU backend)
    img, nxt, gt = bench._scene(rng, bench.H, bench.W, 2.0, -1.5)
    epe_cv, epe_gt = bench.epe_check(dcfg, img, nxt, gt=gt)
    assert np.isfinite(epe_cv) and np.isfinite(epe_gt)
    # pure translation on smooth texture: both terms well under the gate
    assert epe_cv < 0.1, epe_cv
    assert epe_gt < 0.1, epe_gt
    # gt=None keeps the legacy single-float form (no sanity filter)
    alone = bench.epe_check(dcfg, img, nxt)
    assert isinstance(alone, float) and alone < 0.2


def test_bench_chain_defaults_scale_with_geometry():
    # at 240x320 the scaled default chains must be several times the
    # 1080p 12/36 (the fixed chains measured tunnel noise at 270p) and
    # divisible by the production video_chunk
    scale = (1080 * 1920) // (bench.H * bench.W)
    assert scale >= 16
    c0 = -(-12 * scale // 4) * 4
    assert c0 % 4 == 0 and c0 >= 12 * 16
