"""CPU smoke of bench.py's accuracy-gate machinery (the driver-critical
path otherwise exercised only on the real chip): the dual epe_check
terms, the oracle-sane filter, and the geometry-scaled chain defaults."""

import importlib
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lk_tpu.config import DenseLKConfig  # noqa: E402


@pytest.fixture
def small_bench(monkeypatch):
    """bench imported at a small geometry, robust to import order: the
    module reads LK_BENCH_H/W at load, so set the env and (re)load."""
    monkeypatch.setenv("LK_BENCH_H", "240")
    monkeypatch.setenv("LK_BENCH_W", "320")
    import bench

    bench = importlib.reload(bench)
    yield bench
    # restore the default-geometry module state for any later importer
    monkeypatch.delenv("LK_BENCH_H")
    monkeypatch.delenv("LK_BENCH_W")
    importlib.reload(bench)


def test_epe_check_dual_terms_small_geometry(small_bench, rng):
    bench = small_bench
    assert bench.H == 240 and bench.W == 320
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


def test_bench_chain_defaults_scale_with_geometry(small_bench,
                                                  monkeypatch):
    bench = small_bench
    # the REAL code path (bench.default_chains, used by throughput):
    # at 240x320 the scaled chains must be several times the 1080p 12/36
    # (fixed chains measured tunnel noise at 270p) and chunk-divisible
    c0, c1 = bench.default_chains()
    assert c0 >= 12 * 16 and c0 % 4 == 0, (c0, c1)
    assert c1 == 3 * c0
    # env overrides still win
    monkeypatch.setenv("LK_BENCH_CHAIN0", "8")
    monkeypatch.setenv("LK_BENCH_CHAIN1", "40")
    assert bench.default_chains() == (8, 40)
