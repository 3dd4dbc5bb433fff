"""Geometry layer vs the NumPy oracle (flow lines, cross points, VP machine)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.geometry import (
    VPState,
    cross_point_pairs,
    flow_line_filter,
    flow_line_stats,
    init_vp_state,
    process_frame_pairs,
    vp_show_step,
)
from lk_tpu.geometry.crosspoints import PAIR_INDICES

from oracle_vp import OracleVP, oracle_line

W, H = 860, 483


def _random_lines(rng, n, converging_frac=0.8, target=(430, 240)):
    """Segments roughly radiating away from a target (downward image motion)."""
    starts, stops = [], []
    for _ in range(n):
        sx = rng.uniform(100, W - 100)
        sy = rng.uniform(H * 0.65, H * 0.8)
        if rng.random() < converging_frac:
            d = np.array([sx - target[0], sy - target[1]], np.float64)
            d = d / (np.linalg.norm(d) + 1e-9)
        else:
            th = rng.uniform(0, 2 * np.pi)
            d = np.array([np.cos(th), np.sin(th)])
        if d[1] < 0:
            d = -d  # ensure downward (angle > 180 after y-flip)
        ln = rng.uniform(2.0, 10.0)
        starts.append([sx, sy])
        stops.append([sx + d[0] * ln, sy + d[1] * ln])
    return np.array(starts, np.float32), np.array(stops, np.float32)


class TestFlowLines:
    def test_stats_match_oracle(self, rng):
        starts, stops = _random_lines(rng, 20)
        st = flow_line_stats(jnp.asarray(starts), jnp.asarray(stops))
        for k in range(20):
            ol = oracle_line(starts[k], stops[k])
            assert abs(float(st.length[k]) - ol["length"]) < 1e-2
            assert abs(float(st.angle[k]) - ol["angle"]) < 1e-3, k

    def test_ema_filter_order(self, rng):
        starts, stops = _random_lines(rng, 10)
        st = flow_line_stats(jnp.asarray(starts), jnp.asarray(stops))
        valid = jnp.ones(10, bool)
        acc, new_avg = flow_line_filter(st, valid, jnp.float32(1.5), 1.5, 0.05,
                                        update_before_test=True)
        # oracle: sequential
        avg = 1.5
        exp = []
        for k in range(10):
            ol = oracle_line(starts[k], stops[k])
            cand = ol["angle"] > 180 and ol["length"] > 1.5
            a = False
            if cand:
                avg = (avg + ol["length"] * 0.05) / 1.05
                a = ol["length"] > avg
            exp.append(a)
        assert np.asarray(acc).tolist() == exp
        assert abs(float(new_avg) - avg) < 1e-4


class TestCrossPoints:
    def test_pairs_match_oracle(self, rng):
        starts, stops = _random_lines(rng, 12)
        cps = np.asarray(cross_point_pairs(jnp.asarray(starts), jnp.asarray(stops)))
        ii, jj = PAIR_INDICES(12)
        for p in range(len(ii)):
            l1 = oracle_line(starts[ii[p]], stops[ii[p]])
            l2 = oracle_line(starts[jj[p]], stops[jj[p]])
            ocp = OracleVP._cross(l2, l1)
            if ocp is None or np.isnan(ocp).any():
                assert np.isnan(cps[p]).any(), p
            else:
                np.testing.assert_allclose(cps[p], ocp, rtol=2e-3, atol=0.5)

    def test_vertical_line2_handled(self):
        starts = np.array([[10, 10], [50, 0]], np.float32)
        stops = np.array([[20, 20], [50, 30]], np.float32)
        cps = np.asarray(cross_point_pairs(jnp.asarray(starts), jnp.asarray(stops)))
        # line2 (index i=0) non-vertical, line1 (j=1) vertical -> nan (deviation)
        # pair order: line1=l[j]=vertical -> k1 = inf -> nan
        assert np.isnan(cps[0]).any() or abs(cps[0][0] - 50) < 1e-3


def _run_device_frames(cfg, frames_lines):
    """Run the device VP machine over frames of (starts, stops, accepted)."""
    state = init_vp_state(cfg)
    step_rows = []

    @jax.jit
    def one_frame(state, starts, stops, acc):
        st = flow_line_stats(starts, stops)
        state, out = process_frame_pairs(state, st, acc, cfg, (W, H))
        state, out = vp_show_step(state, out, cfg)
        return state, out

    for starts, stops, acc in frames_lines:
        state, out = one_frame(
            state, jnp.asarray(starts), jnp.asarray(stops), jnp.asarray(acc)
        )
        rows = np.asarray(out.update_rows)[np.asarray(out.update_mask)]
        step_rows.extend([tuple(r) for r in rows])
        if bool(out.show_mask):
            step_rows.append(tuple(np.asarray(out.show_row)))
    return state, step_rows


@pytest.mark.parametrize("aliasing", [True, False])
def test_vp_machine_matches_oracle(rng, aliasing):
    cfg = PipelineConfig(vp_init_aliasing=aliasing)
    oracle = OracleVP(cfg, W, H)
    frames = []
    for _ in range(30):
        starts, stops = _random_lines(rng, 14)
        acc = np.ones(14, bool)
        frames.append((starts, stops, acc))
        lines = [oracle_line(starts[k], stops[k]) for k in range(14)]
        oracle.process_frame(lines)

    _, rows = _run_device_frames(cfg, frames)
    orows = oracle.csv_rows
    assert len(rows) == len(orows), (len(rows), len(orows))
    a = np.array(rows, np.float64)
    b = np.array(orows, np.float64)
    err = np.abs(a - b).max() if len(a) else 0.0
    assert err < 0.25, err  # f32 device vs f64 oracle drift over 30 frames


def test_vp_hide_resets(rng):
    cfg = PipelineConfig(hide_vp_thold=3)
    oracle = OracleVP(cfg, W, H)
    frames = []
    # 10 converging frames to init the VP, then 8 empty frames to trigger hide
    for _ in range(10):
        starts, stops = _random_lines(rng, 14)
        frames.append((starts, stops, np.ones(14, bool)))
    for _ in range(8):
        starts, stops = _random_lines(rng, 14)
        frames.append((starts, stops, np.zeros(14, bool)))
    for starts, stops, acc in frames:
        lines = [oracle_line(starts[k], stops[k]) for k in range(14)] if acc.any() else []
        oracle.process_frame(lines)
    state, rows = _run_device_frames(cfg, frames)
    assert not bool(state.vp_init)  # hidden by the end
    assert len(rows) == len(oracle.csv_rows)
