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


# --- Hough-style road-line voting (lk_tpu.geometry.hough) -------------------

def _lane_segments(rng, theta_deg, rho, n, image_size, jitter=1.0):
    """n short segments lying on x*cos(t) + y*sin(t) = rho, +-jitter px."""
    w, h = image_size
    t = np.radians(theta_deg)
    nrm = np.array([np.cos(t), np.sin(t)])
    d = np.array([-np.sin(t), np.cos(t)])      # along-line direction
    # anchor: closest point on the line to the origin
    base = rho * nrm
    s = rng.uniform(-0.4, 0.4, n) * min(w, h)  # along-line positions
    seglen = rng.uniform(8.0, 30.0, n)
    perp = rng.uniform(-jitter, jitter, n)
    starts = base + s[:, None] * d + perp[:, None] * nrm
    stops = starts + seglen[:, None] * d
    return starts.astype(np.float32), stops.astype(np.float32)


def test_hough_recovers_two_lane_scene(rng):
    from lk_tpu.geometry import hough_road_lines, segment_line_params

    size = (W, H)
    # two lanes converging toward the VP, plus uniform clutter
    lanes = [(135.0, 80.0), (45.0, 560.0)]    # (theta deg, rho px)
    starts, stops = [], []
    for t, r in lanes:
        a, b = _lane_segments(rng, t, r, 60, size)
        starts.append(a)
        stops.append(b)
    ca = rng.uniform(0, [W, H], (40, 2)).astype(np.float32)
    cb = ca + rng.uniform(-20, 20, (40, 2)).astype(np.float32)
    starts.append(ca)
    stops.append(cb)
    starts = np.concatenate(starts)
    stops = np.concatenate(stops)
    mask = np.ones(len(starts), bool)

    res = jax.jit(
        lambda a, b, m: hough_road_lines(a, b, m, size, k=2)
    )(jnp.asarray(starts), jnp.asarray(stops), jnp.asarray(mask))

    got = sorted(zip(np.degrees(np.asarray(res.theta)),
                     np.asarray(res.rho)))
    want = sorted(lanes)
    rho_bin = 2 * np.hypot(*size) / 255
    for (gt, gr), (wt, wr) in zip(got, want):
        assert abs(gt - wt) <= 2.0, (got, want)       # within 2 theta bins
        assert abs(gr - wr) <= 2 * rho_bin, (got, want)

    # masked segments must not vote
    from lk_tpu.geometry import hough_vote

    acc_all = hough_vote(jnp.asarray(starts), jnp.asarray(stops),
                         jnp.asarray(mask), size)
    half = mask.copy()
    half[: len(half) // 2] = False
    acc_half = hough_vote(jnp.asarray(starts), jnp.asarray(stops),
                          jnp.asarray(half), size)
    assert float(acc_half.sum()) < float(acc_all.sum())
    # vote mass == sum of masked segment lengths (length-weighted)
    seglens = np.linalg.norm(stops - starts, axis=1)
    np.testing.assert_allclose(float(acc_all.sum()), seglens.sum(), rtol=1e-5)

    # param extraction round-trips: a segment ON a known line maps back
    th, rh = segment_line_params(jnp.asarray(starts[:60]),
                                 jnp.asarray(stops[:60]))
    np.testing.assert_allclose(np.degrees(np.asarray(th)), 135.0, atol=0.2)
    np.testing.assert_allclose(np.asarray(rh), 80.0, atol=1.5)


def test_hough_subbin_peak_precision(rng):
    """Sub-bin refinement (r5): lines placed BETWEEN bin centers must come
    back with sub-bin accuracy — the r3 peaks were bin centers (1 deg x
    ~17 px cells), so the best possible error was half a cell."""
    import math

    from lk_tpu.geometry.hough import hough_road_lines

    size = (640, 480)
    n_theta, n_rho = 180, 256
    t_bin = math.pi / n_theta
    r_bin = 2.0 * math.hypot(*size) / (n_rho - 1)
    # ground-truth lines offset ~0.3 bins from the nearest center
    lines = [(52.3 * t_bin, 40.35 * r_bin - math.hypot(*size)),
             (121.7 * t_bin, 180.6 * r_bin - math.hypot(*size))]
    starts, stops = [], []
    for th, rh in lines:
        n = np.array([math.cos(th), math.sin(th)])
        d = np.array([-math.sin(th), math.cos(th)])
        for s in np.linspace(-200, 200, 24):
            p0 = rh * n + s * d
            starts.append(p0)
            stops.append(p0 + 14.0 * d + rng.normal(0, 0.05, 2))
    starts = np.asarray(starts, np.float32)
    stops = np.asarray(stops, np.float32)
    res = hough_road_lines(jnp.asarray(starts), jnp.asarray(stops),
                           jnp.ones(len(starts), bool), size, k=2)
    got = sorted(zip(np.asarray(res.theta), np.asarray(res.rho)))
    want = sorted(lines)
    for (tg, rg), (tw, rw) in zip(got, want):
        assert abs(tg - tw) < 0.35 * t_bin, (tg, tw, t_bin)
        assert abs(rg - rw) < 0.5 * r_bin, (rg, rw, r_bin)


def test_hough_adaptive_suppression_separates_close_lines(rng):
    """Two sharp parallel lines ~5 rho bins apart: the r3 fixed n//24
    radii (theta 7, rho 10 bins) suppressed the second line outright;
    the HWHM-derived radii must keep both."""
    import math

    from lk_tpu.geometry.hough import hough_road_lines

    size = (640, 480)
    n_rho = 256
    r_bin = 2.0 * math.hypot(*size) / (n_rho - 1)
    th = math.radians(70.0)
    rhos = [30.0, 30.0 + 5.2 * r_bin]
    starts, stops = [], []
    for rh in rhos:
        n = np.array([math.cos(th), math.sin(th)])
        d = np.array([-math.sin(th), math.cos(th)])
        for s in np.linspace(-150, 150, 20):
            p0 = rh * n + s * d
            starts.append(p0)
            stops.append(p0 + 12.0 * d)
    starts = np.asarray(starts, np.float32)
    stops = np.asarray(stops, np.float32)
    res = hough_road_lines(jnp.asarray(starts), jnp.asarray(stops),
                           jnp.ones(len(starts), bool), size, k=2)
    got_rho = np.sort(np.asarray(res.rho))
    want = np.sort(np.asarray(rhos, np.float32))
    assert np.asarray(res.votes).min() > 0, res.votes
    np.testing.assert_allclose(got_rho, want, atol=0.6 * r_bin)


def test_hough_near_vertical_wrap_mirrors_rho(rng):
    """Lines within half a theta bin of pi (near-vertical) fold to bin 0
    with rho NEGATED — without the mirror both the vote fold and the
    sub-bin refinement return the reflected line ~2|rho| away (r5 review
    finding, verified end-to-end pre-fix: theta=-0.3 bin, rho=+100 came
    back at rho=-99)."""
    import math

    from lk_tpu.geometry.hough import hough_road_lines

    size = (640, 480)
    n_theta = 180
    t_bin = math.pi / n_theta
    th = math.pi - 0.3 * t_bin      # ~179.7 deg == -0.3 bin
    rh = 100.0
    n = np.array([math.cos(th), math.sin(th)])
    d = np.array([-math.sin(th), math.cos(th)])
    starts, stops = [], []
    for s in np.linspace(-180, 180, 30):
        p0 = rh * n + s * d
        starts.append(p0)
        stops.append(p0 + 13.0 * d)
    res = hough_road_lines(
        jnp.asarray(np.asarray(starts, np.float32)),
        jnp.asarray(np.asarray(stops, np.float32)),
        jnp.ones(len(starts), bool), size, k=1)
    tg, rg = float(res.theta[0]), float(res.rho[0])
    # the returned (theta, rho) must name the SAME line: fold ours onto
    # the ground truth's side for comparison
    if abs(tg - th) > math.pi / 2:
        tg, rg = tg + math.pi if tg < th else tg - math.pi, -rg
    assert abs(tg - th) < 0.5 * t_bin, (tg, th)
    assert abs(rg - rh) < 4.0, (rg, rh)   # well under the ~195px reflection


def test_hough_rho_edge_peak_not_biased_outward():
    """A peak at rho bin 0/n-1 has an edge-clamped profile (ym == y0);
    the parabolic fit must return offset 0 there, not the degenerate
    -0.5 that lands outside the grid (r5 review finding)."""
    from lk_tpu.geometry.hough import hough_peaks

    import math

    n_theta, n_rho = 180, 64
    acc = np.zeros((n_theta, n_rho), np.float32)
    acc[90, 0] = 10.0               # spike exactly at the rho edge
    acc[90, 1] = 4.0
    res = hough_peaks(jnp.asarray(acc), k=1, image_size=(64, 48))
    rho_max = math.hypot(64.0, 48.0)
    # bin 0 maps to -rho_max exactly; the refined rho must not undershoot
    assert float(res.rho[0]) >= -rho_max - 1e-4, (float(res.rho[0]),
                                                  -rho_max)


def test_hough_interior_two_bin_tie_refines_to_midpoint():
    """A rho exactly midway between bins splits its bilinear vote 50/50;
    the parabolic fit must return the +-0.5 midpoint apex (an interior
    tie is real data — only edge-CLAMPED repeats are zeroed)."""
    import math

    from lk_tpu.geometry.hough import hough_peaks

    n_theta, n_rho = 180, 64
    acc = np.zeros((n_theta, n_rho), np.float32)
    acc[90, 30] = 5.0
    acc[90, 31] = 5.0     # 50/50 bilinear split: true rho at bin 30.5
    res = hough_peaks(jnp.asarray(acc), k=1, image_size=(64, 48))
    rho_max = math.hypot(64.0, 48.0)
    want = 30.5 / (n_rho - 1) * 2.0 * rho_max - rho_max
    assert abs(float(res.rho[0]) - want) < 0.05 * (2 * rho_max / n_rho), (
        float(res.rho[0]), want)
