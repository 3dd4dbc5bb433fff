"""Motion classification over flow fields/lines."""

import numpy as np

import jax.numpy as jnp

from lk_tpu.geometry.classify import (
    AWAY_FROM_VP,
    LATERAL,
    STATIC,
    TOWARD_VP,
    classify_dense_flow,
    classify_flow_lines,
)


def test_dense_radial_expansion():
    """Forward ego-motion: everything streams away from the VP."""
    h, w = 64, 96
    vp = jnp.asarray([48.0, 32.0])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    flow = np.stack([(xs - 48.0) * 0.05, (ys - 32.0) * 0.05], -1)
    s = classify_dense_flow(jnp.asarray(flow), vp, min_mag=0.5)
    assert float(s.frac_away) > 0.5
    assert float(s.frac_toward) < 0.01
    assert float(s.mean_radial) > 0


def test_dense_contraction_labels_toward():
    h, w = 64, 96
    vp = jnp.asarray([48.0, 32.0])
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    flow = np.stack([-(xs - 48.0) * 0.05, -(ys - 32.0) * 0.05], -1)
    s = classify_dense_flow(jnp.asarray(flow), vp, min_mag=0.5)
    assert float(s.frac_toward) > 0.5
    assert float(s.mean_radial) < 0


def test_lines_lateral_and_static():
    vp = jnp.asarray([0.0, 0.0])
    start = jnp.asarray([[10.0, 0.0], [10.0, 0.0], [10.0, 0.0]])
    stop = jnp.asarray([[10.0, 3.0],    # perpendicular to radial (+x) axis
                        [13.0, 0.0],    # radially away
                        [10.1, 0.0]])   # sub-threshold
    s = classify_flow_lines(start, stop, jnp.ones(3, bool), vp, min_mag=0.5)
    labels = np.asarray(s.labels)
    assert labels.tolist() == [LATERAL, AWAY_FROM_VP, STATIC]


def test_invalid_slots_ignored():
    vp = jnp.asarray([0.0, 0.0])
    start = jnp.zeros((4, 2))
    stop = jnp.ones((4, 2)) * 5
    valid = jnp.asarray([True, True, False, False])
    s = classify_flow_lines(start, stop, valid, vp)
    assert 0.99 < float(s.frac_away + s.frac_toward + s.frac_lateral
                        + s.frac_static) < 1.01
