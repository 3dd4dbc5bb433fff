"""Motion classification over flow fields and flow lines.

The reference's LK3_classification.py carries "classification" only in its
filename — the script is a VP-detection variant with no classifier
(SURVEY.md §2.1).  This module supplies the capability the name promises,
as vectorized reductions over flow (BASELINE.json north-star: "motion
classification ... become[s] vectorized XLA reductions over flow fields"):

* per-vector labels relative to the vanishing point — for forward ego-motion
  through a static scene, image features stream *away* from the VP; motion
  *toward* the VP or perpendicular to the radial direction flags independent
  movers (oncoming/crossing traffic);
* per-frame summaries (class fractions, mean radial/tangential components)
  usable as cheap ego-motion descriptors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

# label codes
STATIC = 0        # |flow| below threshold
AWAY_FROM_VP = 1  # radially outward: consistent with forward ego-motion
TOWARD_VP = 2     # radially inward: oncoming relative motion
LATERAL = 3       # mostly tangential: crossing motion


class MotionSummary(NamedTuple):
    labels: jnp.ndarray        # int32 labels, same leading shape as input
    frac_static: jnp.ndarray
    frac_away: jnp.ndarray
    frac_toward: jnp.ndarray
    frac_lateral: jnp.ndarray
    mean_radial: jnp.ndarray   # mean signed radial speed (px/frame, + = away)
    mean_tangential: jnp.ndarray


def _classify(vec_x, vec_y, pos_x, pos_y, vp_xy, min_mag, radial_frac):
    rx = pos_x - vp_xy[0]
    ry = pos_y - vp_xy[1]
    rn = jnp.sqrt(rx * rx + ry * ry)
    rxn = jnp.where(rn > 0, rx / jnp.where(rn > 0, rn, 1.0), 0.0)
    ryn = jnp.where(rn > 0, ry / jnp.where(rn > 0, rn, 1.0), 0.0)
    mag = jnp.sqrt(vec_x * vec_x + vec_y * vec_y)
    radial = vec_x * rxn + vec_y * ryn
    tangential = -vec_x * ryn + vec_y * rxn
    moving = mag >= min_mag
    mostly_radial = jnp.abs(radial) >= radial_frac * mag
    labels = jnp.where(
        ~moving,
        STATIC,
        jnp.where(
            mostly_radial,
            jnp.where(radial > 0, AWAY_FROM_VP, TOWARD_VP),
            LATERAL,
        ),
    ).astype(jnp.int32)
    return labels, radial, tangential, moving


def _summary(labels, radial, tangential, moving, valid):
    v = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(v), 1.0)
    mv = (moving & valid).astype(jnp.float32)
    nm = jnp.maximum(jnp.sum(mv), 1.0)

    def frac(code):
        return jnp.sum(((labels == code) & valid).astype(jnp.float32)) / n

    return MotionSummary(
        labels=labels,
        frac_static=frac(STATIC),
        frac_away=frac(AWAY_FROM_VP),
        frac_toward=frac(TOWARD_VP),
        frac_lateral=frac(LATERAL),
        mean_radial=jnp.sum(radial * mv) / nm,
        mean_tangential=jnp.sum(tangential * mv) / nm,
    )


def classify_dense_flow(
    flow: jnp.ndarray,
    vp_xy: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    min_mag: float = 0.5,
    radial_frac: float = 0.7071,
) -> MotionSummary:
    """Label every pixel of an (H, W, 2) flow field relative to the VP."""
    h, w = flow.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    labels, radial, tangential, moving = _classify(
        flow[..., 0], flow[..., 1], xs, ys, vp_xy, min_mag, radial_frac
    )
    if valid is None:
        valid = jnp.ones((h, w), bool)
    return _summary(labels, radial, tangential, moving, valid)


def classify_flow_lines(
    start: jnp.ndarray,
    stop: jnp.ndarray,
    valid: jnp.ndarray,
    vp_xy: jnp.ndarray,
    min_mag: float = 0.5,
    radial_frac: float = 0.7071,
) -> MotionSummary:
    """Label (N, 2) flow-line segments (start -> stop) relative to the VP."""
    vec = stop - start
    labels, radial, tangential, moving = _classify(
        vec[:, 0], vec[:, 1], start[:, 0], start[:, 1], vp_xy,
        min_mag, radial_frac,
    )
    labels = jnp.where(valid, labels, STATIC)
    return _summary(labels, radial, tangential, moving, valid)
