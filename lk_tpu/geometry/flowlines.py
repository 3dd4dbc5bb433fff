"""Flow-line segment statistics and quality filtering, vectorized over slots.

Replaces the reference's per-segment ``FlowLine`` objects
(reference LK_Final.py:248-290) and the per-point accept loop
(LK_Final.py:548-566) with fixed-shape masked tensor math.

Conventions preserved exactly:

* the vector is y-flipped into math coordinates before length/angle
  (LK_Final.py:275-276);
* length is rounded to 2 decimals (LK_Final.py:277) — it feeds threshold
  comparisons, so the rounding is behavior, not cosmetics;
* angle in degrees in [0, 360): arccos(vx/|v|) reflected when the flipped
  vy < 0 (LK_Final.py:105-121);
* the accept rule is sequential per group because the EMA-updated avg_len
  threshold reads each accepted line in slot order (LK_Final.py:556-559);
  LK_Final updates the EMA *before* its accept test, LK3 *after*
  (LK3_classification.py:411-417) — both orders supported.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class FlowLineStats(NamedTuple):
    start: jnp.ndarray    # (N, 2) image coords
    stop: jnp.ndarray     # (N, 2)
    length: jnp.ndarray   # (N,) rounded to 2 decimals
    angle: jnp.ndarray    # (N,) degrees [0, 360)
    moving: jnp.ndarray   # (N,) bool — start != stop (LK_Final.py:551)


def flow_line_stats(
    start: jnp.ndarray, stop: jnp.ndarray
) -> FlowLineStats:
    """Vectorized FlowLine construction from (N, 2) old/new point arrays."""
    start = start.astype(jnp.float32)
    stop = stop.astype(jnp.float32)
    vx = stop[:, 0] - start[:, 0]
    vy = -(stop[:, 1] - start[:, 1])  # y-flip into math coords
    norm = jnp.sqrt(vx * vx + vy * vy)
    length = jnp.round(norm * 100.0) / 100.0
    cosang = jnp.where(norm > 0, jnp.clip(vx / jnp.where(norm > 0, norm, 1.0),
                                          -1.0, 1.0), 1.0)
    ang = jnp.arccos(cosang) / jnp.pi * 180.0
    angle = jnp.where(vy < 0, 360.0 - ang, ang)
    moving = (vx != 0) | (vy != 0)
    return FlowLineStats(start=start, stop=stop, length=length, angle=angle,
                         moving=moving)


def flow_line_filter(
    stats: FlowLineStats,
    valid: jnp.ndarray,
    avg_len: jnp.ndarray,
    min_fl_len: float,
    fl_update_rate: float,
    update_before_test: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sequential EMA quality filter over one group's line slots.

    Returns (accepted (N,) bool, new avg_len scalar).  Reproduces
    LK_Final.py:555-559: candidate lines (valid, moving, angle > 180,
    length > MIN_FL_LEN) update the group EMA average length and are accepted
    when longer than it; update/accept order per ``update_before_test``.
    """
    r = jnp.float32(fl_update_rate)
    candidate = (
        valid & stats.moving & (stats.angle > 180.0)
        & (stats.length > min_fl_len)
    )

    def body(carry, inp):
        avg = carry
        is_cand, length = inp
        upd = (avg + length * r) / (1.0 + r)
        if update_before_test:
            avg_for_test = jnp.where(is_cand, upd, avg)
            accept = is_cand & (length > avg_for_test)
            new_avg = jnp.where(is_cand, upd, avg)
        else:
            accept = is_cand & (length > avg)
            new_avg = jnp.where(is_cand, upd, avg)
        return new_avg, accept

    new_avg, accepted = jax.lax.scan(
        body, avg_len.astype(jnp.float32), (candidate, stats.length)
    )
    return accepted, new_avg
