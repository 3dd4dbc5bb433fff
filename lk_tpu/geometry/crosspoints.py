"""Pairwise flow-line intersections (cross points).

Replaces the reference's ``cross_point`` + itertools.combinations loop
(reference LK_Final.py:292-320,569-587) with a masked computation over a
static upper-triangular pair index set, preserving its IEEE quirks:

* slope/intercept form in raw image coordinates;
* a vertical *second* argument (x4==x3) is special-cased to x = x3, while a
  vertical *first* argument divides by zero and propagates inf/nan
  (LK_Final.py:305-319 handles only line2);
* exactly parallel slopes return nan;
* NOTE the reference calls cross_point(concat(l2), concat(l1)) — argument
  order swapped relative to the combinations order (LK_Final.py:576-577).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=16)
def PAIR_INDICES(n: int):
    """Static (i, j) index arrays for all i<j pairs in combinations order."""
    idx = [(i, j) for i in range(n) for j in range(i + 1, n)]
    a = np.array([p[0] for p in idx], dtype=np.int32)
    b = np.array([p[1] for p in idx], dtype=np.int32)
    return a, b


def cross_point_pairs(start: jnp.ndarray, stop: jnp.ndarray):
    """All-pairs intersections; returns (P, 2) xy with nan where undefined.

    start/stop: (N, 2) line endpoints.  Pair p intersects the infinite lines
    through (start[i], stop[i]) and (start[j], stop[j]) with the reference's
    argument order: line1 = pair's *second* line (j), line2 = first (i).
    """
    ii, jj = PAIR_INDICES(start.shape[0])
    # line1 = l2 (index j), line2 = l1 (index i)  (LK_Final.py:576-577)
    x1, y1 = start[jj, 0], start[jj, 1]
    x2, y2 = stop[jj, 0], stop[jj, 1]
    x3, y3 = start[ii, 0], start[ii, 1]
    x4, y4 = stop[ii, 0], stop[ii, 1]

    k1 = (y2 - y1) / (x2 - x1)            # vertical line1 -> inf propagates
    b1 = y1 - x1 * k1
    vertical2 = (x4 - x3) == 0
    k2 = jnp.where(vertical2, 0.0, (y4 - y3) / jnp.where(vertical2, 1.0, x4 - x3))
    b2 = jnp.where(vertical2, 0.0, y3 - x3 * k2)

    parallel = (k1 - k2) == 0
    x_gen = (b2 - b1) / jnp.where(parallel, 1.0, k1 - k2)
    x = jnp.where(vertical2, x3, jnp.where(parallel, jnp.nan, x_gen))
    y = k1 * x + b1
    y = jnp.where(~vertical2 & parallel, jnp.nan, y)
    return jnp.stack([x, y], axis=-1)
