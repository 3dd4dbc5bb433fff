"""Spatial derivatives for the LK structure tensor.

OpenCV's pyramidal LK computes spatial gradients with the Scharr-style
separable kernel: smoothing [3,10,3] cross the central difference [-1,0,1]
(reference behavior of ``cv.calcOpticalFlowPyrLK``, LK_Final.py:531).  We use
the normalized float equivalent (divide by 32) so the LK normal equations are
in true intensity-gradient units; border handling is REFLECT_101 like the
padded OpenCV pyramid.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from lk_tpu.ops.blur import _sep_filter_axis


def _diff_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Central difference [-1, 0, 1]/2 with REFLECT_101 border."""
    return _sep_filter_axis(x, (-0.5, 0.0, 0.5), axis)


def scharr_derivatives(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via normalized Scharr: smooth [3,10,3]/16, diff [-1,0,1]/2."""
    smooth = (3 / 16, 10 / 16, 3 / 16)
    x = img.astype(jnp.float32)
    ix = _diff_axis(_sep_filter_axis(x, smooth, axis=-2), axis=-1)
    iy = _diff_axis(_sep_filter_axis(x, smooth, axis=-1), axis=-2)
    return ix, iy


def sobel_derivatives(img: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) via normalized 3x3 Sobel: smooth [1,2,1]/4, diff [-1,0,1]/2.

    Used by the Shi–Tomasi response (cv.cornerMinEigenVal uses Sobel ksize=3,
    reference gFTT calls at LK_Final.py:488,691).
    """
    smooth = (0.25, 0.5, 0.25)
    x = img.astype(jnp.float32)
    ix = _diff_axis(_sep_filter_axis(x, smooth, axis=-2), axis=-1)
    iy = _diff_axis(_sep_filter_axis(x, smooth, axis=-1), axis=-2)
    return ix, iy
