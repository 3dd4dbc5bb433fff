"""Color conversion (replaces ``cv.cvtColor(BGR2GRAY)``, reference LK_Final.py:402).

OpenCV 5.x computes gray with shift-15 fixed-point coefficients
(verified bit-exact against cv2 5.0):  y = (9798*R + 19235*G + 3735*B + 2^14) >> 15.
The float path uses the same Rec.601 weights.
"""

from __future__ import annotations

import jax.numpy as jnp

_R, _G, _B = 9798, 19235, 3735  # shift-15 fixed point (sum = 32768)
_SHIFT = 15


def bgr_to_gray(bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR (..., H, W, 3) float -> gray (..., H, W) float32 (no rounding).

    Input may be any float dtype in 0..255 scale; output float32.
    """
    b = bgr[..., 0].astype(jnp.float32)
    g = bgr[..., 1].astype(jnp.float32)
    r = bgr[..., 2].astype(jnp.float32)
    return (
        r * jnp.float32(0.299) + g * jnp.float32(0.587) + b * jnp.float32(0.114)
    )


def bgr_to_gray_u8(bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact uint8 path matching cv2 5.0's fixed-point BGR2GRAY."""
    b = bgr_u8[..., 0].astype(jnp.int32)
    g = bgr_u8[..., 1].astype(jnp.int32)
    r = bgr_u8[..., 2].astype(jnp.int32)
    y = (r * _R + g * _G + b * _B + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)
