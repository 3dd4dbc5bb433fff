"""Contrast/brightness tone curve (reference ``modify_contrast_and_brightness``).

The LK3 variant sharpens contrast before feature tracking with the curve
``img' = (img - 127.5*(1-B)) * k + 127.5*(1+B)``, ``k = tan((45 + 44c)/180*pi)``
with brightness/contrast in -255..255 units, clipped to 0..255
(reference LK3_classification.py:225-241; present-but-disabled in
LK_Final.py:347-373,407).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def contrast_brightness(
    img: jnp.ndarray, brightness: float = 0.0, contrast: float = 100.0
) -> jnp.ndarray:
    b = brightness / 255.0
    c = contrast / 255.0
    k = math.tan((45.0 + 44.0 * c) / 180.0 * math.pi)
    out = (img.astype(jnp.float32) - 127.5 * (1.0 - b)) * k + 127.5 * (1.0 + b)
    return jnp.clip(out, 0.0, 255.0)
