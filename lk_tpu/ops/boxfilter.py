"""Windowed (box) sums — the LK structure-tensor accumulator.

OpenCV's LK window is an unweighted box (winSize=(15,15), reference
LK_Final.py:94).  For the dense flow path we need box-filtered sums of
gradient products over the whole frame; ``jax.lax.reduce_window`` lowers to an
efficient fused TPU reduction, and XLA fuses the elementwise products into it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def box_sum(
    x: jnp.ndarray, win: Tuple[int, int], border: str = "zero"
) -> jnp.ndarray:
    """SAME windowed sum over trailing (H, W) axes.

    win is (win_w, win_h) in OpenCV order.  border: "zero" (cheap; partial
    windows at the frame edge) or "reflect" (BORDER_REFLECT_101, matching
    OpenCV's boxFilter default — needed where border responses must match,
    e.g. the Shi–Tomasi response).
    """
    win_w, win_h = win
    pad_h = (win_h - 1) // 2, win_h // 2
    pad_w = (win_w - 1) // 2, win_w // 2
    x = x.astype(jnp.float32)
    if border == "reflect":
        pads = [(0, 0)] * (x.ndim - 2) + [pad_h, pad_w]
        x = jnp.pad(x, pads, mode="reflect")
        padding = [(0, 0)] * x.ndim
    elif border == "zero":
        padding = [(0, 0)] * (x.ndim - 2) + [pad_h, pad_w]
    else:
        raise ValueError(f"unknown border mode {border!r}")
    dims = [1] * (x.ndim - 2) + [win_h, win_w]
    strides = [1] * x.ndim
    return jax.lax.reduce_window(
        x,
        jnp.float32(0),
        jax.lax.add,
        window_dimensions=dims,
        window_strides=strides,
        padding=padding,
    )
