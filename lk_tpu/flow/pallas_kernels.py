"""Pallas TPU kernels for the dense-LK hot path.

``pallas_local_warp`` — the bilinear warp that dominates dense LK's cost.

The XLA path (ops/warp.py shift_select_warp) must branch over every integer
displacement in a *static* bound (2*(R+1) masked shifted adds per axis,
R=32 at level 0) because XLA cannot do data-dependent addressing.  Pallas
can: flow is spatially smooth, so per (16 x 384) tile this kernel

  1. reduces the tile's mean integer displacement (dy0, dx0),
  2. DMAs the source window at that *dynamic* offset from HBM
     (next[y0+dy0-L : ..., x0+dx0-L : ...]),
  3. selects only over the residual range |v - v_mean| <= L (L=8 static)
     with the same separable two-pass bilinear blend.

Cost per pixel drops from 2*2*(R+1) masked terms to 2*2*(L+1) — ~4x fewer
vector ops at R=32 — and the gather never touches XLA's pathological
one-element-DMA path.  Residual displacement beyond L clamps toward the tile
mean (same failure mode as the XLA path's global clamp, but localized; flow
smoothness makes it rare — tests assert parity with the XLA warp on smooth
fields and EPE on real LK solves).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 384
LOCAL = 8  # static residual displacement range around the tile mean


def _pow2_lanes(n: int) -> int:
    """Smallest power-of-two multiple of 128 that is >= n."""
    v = 128
    while v < n:
        v *= 2
    return v


def pick_tile_w(w: int) -> tuple[int, int]:
    """(tile_w, padded_w) minimizing frame padding under Mosaic's rule that
    block widths be 128-divisible or equal to the array width.

    Heavy padding is not just wasted compute — tiles dominated by padded
    (frozen) flow get an unrepresentative reference displacement and clamp
    real pixels' residuals (measured: mean EPE 0.35 vs 0.027 on a 9 px shift
    at 640-wide frames padded to 768).  Wide single tiles also hurt: the
    per-tile residual range must cover the flow variation across the tile.
    """
    if w <= 512:
        return w, w                      # single full-width tile (legal)
    for tw in (512, 384, 256, 128):
        if w % tw == 0:
            return tw, w                 # exact tiling, no padding
    padded = -(-w // 128) * 128
    return 128, padded                   # minimal pad, narrow tiles


def _warp_kernel(next_hbm, fx_ref, fy_ref, out_ref, scratch, sem,
                 *, h, w, pad, max_disp, tile_h, tile_w, local):
    # next_hbm is the (h + 2*pad, w + 2*pad) edge-padded image with
    # pad = max_disp + local + 1, so the DMA window below always fits
    # without clamping for |mean displacement| <= max_disp.
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    y0 = ti * tile_h
    x0 = tj * tile_w
    fx = fx_ref[:]
    fy = fy_ref[:]

    # Mosaic requires DMA slice offsets/shapes aligned to the (8, 128) f32
    # tiling.  Rows: align down to 8 and widen the vertical select range by
    # the 0..7 remainder.  Columns: align down to 128 and rotate the window
    # left by the 0..127 remainder after the copy (dynamic lane roll).
    # The dynamic roll is only correct for power-of-two lane-group counts
    # (measured: 640/768 lanes rotate off by (groups-2)*128), so sw rounds
    # up to a power-of-two multiple of 128.
    sh = -(-(tile_h + 2 * local + 8) // 8) * 8
    sw = _pow2_lanes(tile_w + 2 * local + 1 + 127)
    bound = jnp.float32(max_disp)

    # Reference displacement for the tile: the center pixel's flow.  More
    # robust than the tile mean when part of the tile is frame padding or a
    # flow discontinuity (measured: mean-skew at padded tiles cost ~0.2 px
    # EPE near seams).
    cy, cx = tile_h // 2, tile_w // 2
    dy0 = jnp.round(
        jnp.clip(fy[cy, cx], -bound, bound)
    ).astype(jnp.int32)
    dx0 = jnp.round(
        jnp.clip(fx[cy, cx], -bound, bound)
    ).astype(jnp.int32)
    src_y_raw = y0 + pad + dy0 - local
    src_x_raw = x0 + pad + dx0 - local
    # multiple_of: Mosaic must *prove* tile-aligned DMA offsets; without the
    # hint it miscompiles (wrong windows) or rejects the slice.
    src_y = pl.multiple_of((src_y_raw // 8) * 8, 8)
    src_x = pl.multiple_of((src_x_raw // 128) * 128, 128)
    extra_y = src_y_raw - src_y        # 0..7, folded into rel_y
    extra_x = src_x_raw - src_x        # 0..127, undone by the roll below

    dma = pltpu.make_async_copy(
        next_hbm.at[pl.ds(src_y, sh), pl.ds(src_x, sw)],
        scratch,
        sem,
    )
    dma.start()

    # local float source coords relative to the scratch window
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    # global sample position clamped to the frame (edge-clamp semantics)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    gx = jnp.clip(cols + x0 + jnp.clip(fx, -bound, bound), 0.0, w - 1.0)
    rel_y = jnp.clip(
        gy + pad - src_y_raw.astype(jnp.float32) - rows, 0.0, 2.0 * local
    ) + extra_y.astype(jnp.float32)
    rel_x = jnp.clip(
        gx + pad - src_x_raw.astype(jnp.float32) - cols, 0.0, 2.0 * local
    )
    dyi = jnp.floor(rel_y)
    dxi = jnp.floor(rel_x)
    fy_frac = rel_y - dyi
    fx_frac = rel_x - dxi
    dyi = dyi.astype(jnp.int32)
    dxi = dxi.astype(jnp.int32)

    dma.wait()
    # undo the column alignment: rotate window left by extra_x lanes
    win = pltpu.roll(scratch[:], shift=-extra_x, axis=1)

    vw = tile_w + 2 * local + 1   # columns the horizontal pass consumes

    def widen(a):
        # extend (tile_h, tile_w) -> (tile_h, vw) replicating the last column
        # (jnp.pad edge-mode does not lower in Mosaic)
        tail = jnp.broadcast_to(a[:, tile_w - 1:tile_w], (tile_h, vw - tile_w))
        return jnp.concatenate([a, tail], axis=1)

    # vertical pass; rel_y spans [0, 2*local + 7] (the +7 from row alignment).
    # sel is only defined on tile columns; halo columns reuse the edge
    # column's selection — the horizontal pass only reads column c + dxi(c)
    # for output column c, where rel_y's column mismatch is the same
    # second-order flow-Jacobian term the separable XLA warp has.
    acc0 = jnp.zeros((tile_h, vw), jnp.float32)
    acc1 = jnp.zeros((tile_h, vw), jnp.float32)
    for d in range(2 * local + 8):
        sel_w = widen((dyi == d).astype(jnp.float32))
        acc0 = acc0 + sel_w * win[d:d + tile_h, :vw]
        acc1 = acc1 + sel_w * win[d + 1:d + 1 + tile_h, :vw]
    fy_w = widen(fy_frac)
    vert = acc0 + fy_w * (acc1 - acc0)   # (tile_h, vw)

    # horizontal pass
    o0 = jnp.zeros((tile_h, tile_w), jnp.float32)
    o1 = jnp.zeros((tile_h, tile_w), jnp.float32)
    for d in range(2 * local + 1):
        sel = (dxi == d).astype(jnp.float32)
        o0 = o0 + sel * vert[:, d:d + tile_w]
        o1 = o1 + sel * vert[:, d + 1:d + 1 + tile_w]
    out_ref[:] = o0 + fx_frac * (o1 - o0)


def pallas_local_warp(
    next_img: jnp.ndarray, flow: jnp.ndarray, max_disp: int = 32,
    tile_h: int = TILE_H, tile_w: int = TILE_W, local: int = LOCAL,
) -> jnp.ndarray:
    """out(p) = next(p + clamp(flow(p), ±max_disp)) bilinear.

    H % tile_h == 0 and W % tile_w == 0 required (flow.dense pads).
    Per-tile residual displacement beyond ±local of the tile mean clamps.
    """
    h, w = next_img.shape
    assert h % tile_h == 0 and w % tile_w == 0, (h, w)
    sh = -(-(tile_h + 2 * local + 8) // 8) * 8
    sw = _pow2_lanes(tile_w + 2 * local + 1 + 127)
    # pad generously: alignment can move the window down/right by up to the
    # rounding slack, and the aligned window shape exceeds the logical one
    pad = max_disp + local + 1 + max(sh, sw - tile_w)
    padded = jnp.pad(next_img.astype(jnp.float32), pad, mode="edge")
    grid = (h // tile_h, w // tile_w)
    kernel = functools.partial(
        _warp_kernel, h=h, w=w, pad=pad, max_disp=max_disp,
        tile_h=tile_h, tile_w=tile_w, local=local,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # whole padded next, HBM
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(padded, flow[..., 0].astype(jnp.float32),
      flow[..., 1].astype(jnp.float32))
