"""Pallas TPU kernels for the dense-LK hot path.

Two kernels built on the same locality trick:

``pallas_local_warp`` — the bilinear warp alone.  The XLA path
(ops/warp.py shift_select_warp) must branch over every integer displacement
in a *static* bound (2*(R+1) masked shifted adds per axis, R=32 at level 0)
because XLA cannot do data-dependent addressing — and XLA fully unrolls the
loop, so program size scales with the array (2.2 GB executable at 2176x1920,
measured).  Pallas can address data-dependently: flow is spatially smooth, so
per tile the kernel (1) picks a reference displacement (the tile-center
flow), (2) DMAs the source window at that dynamic offset from HBM, (3)
selects only over the ±local residual range.

``pallas_fused_lk_iter`` — one whole inverse-compositional dense-LK iteration
per tile: the warp above on a +8-halo extended region, the residual
r = jw - prev - gI.v, the two 15x15 box sums of gI*r, the A.v correction and
the 2x2 solve — all in VMEM, writing only the updated flow.  The XLA pipeline
round-trips ~10 full-frame arrays through HBM per iteration; this kernel
reads 6 windows and writes 2 tiles.

Mosaic rules encoded here (each one measured the hard way):
* DMA slice offsets/shapes must be (8, 128)-aligned and *provably* so
  (pl.multiple_of) — align down, fold the row remainder into the vertical
  select range, undo the column remainder with a dynamic lane roll;
* the dynamic roll is only correct for power-of-two lane-group counts
  (640/768 lanes rotate off by (groups-2)*128) — window widths round up to
  a power of two;
* float iota is rejected (int iota + astype);
* jnp.pad(mode='edge') does not lower (broadcast+concat instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64
TILE_W = 384
# Static residual displacement range around the tile reference.  Swept on
# v5e at 1080p (8/6/4): 6 beats 8 on BOTH speed (fewer select taps) and
# EPE (trans 0.007 vs 0.014, rot 0.052 vs 0.071 — the clamp regularizes
# per-pixel noise toward the tile reference); 4 is faster still but halves
# the margin against real flow variation across a 512-wide tile.
LOCAL = 6


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
    at 640-wide frames padded to 768).  Among equal-padding choices, WIDER
    tiles win: per-grid-step DMA latency (~6 us, measured) dominates small
    tiles, so fewer steps beats narrower windows (e.g. 960 wide: 2 tiles of
    512 on a 64-px pad, not 8 tiles of 128).
    """
    if w <= 512:
        return w, w                      # single full-width tile (legal)
    best = None
    for tw in (512, 384, 256, 128):
        padded = -(-w // tw) * tw
        waste = padded - w
        if best is None or waste < best[0]:
            best = (waste, tw, padded)
    _, tw, padded = best
    return tw, padded


def _win_shape(th: int, tw: int, local: int) -> tuple[int, int]:
    sh = -(-(th + 2 * local + 8) // 8) * 8
    sw = _pow2_lanes(tw + 2 * local + 1 + 127)
    return sh, sw


def _asym_pads(tile_h: int, tile_w: int, sh: int, sw: int,
               max_disp: int, local: int) -> tuple[int, int, int, int]:
    """(top, bottom, left, right) frame paddings for the fused kernels.

    The warp-window slice must stay in-bounds for every reference
    displacement in ±max_disp with the extended region's top-left ranging
    down to (-_HALO, -_HALO).  Only the RIGHT side pays for the
    power-of-two window width (sw >> etw); the other sides stay
    ~max_disp-sized — a symmetric pad materializes tens of MB of
    edge-replication per 1080p level call for no reason (measured).
    """
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    pad_t = max_disp + local + _HALO + 8
    pad_b = max_disp + local + (sh - eth) + _HALO + 16
    pad_l = max_disp + local + _HALO + 8
    pad_r = max_disp + local + (sw - etw) + _HALO + 16
    # static in-bounds proof for the worst-case slices
    assert pad_t - _HALO - max_disp - local >= 0
    assert pad_l - _HALO - max_disp - local >= 0
    assert max_disp - local + sh - tile_h - _HALO <= pad_b
    assert max_disp - local + sw - tile_w - _HALO <= pad_r
    return pad_t, pad_b, pad_l, pad_r


def unified_pad_geometry(tile_h: int, tile_w: int, max_disp: int,
                         local: int) -> tuple[int, int, int, int]:
    """(top, bottom, left, right) pads for ONE edge-padded frame that serves
    BOTH roles of the grads kernels: the fixed-offset prev-window reads
    (which the old layout gave a ((16, 16), (128, 256)) pad) and the
    dynamic-offset warp-window reads (the old asymmetric ``next`` pad).

    The video scan pads each frame ONCE per level into this layout and
    carries it — the per-call ``jnp.pad`` of next AND prev inside
    make_fused_lk_level_grads (~46 MB of HBM copy traffic per 1080p L0
    call, and each video frame paid it twice: once as next, once as prev)
    disappears.  Alignment: top ≡ 0 (mod 8) so the prev-read row offset
    (top - 16) + ti*tile_h stays provably 8-aligned; left is exactly 128
    (the prev layout's column origin, so the in-kernel column arithmetic
    is unchanged) — valid because the warp's left need is
    max_disp + local + 24 < 128 for every production level.
    """
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    sh, sw = _win_shape(eth, etw, local)
    wt, wb, wl, wr = _asym_pads(tile_h, tile_w, sh, sw, max_disp, local)
    assert wl <= 128, (wl, max_disp, local)
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    pt = -(-max(wt, 16) // 8) * 8
    pb = max(wb, 16)
    pl = 128
    pr = max(wr, etw_dma_p - tile_w - 128)
    return pt, pb, pl, pr


def _warp_start(next_hbm, ref_fx, ref_fy, y0, x0, scratch, sem,
                *, pad_y, pad_x, max_disp, local, frame=None):
    """Issue the warp-window DMA for a (th, tw) region at global (y0, x0).

    Needs only a scalar reference displacement (ref_fx, ref_fy) — callers
    pass the tile-center flow value — so the DMA can start as soon as that
    value is known and overlap with unrelated compute
    (Scharr/structure-tensor work) before calling ``_warp_finish``.

    pad_y/pad_x: the TOP/LEFT padding of next_hbm (padding may be
    asymmetric: the power-of-two window width forces a large right pad,
    which the other three sides need not pay).

    frame: when next_hbm is a stacked (F, H, W) frames array (the
    frame-batched kernels), the leading index of the plane to read.
    """
    bound = jnp.float32(max_disp)
    dy0 = jnp.round(jnp.clip(ref_fy, -bound, bound)).astype(jnp.int32)
    dx0 = jnp.round(jnp.clip(ref_fx, -bound, bound)).astype(jnp.int32)
    src_y_raw = y0 + pad_y + dy0 - local
    src_x_raw = x0 + pad_x + dx0 - local
    # multiple_of: Mosaic must *prove* tile-aligned DMA offsets; without the
    # hint it miscompiles (wrong windows) or rejects the slice.
    src_y = pl.multiple_of((src_y_raw // 8) * 8, 8)
    src_x = pl.multiple_of((src_x_raw // 128) * 128, 128)
    sh, sw = scratch.shape
    if frame is None:
        src = next_hbm.at[pl.ds(src_y, sh), pl.ds(src_x, sw)]
    else:
        src = next_hbm.at[frame, pl.ds(src_y, sh), pl.ds(src_x, sw)]
    dma = pltpu.make_async_copy(src, scratch, sem)
    dma.start()
    return dma, src_y_raw, src_x_raw, src_y, src_x


def _tent_gather(win, rel, axis, out_len, local):
    """Per-pixel 2-tap tent interpolation along ``axis`` of ``win``:

        out[i] = (1 - f) * win[i + di] + f * win[i + di + 1],
        di = floor(rel), f = rel - di,  rel pre-clipped to [0, 2*local]

    as two equality-select chains (win[di] and win[di+1]) SHARING the
    2*local+2 shifted window views, then ONE lerp.  The dense tent-tap sum
    (max(0, 1-|rel-d|) weight per tap) costs ~6 VPU ops per tap on the full
    plane; this form costs the same shifted views plus 1 compare + 2
    selects per tap and the lerp — ~1.9x fewer ops, and BIT-IDENTICAL
    output: the dense sum has exactly two nonzero terms, (1-f)*win[di+i]
    added first and f*win[di+1+i] second, i.e. the same two-term float sum
    this computes directly.  (A log-depth bit-decomposed shift tree does
    NOT work here: with per-pixel di, round k's reads of the partially
    selected array evaluate round k-1's masks at the shifted index.)"""
    taps = [jax.lax.slice_in_dim(win, d, d + out_len, axis=axis)
            for d in range(2 * local + 2)]
    di_f = jnp.floor(rel)
    f = rel - di_f
    di = di_f.astype(jnp.int32)
    t0, t1 = taps[0], taps[1]
    for d in range(1, 2 * local + 1):
        c = di == d
        t0 = jnp.where(c, taps[d], t0)
        t1 = jnp.where(c, taps[d + 1], t1)
    return (1.0 - f) * t0 + f * t1


def _warp_finish(state, fx, fy, y0, x0, scratch,
                 *, h, w, pad_y, pad_x, max_disp, th, tw, local):
    """Select/lerp phase of the warp; waits the DMA issued by _warp_start.

    Both alignment remainders are undone on the window itself — the column
    remainder by Mosaic's dynamic lane roll, the ROW remainder by three
    static-shift sublane rolls selected by the bits of extra_y (the dynamic
    axis-0 roll is miscompiled for non-power-of-two sublane-group counts:
    measured (304, *) shifts by s+32 and (40, *) by s+24, while 64 rows is
    exact; static shifts are exact at any geometry).  With the row shift
    gone from rel_y, each select pass is one bit-decomposed 2-tap gather
    (_tent_gather) — the round-3 ablation (scripts/exp_resident_ablate.py)
    measured the previous dense 2*local+2-tap form as ~55% of the whole
    resident iteration."""
    dma, src_y_raw, src_x_raw, src_y, src_x = state
    bound = jnp.float32(max_disp)
    extra_y = src_y_raw - src_y        # 0..7, undone by the axis-0 rolls
    extra_x = src_x_raw - src_x        # 0..127, undone by the lane roll

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    # global sample position clamped to the frame (edge-clamp semantics)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    gx = jnp.clip(cols + x0 + jnp.clip(fx, -bound, bound), 0.0, w - 1.0)
    # cancel the pad in INT arithmetic (src_*_raw - pad ≡ origin + d0 -
    # local exactly): float-adding pad before subtracting src_raw rounds
    # differently per pad constant, making outputs differ in the last ulp
    # between frame layouts (per-call asym pads vs the unified prepadded
    # video layout) — the prepadded-parity tests pin bit-equality instead
    rel_y = jnp.clip(
        gy - (src_y_raw - pad_y).astype(jnp.float32) - rows, 0.0, 2.0 * local
    )
    rel_x = jnp.clip(
        gx - (src_x_raw - pad_x).astype(jnp.float32) - cols, 0.0, 2.0 * local
    )

    dma.wait()
    # undo the column alignment: rotate window left by extra_x lanes.
    # Widen BEFORE the roll: a bf16 window halves the DMA, but Mosaic's
    # dynamic rotate only implements 32-bit data.
    win = pltpu.roll(scratch[:].astype(jnp.float32), shift=-extra_x, axis=1)

    vw = tw + 2 * local + 1   # columns the horizontal pass consumes
    # slice to the used columns before the row rolls (lane-aligned = free)
    wp = -(-vw // 128) * 128
    win = win[:, :wp]
    for bit in (1, 2, 4):
        r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
        win = jnp.where((extra_y & bit) != 0, r, win)

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, wp - tw))
        return jnp.concatenate([a, tail], axis=1)

    # vertical pass; halo columns reuse the edge column's selection — the
    # horizontal pass only reads column c + dxi(c) for output column c,
    # where rel_y's column mismatch is the same second-order flow-Jacobian
    # term as the separable XLA warp's.
    vert = _tent_gather(win, widen(rel_y), axis=0, out_len=th, local=local)
    return _tent_gather(vert, rel_x, axis=1, out_len=tw, local=local)


def _warp_core(next_hbm, fx, fy, y0, x0, scratch, sem,
               *, h, w, pad_y, pad_x, max_disp, th, tw, local,
               ref_cy, ref_cx, frame=None):
    """Warp a (th, tw) region whose top-left is global (y0, x0).

    next_hbm: edge-padded image in HBM with pad_y rows above / pad_x cols
    left of frame (0, 0).  fx/fy: flow on the region.  Reference
    displacement read at (ref_cy, ref_cx).  Returns the warped (th, tw)
    block; residual displacement beyond ±local of the reference clamps.
    frame: leading index when next_hbm is a stacked (F, H, W) array.
    """
    state = _warp_start(
        next_hbm, fx[ref_cy, ref_cx], fy[ref_cy, ref_cx], y0, x0, scratch,
        sem, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, local=local,
        frame=frame,
    )
    return _warp_finish(
        state, fx, fy, y0, x0, scratch,
        h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
        th=th, tw=tw, local=local,
    )


def _warp_kernel(next_hbm, fx_ref, fy_ref, out_ref, scratch, sem,
                 *, h, w, pad, max_disp, tile_h, tile_w, local):
    y0 = pl.program_id(0) * tile_h
    x0 = pl.program_id(1) * tile_w
    out_ref[:] = _warp_core(
        next_hbm, fx_ref[:], fy_ref[:], y0, x0, scratch, sem,
        h=h, w=w, pad_y=pad, pad_x=pad, max_disp=max_disp, th=tile_h,
        tw=tile_w,
        local=local, ref_cy=tile_h // 2, ref_cx=tile_w // 2,
    )


def pallas_local_warp(
    next_img: jnp.ndarray, flow: jnp.ndarray, max_disp: int = 32,
    tile_h: int = TILE_H, tile_w: int = TILE_W, local: int = LOCAL,
    window_dtype=jnp.float32,
) -> jnp.ndarray:
    """out(p) = next(p + clamp(flow(p), ±max_disp)) bilinear.

    H % tile_h == 0 and W % tile_w == 0 required (flow.dense pads).
    Per-tile residual displacement beyond ±local of the reference clamps.
    window_dtype=bfloat16 halves the per-tile window DMA (the image is
    0..255, so bf16 rounds intensities by <= 0.5); selects/lerp stay f32.
    """
    h, w = next_img.shape
    assert h % tile_h == 0 and w % tile_w == 0, (h, w)
    sh, sw = _win_shape(tile_h, tile_w, local)
    # pad generously: alignment can move the window down/right by up to the
    # rounding slack, and the aligned window shape exceeds the logical one
    pad = max_disp + local + 1 + max(sh, sw - tile_w)
    padded = jnp.pad(next_img.astype(window_dtype), pad, mode="edge")
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
            pltpu.VMEM((sh, sw), window_dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(padded, flow[..., 0].astype(jnp.float32),
      flow[..., 1].astype(jnp.float32))


# ---------------------------------------------------------------------------
# Fused inverse-compositional LK level: ALL iterations in one pallas_call
# ---------------------------------------------------------------------------

_HALO = 8  # rows/cols of halo the box sums need around a tile (win 15 -> ±7)


def _scharr_mxu_ok(etw: int, p_width: int) -> bool:
    """Geometry gate for the MXU-column Scharr: the blocked band matmuls
    read 256-col slices at 128-col strides, so the prev scratch must cover
    ceil(etw/128)*128 + 128 columns.  Every production tile width satisfies
    this exactly (etw_dma_p = tile_w + 256 = ow + 128)."""
    ow = -(-etw // 128) * 128
    return p_width >= ow + 128


def _scharr_mxu_cols(p, eth: int, etw: int):
    """Scharr ix/iy of the extended region with the COLUMN passes as
    blocked banded bf16 MXU matmuls.

    The direct form's column taps read the prev scratch at lane offsets
    119/120/121 — five lane-misaligned reads, each a Mosaic vector
    relayout (measured r4 ablation: swapping them for this form is
    19.8 -> 16.6 us/tile on the L0 grads kernel, scripts/exp_l0_ablate.py
    scharr_mxu case).  Scharr is separable, so the lane-offset work moves
    to the MXU exactly like _boxsum_tile_mxu:

        ix = rows_smooth(p) @ D    D: -/+0.5 band at j_out+119 / j_out+121
        iy = rows_diff(p)   @ S    S: (3,10,3)/16 band at j_out+119..121

    rows_smooth/rows_diff are SUBLANE taps (cheap VPU) and the band
    weights are exact in bf16.  The matmul INPUT rounds to bf16 — for ix
    that happens BEFORE the +-0.5 cancellation, i.e. ~0.25 absolute on
    pixel-scale data (ablation: flow max|diff| vs exact printed by
    EXP_CHECK; end-to-end gated by bench.py's two EPE scenes); for iy the
    input is already the (small) row difference, so its rounding is
    relative and benign.  Blocked into 128-output-column chunks consuming
    256-col input slices (~50M MACs per gradient plane at L0 geometry).
    """
    ow = -(-etw // 128) * 128
    sy = ((3.0 * p[7:7 + eth, :] + 10.0 * p[8:8 + eth, :]
           + 3.0 * p[9:9 + eth, :]) * (1.0 / 16.0)).astype(jnp.bfloat16)
    dr = ((p[9:9 + eth, :] - p[7:7 + eth, :]) * 0.5).astype(jnp.bfloat16)

    def col_band(vals):
        jc = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
        b = jnp.zeros((256, 128), jnp.float32)
        for k, v in enumerate(vals):
            b = b + jnp.where(jc == ic + 119 + k, v, 0.0)
        return b.astype(jnp.bfloat16)

    dmat = col_band((-0.5, 0.0, 0.5))
    smat = col_band((3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0))

    def apply(src, band):
        outs = []
        for c in range(ow // 128):
            outs.append(jax.lax.dot_general(
                src[:, c * 128:c * 128 + 256], band,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    return apply(sy, dmat)[:, :etw], apply(dr, smat)[:, :etw]


def _fused_level_kernel(
    next_hbm, static_hbm, flowbuf_hbm, a_ref,
    out_hbm,
    win_scratch, ext_scratch, flow_scratch, out_tile, sems,
    *, h, w, pad, max_disp, tile_h, tile_w, local, win_k, bound_f,
):
    """Grid step (k, ti, tj): iteration k of tile (ti, tj).

    The grid's outermost dim is the iteration loop — TPU grids execute
    sequentially, so every tile of iteration k completes before k+1 starts,
    giving Jacobi semantics via the ping-pong slots of ``flowbuf_hbm``
    (shape (4, hext, wext): slots [0:2] and [2:4] alternate as src/dst,
    input_output-aliased so flow never leaves HBM between iterations).
    """
    k = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    y0 = ti * tile_h
    x0 = tj * tile_w
    eth = tile_h + 2 * _HALO          # extended rows (halo for box sums)
    # DMA width must itself be a 128 multiple (Mosaic slice-shape rule)
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw = tile_w + 2 * _HALO          # columns actually used

    src = (k % 2) * 2                 # ping-pong source slot pair
    dst = 2 - src

    # --- fetch the extended windows: one stacked DMA for the static arrays
    # (prev, ix, iy) and one for the current flow (fx, fy).  Separate DMAs
    # serialize their latencies (measured); stacking amortizes them.
    row0 = pl.multiple_of(y0, 8)      # = y0 + gy - _HALO with gy == _HALO
    col0 = pl.multiple_of(x0, 128)
    dma_s = pltpu.make_async_copy(
        static_hbm.at[:, pl.ds(row0, eth), pl.ds(col0, etw_dma)],
        ext_scratch, sems.at[0],
    )
    dma_s.start()

    # Read iteration 0's flow from the (donated) input ref and later
    # iterations' from the output ref.  On hardware these are the same
    # memory (input_output_aliases), so this is a no-op distinction; in
    # interpret mode, which copies instead of aliasing, it makes the
    # ping-pong read the actually-written slots.
    @pl.when(k == 0)
    def _():
        d = pltpu.make_async_copy(
            flowbuf_hbm.at[
                pl.ds(src, 2), pl.ds(row0, eth), pl.ds(col0, etw_dma)
            ],
            flow_scratch, sems.at[1],
        )
        d.start()
        d.wait()

    @pl.when(k > 0)
    def _():
        d = pltpu.make_async_copy(
            out_hbm.at[
                pl.ds(src, 2), pl.ds(row0, eth), pl.ds(col0, etw_dma)
            ],
            flow_scratch, sems.at[1],
        )
        d.start()
        d.wait()

    c0 = 128 - _HALO                  # work-region column offset in the DMA
    fx_w = flow_scratch[0, :, c0:c0 + etw]
    fy_w = flow_scratch[1, :, c0:c0 + etw]

    # --- warp the extended region (its DMA overlaps the static wait) -------
    jw = _warp_core(
        next_hbm, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch, sems.at[2],
        h=h, w=w, pad_y=pad, pad_x=pad, max_disp=max_disp, th=eth, tw=etw,
        local=local, ref_cy=eth // 2, ref_cx=etw // 2,
    )
    dma_s.wait()
    prev_w = ext_scratch[0, :, c0:c0 + etw]
    ix_w = ext_scratch[1, :, c0:c0 + etw]
    iy_w = ext_scratch[2, :, c0:c0 + etw]

    # --- IC residual + gradient products ------------------------------------
    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    px = ix_w * r
    py = iy_w * r

    # --- 15x15 box sums to the tile region ----------------------------------
    # work row 8+r == tile row r; window offsets 1..15 stay in [0, eth).
    def boxsum(p):
        v = None
        for d in range(win_k):
            t = p[1 + d:1 + d + tile_h, :]
            v = t if v is None else v + t
        out = None
        for d in range(win_k):
            t = v[:, 1 + d:1 + d + tile_w]
            out = t if out is None else out + t
        return out

    b1 = boxsum(px)
    b2 = boxsum(py)

    # --- A.v correction + solve ---------------------------------------------
    # inv_det is 0 where the structure tensor is untrustworthy, so du/dv
    # vanish there — no separate validity mask needed.
    fx_t = fx_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    fy_t = fy_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    a11 = a_ref[0]
    a12 = a_ref[1]
    a22 = a_ref[2]
    invd = a_ref[3]
    b1 = b1 + a11 * fx_t + a12 * fy_t
    b2 = b2 + a12 * fx_t + a22 * fy_t
    du = (a12 * b2 - a22 * b1) * invd
    dv = (a12 * b1 - a11 * b2) * invd
    bound = jnp.float32(bound_f)
    fx_new = jnp.clip(fx_t + du, -bound, bound)
    fy_new = jnp.clip(fy_t + dv, -bound, bound)
    # The write width must be 128-aligned (Mosaic slice-shape rule); when
    # tile_w is not (e.g. the 480-wide single tile at pyramid level 2), the
    # extra columns carry edge replication — for the rightmost tile that
    # refreshes the right halo band; for interior tiles the next tile in
    # this same sequential grid iteration overwrites the spill.
    tw_dma_out = out_tile.shape[-1]
    if tw_dma_out != tile_w:
        ext = tw_dma_out - tile_w
        fx_new = jnp.concatenate(
            [fx_new, jnp.broadcast_to(fx_new[:, -1:], (tile_h, ext))], axis=1
        )
        fy_new = jnp.concatenate(
            [fy_new, jnp.broadcast_to(fy_new[:, -1:], (tile_h, ext))], axis=1
        )
    out_tile[0] = fx_new
    out_tile[1] = fy_new

    dma_o = pltpu.make_async_copy(
        out_tile,
        out_hbm.at[
            pl.ds(dst, 2),
            pl.ds(pl.multiple_of(y0 + _HALO, 8), tile_h),
            pl.ds(pl.multiple_of(x0 + 128, 128), tw_dma_out),
        ],
        sems.at[3],
    )
    dma_o.start()
    dma_o.wait()


def _boxsum_tile_mxu(p, win_k: int, tile_h: int, tile_w: int):
    """win_k x win_k box sum of the extended-region array ``p`` at the tile
    pixels, as banded matmuls on the MXU: out = R @ (p @ C) with 0/1
    band matrices built from iota (R[r, j] = [j in r+1 .. r+win_k]).

    The shifted-add form costs win_k lane-offset slices per axis — each a
    vector relayout in Mosaic (measured: 5 such box sums dominate the fused
    kernel).  The band matrices are exact in bf16, so casting the *data*
    once to bf16 runs the MXU at full rate with f32 accumulation
    (preferred_element_type); the data rounding is <= 1e-2 relative, gated
    end-to-end by bench.py's EPE check.

    Where the geometry allows, the band matmuls are BLOCKED: the dense
    forms waste MACs on the zero band tails (at the L0 272x512 tile the
    column pass is 288x528x512 and the row pass 272x288x512 per sum —
    118M MACs).  Splitting the column pass into 128-output-column chunks
    (each consuming a 256-col input slice) and the row pass into two
    tile_h/2-row chunks (160-row slices) sums the SAME win_k values with
    ~60M MACs — measured 22.7 -> 18.8 us/tile on the full L0 grads kernel
    (scripts/exp_l0_ablate.py), output differing only in MXU accumulation
    order (<= 5e-7 on image-scale data).  Packing several planes through
    one axis-0 concat does NOT work: Mosaic rejects concatenating vectors
    whose lane offsets differ ("offset mismatch on non-concat dimension").
    """
    eth, etw = p.shape
    kc, kr = 256, 160
    rh = tile_h // 2
    col_ok = (tile_w % 128 == 0 and etw >= kc
              and (tile_w - 128) - (etw - kc) + 127 + win_k <= kc - 1)
    row_ok = (tile_h % 16 == 0 and eth >= kr and (eth - kr) % 8 == 0
              and max(0, rh - (eth - kr)) + rh - 1 + win_k <= kr - 1)
    if not (col_ok and row_ok):
        jc = jax.lax.broadcasted_iota(jnp.int32, (etw, tile_w), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (etw, tile_w), 1)
        cmat = ((jc >= ic + 1) & (jc <= ic + win_k)).astype(jnp.bfloat16)
        ir = jax.lax.broadcasted_iota(jnp.int32, (tile_h, eth), 0)
        jr = jax.lax.broadcasted_iota(jnp.int32, (tile_h, eth), 1)
        rmat = ((jr >= ir + 1) & (jr <= ir + win_k)).astype(jnp.bfloat16)
        pc = jax.lax.dot_general(
            p.astype(jnp.bfloat16), cmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.dot_general(
            rmat, pc.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    pb = p.astype(jnp.bfloat16)
    cols = []
    for c in range(tile_w // 128):
        base = min(c * 128, etw - kc)
        off = c * 128 - base
        jc = jax.lax.broadcasted_iota(jnp.int32, (kc, 128), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (kc, 128), 1)
        cmat = ((jc >= ic + off + 1)
                & (jc <= ic + off + win_k)).astype(jnp.bfloat16)
        cols.append(jax.lax.dot_general(
            pb[:, base:base + kc], cmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    pc = (jnp.concatenate(cols, axis=1)
          if len(cols) > 1 else cols[0]).astype(jnp.bfloat16)
    rows = []
    for rc in range(2):
        r0 = rc * rh
        kb = min(r0, eth - kr)
        roff = r0 - kb
        ir = jax.lax.broadcasted_iota(jnp.int32, (rh, kr), 0)
        jr = jax.lax.broadcasted_iota(jnp.int32, (rh, kr), 1)
        rmat = ((jr >= ir + roff + 1)
                & (jr <= ir + roff + win_k)).astype(jnp.bfloat16)
        rows.append(jax.lax.dot_general(
            rmat, pc[kb:kb + kr], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.concatenate(rows, axis=0)


def _upsample2_band(n_out: int, n_in: int, off: int, scale: float,
                    transposed: bool = False):
    """Band matrix for the exact 2x linear upsample of
    ops.resize.upsample2_linear, in extended-region coordinates.

    Row e of the (n_out, n_in) band (or column e when ``transposed``) holds
    the two taps of full-res extended index e — frame index
    tile_origin - _HALO + e with tile_origin even, so the taps land at
    STATIC in-window positions (e+1)//2 - 5 + off and (e+1)//2 - 4 + off
    (the (e-9)//2 / (e-7)//2 floor divisions rewritten tile-independent and
    nonnegative), with parity-alternating weights (0.25, 0.75).  ``scale``
    folds the x2 flow-magnitude factor in; 0.5/1.5 are exact in bf16.
    """
    d_out = 1 if transposed else 0
    shape = (n_in, n_out) if transposed else (n_out, n_in)
    e = jax.lax.broadcasted_iota(jnp.int32, shape, d_out)
    j = jax.lax.broadcasted_iota(jnp.int32, shape, 1 - d_out)
    half = jax.lax.div(e + 1, 2)
    lo = half - 5 + off
    hi = half - 4 + off
    even = jax.lax.rem(e, 2) == 0
    w_lo = jnp.where(even, 0.25 * scale, 0.75 * scale)
    w_hi = jnp.where(even, 0.75 * scale, 0.25 * scale)
    band = (jnp.where(j == lo, w_lo, 0.0)
            + jnp.where(j == hi, w_hi, 0.0))
    return band.astype(jnp.bfloat16)


def _coarse_geometry(tile_h: int, tile_w: int) -> tuple[int, int, int, int]:
    """(th2, tw2, ceth, cw_dma) for the in-kernel coarse-flow upsample.

    The coarse window DMA for tile (ti, tj) starts at buffer row ti*th2 /
    col tj*tw2 — provably aligned because th2 % 8 == 0 and tw2 % 128 == 0
    (callers gate on tile_h % 16 == 0, tile_w % 256 == 0).  With a
    (top 8, left 128) buffer margin the window covers every tap of the
    extended region: rows [ti*th2 - 8, ti*th2 - 8 + ceth), taps reach
    ti*th2 - 5 .. ti*th2 + th2 + 4.
    """
    th2, tw2 = tile_h // 2, tile_w // 2
    ceth = th2 + 2 * _HALO
    cw_dma = -(-(tw2 + 133) // 128) * 128
    return th2, tw2, ceth, cw_dma


def _fused_level_grads_kernel(
    next_hbm, prev_hbm, flowbuf_hbm,
    out_hbm, stats_hbm,
    win_scratch, prev_scratch, flow_scratch, out_tile, stats_tile, sems,
    *, h, w, pad_y, pad_x, max_disp, tile_h, tile_w, local, win_k, bound_f,
    area_f, eig_thr, n_iters, n_ty, n_tx, merge_stats, coarse,
    prev_row0=0, tight_out=False, write_stats=True, scharr_mxu=False,
):
    """Self-contained fused IC iteration: Scharr gradients and the structure
    tensor are computed in-kernel from a single prev window, so a level call
    reads ONLY next/prev/flow from HBM — no XLA scharr pass, no A box sums,
    no (3, H, W) static stack.  Grid/ping-pong semantics identical to
    ``_fused_level_kernel``; additionally writes (min_eig, valid) tiles to
    ``stats_hbm`` at iteration 0 so DenseFlowResult stays complete.

    coarse (static, requires merge_stats): ``flowbuf_hbm`` holds the HALF
    resolution flow planes of the coarser pyramid level (edge-padded with an
    (8, 128) top/left margin) and the kernel upsamples each tile's window
    in-VMEM with two banded MXU matmuls — the exact tap scheme of
    ops.resize.upsample2_linear with the x2 flow scale folded into the band
    weights.  This deletes the XLA inter-level glue (full-frame upsample,
    plane split/join, full-res flow pad — ~0.25 ms/frame at 1080p, measured)
    and shrinks the flow-window DMA 4x.

    merge_stats (static, n_iters == 1 only): no ping-pong is needed for a
    single iteration, so flow reads come from the (un-aliased) input ref and
    one 4-plane DMA per step writes (fx, fy, min_eig, valid) to out_hbm —
    one fewer DMA issue/wait per step, and ``stats_hbm``/``stats_tile``
    become unused dummies.

    DMA schedule: the step cost at production tiles is dominated by
    serialized DMA *latencies* (~6 us each, measured), not bandwidth, so
    every transfer is double-buffered by linear-step parity:
    * each step prefetches the NEXT tile's prev+flow windows during its own
      compute (grid scratch persists across TPU grid steps);
    * the warp-window DMA is issued as soon as the flow window lands
      (_warp_start needs only the tile-center value) and overlaps the
      Scharr + structure-tensor MXU work;
    * output/stats writes are waited two steps later (reconstructed
      descriptors: the wait consumes the semaphore by copy *size*, which is
      identical every step), with a final-step drain.
    Flow windows are NOT prefetched across an iteration boundary — in small
    grids the boundary tile's own output write overlaps the next iteration's
    first window — so each iteration's first tile fetches flow
    synchronously; prev is read-only and prefetches across the boundary.
    """
    k = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = prev_scratch.shape[-1]
    tw_dma_out = out_tile.shape[-1]
    tiles = n_ty * n_tx
    s = (k * n_ty + ti) * n_tx + tj       # linear step index
    slot = jax.lax.rem(s, 2)
    oslot = 1 - slot

    # --- descriptor builders (sems: 0-1 prev, 2-3 flow, 4 warp, 5-6 out,
    # 7-8 stats; slot-indexed pairs for the double-buffered transfers) ------
    def prev_copy(ti_, tj_, sl):
        # prev_row0: row of prev_hbm holding frame row -16 (0 in the legacy
        # ((16,16),(128,256)) layout; pad_t-16 in the unified prepadded one)
        return pltpu.make_async_copy(
            prev_hbm.at[
                pl.ds(pl.multiple_of(prev_row0 + ti_ * tile_h, 8),
                      tile_h + 32),
                pl.ds(pl.multiple_of(tj_ * tile_w, 128), etw_dma_p),
            ],
            prev_scratch.at[sl], sems.at[sl],
        )

    if coarse:
        th2, tw2, ceth, cw_dma = _coarse_geometry(tile_h, tile_w)

    def flow_copy(buf, kk, ti_, tj_, sl):
        if coarse:
            return pltpu.make_async_copy(
                buf.at[
                    :,
                    pl.ds(pl.multiple_of(ti_ * th2, 8), ceth),
                    pl.ds(pl.multiple_of(tj_ * tw2, 128), cw_dma),
                ],
                flow_scratch.at[sl], sems.at[2 + sl],
            )
        src = jax.lax.rem(kk, 2) * 2
        return pltpu.make_async_copy(
            buf.at[
                pl.ds(src, 2),
                pl.ds(pl.multiple_of(ti_ * tile_h, 8), eth),
                pl.ds(pl.multiple_of(tj_ * tile_w, 128), etw_dma),
            ],
            flow_scratch.at[sl], sems.at[2 + sl],
        )

    def start_flow(kk, ti_, tj_, sl):
        if coarse:    # merge_stats => a single iteration, k is always 0
            flow_copy(flowbuf_hbm, kk, ti_, tj_, sl).start()
            return
        # iteration 0 reads the (donated) input ref, later iterations the
        # output ref — same memory on hardware (input_output_aliases); in
        # interpret mode, which copies instead of aliasing, this makes the
        # ping-pong read the actually-written slots.
        @pl.when(kk == 0)
        def _():
            flow_copy(flowbuf_hbm, kk, ti_, tj_, sl).start()

        @pl.when(kk > 0)
        def _():
            flow_copy(out_hbm, kk, ti_, tj_, sl).start()

    def out_copy(kk, ti_, tj_, sl):
        if merge_stats:
            dst, n_pl = 0, 4 if write_stats else 2
        else:
            dst, n_pl = 2 - jax.lax.rem(kk, 2) * 2, 2
        if tight_out:
            # merge_stats only: out_hbm is never re-read by the kernel, so
            # it carries NO halo margins — (n_pl, h, w) exactly, and the
            # caller's post-slice (a full-array copy) disappears
            row = pl.multiple_of(ti_ * tile_h, 8)
            col = pl.multiple_of(tj_ * tile_w, 128)
        else:
            row = pl.multiple_of(ti_ * tile_h + _HALO, 8)
            col = pl.multiple_of(tj_ * tile_w + 128, 128)
        return pltpu.make_async_copy(
            out_tile.at[sl],
            out_hbm.at[pl.ds(dst, n_pl), pl.ds(row, tile_h),
                       pl.ds(col, tw_dma_out)],
            sems.at[5 + sl],
        )

    def stats_copy(ti_, tj_, sl):
        return pltpu.make_async_copy(
            stats_tile.at[sl],
            stats_hbm.at[
                pl.ds(0, 2),
                pl.ds(pl.multiple_of(ti_ * tile_h, 8), tile_h),
                pl.ds(pl.multiple_of(tj_ * tile_w + 128, 128), tw_dma_out),
            ],
            sems.at[7 + sl],
        )

    # --- fetch this step's windows (usually already in flight) --------------
    @pl.when(s == 0)
    def _():
        prev_copy(ti, tj, slot).start()

    first_tile = (ti == 0) & (tj == 0)

    @pl.when(first_tile)
    def _():
        start_flow(k, ti, tj, slot)

    # wait is by semaphore+size, so the src buffer choice is irrelevant here
    flow_copy(flowbuf_hbm, k, ti, tj, slot).wait()

    if coarse:
        cfx = flow_scratch[slot, 0]
        cfy = flow_scratch[slot, 1]
        # tile-center reference displacement: the dominant (0.75-weight)
        # coarse tap of the center sample, x2 — nearest-sample accuracy is
        # plenty for a reference the residual range is centered on
        rr = (eth // 2 + 1) // 2 - 4 + _HALO
        rc = (etw // 2 + 1) // 2 - 4 + 128
        ref_fx = 2.0 * cfx[rr, rc]
        ref_fy = 2.0 * cfy[rr, rc]
    else:
        c0 = 128 - _HALO
        fx_w = flow_scratch[slot, 0, :, c0:c0 + etw]
        fy_w = flow_scratch[slot, 1, :, c0:c0 + etw]
        ref_fx = fx_w[eth // 2, etw // 2]
        ref_fy = fy_w[eth // 2, etw // 2]

    # issue the warp-window DMA immediately: it only needs the center flow
    y0 = ti * tile_h
    x0 = tj * tile_w
    wstate = _warp_start(
        next_hbm, ref_fx, ref_fy,
        y0 - _HALO, x0 - _HALO, win_scratch, sems.at[4],
        pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, local=local,
    )

    # --- prefetch the next step's windows while this one computes -----------
    at_row_end = tj == n_tx - 1
    nti = jnp.where(at_row_end, ti + 1, ti)
    ntj = jnp.where(at_row_end, 0, tj + 1)
    last_tile = (ti == n_ty - 1) & (tj == n_tx - 1)

    @pl.when(jnp.logical_not(last_tile))
    def _():
        prev_copy(nti, ntj, oslot).start()
        start_flow(k, nti, ntj, oslot)

    @pl.when(last_tile & (k < n_iters - 1))
    def _():
        prev_copy(0, 0, oslot).start()   # read-only: safe across the boundary

    if coarse:
        # upsample the coarse window to the (eth, etw) extended region —
        # two banded bf16 MXU matmuls overlapping the prev/warp DMA waits
        rband = _upsample2_band(eth, ceth, _HALO, 2.0)
        cband = _upsample2_band(etw, cw_dma, 128, 1.0, transposed=True)

        def up2(cw_):
            t = jax.lax.dot_general(
                cw_.astype(jnp.bfloat16), cband, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jax.lax.dot_general(
                rband, t.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        fx_w = up2(cfx)
        fy_w = up2(cfy)

    prev_copy(ti, tj, slot).wait()

    # --- Scharr on the extended region, in VMEM ------------------------------
    # ext row e == scratch row e+8; ext col j == scratch col j+120.
    # smooth [3,10,3]/16 cross diff [-1,0,1]/2 (ops/gradients.py); frame-border
    # halos carry edge replication (pad_ext) instead of REFLECT_101 — a
    # border-radius-only deviation, same class as the fused b-sum halos.
    p = prev_scratch[slot]
    if scharr_mxu:
        ix_w, iy_w = _scharr_mxu_cols(p, eth, etw)
    else:
        sy = (3.0 * p[7:7 + eth, 119:121 + etw]
              + 10.0 * p[8:8 + eth, 119:121 + etw]
              + 3.0 * p[9:9 + eth, 119:121 + etw]) * (1.0 / 16.0)
        ix_w = (sy[:, 2:] - sy[:, :-2]) * 0.5
        sx = (3.0 * p[7:9 + eth, 119:119 + etw]
              + 10.0 * p[7:9 + eth, 120:120 + etw]
              + 3.0 * p[7:9 + eth, 121:121 + etw]) * (1.0 / 16.0)
        iy_w = (sx[2:, :] - sx[:-2, :]) * 0.5
    prev_w = p[8:8 + eth, 120:120 + etw]

    # --- structure tensor + gating, per tile ---------------------------------
    a11 = _boxsum_tile_mxu(ix_w * ix_w, win_k, tile_h, tile_w)
    a12 = _boxsum_tile_mxu(ix_w * iy_w, win_k, tile_h, tile_w)
    a22 = _boxsum_tile_mxu(iy_w * iy_w, win_k, tile_h, tile_w)
    det = a11 * a22 - a12 * a12
    min_eig = (a11 + a22 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
        2.0 * area_f
    )
    solvable = det > 1e-7
    validf = jnp.where((min_eig >= eig_thr) & solvable, 1.0, 0.0)
    invd = validf / jnp.where(solvable, det, 1.0)

    def extend_cols(a):
        if tw_dma_out == tile_w:
            return a
        ext = tw_dma_out - tile_w
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:, -1:], (tile_h, ext))], axis=1
        )

    if not merge_stats:
        @pl.when(k == 0)
        def _():
            @pl.when(s >= 2)
            def _():
                stats_copy(ti, tj, slot).wait()    # started two steps ago

            stats_tile[slot, 0] = extend_cols(min_eig)
            stats_tile[slot, 1] = extend_cols(validf)
            stats_copy(ti, tj, slot).start()

    # --- warp selects (the window DMA has had the MXU work to land) ----------
    jw = _warp_finish(
        wstate, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch,
        h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
        th=eth, tw=etw, local=local,
    )

    # --- IC residual, b sums, solve ------------------------------------------
    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    b1 = _boxsum_tile_mxu(ix_w * r, win_k, tile_h, tile_w)
    b2 = _boxsum_tile_mxu(iy_w * r, win_k, tile_h, tile_w)
    fx_t = fx_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    fy_t = fy_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    b1 = b1 + a11 * fx_t + a12 * fy_t
    b2 = b2 + a12 * fx_t + a22 * fy_t
    du = (a12 * b2 - a22 * b1) * invd
    dv = (a12 * b1 - a11 * b2) * invd
    bound = jnp.float32(bound_f)
    fx_new = extend_cols(jnp.clip(fx_t + du, -bound, bound))
    fy_new = extend_cols(jnp.clip(fy_t + dv, -bound, bound))

    @pl.when(s >= 2)
    def _():
        out_copy(k, ti, tj, slot).wait()       # started two steps ago

    out_tile[slot, 0] = fx_new
    out_tile[slot, 1] = fy_new
    if merge_stats and write_stats:
        out_tile[slot, 2] = extend_cols(min_eig)
        out_tile[slot, 3] = extend_cols(validf)
    out_copy(k, ti, tj, slot).start()

    # --- final-step drain: consume every still-outstanding semaphore --------
    total = n_iters * tiles

    @pl.when(s == total - 1)
    def _():
        out_copy(k, ti, tj, slot).wait()       # this step's own write
        if total >= 2:
            out_copy(k, ti, tj, oslot).wait()  # step total-2's write
        if not merge_stats:
            # stats: starts happen at the `tiles` k==0 steps; in-loop waits
            # consumed all but the last min(tiles, 2) of them
            stats_copy(ti, tj, (tiles - 1) % 2).wait()
            if tiles >= 2:
                stats_copy(ti, tj, (tiles - 2) % 2).wait()


def _fused_level_grads_resident_kernel(
    next_hbm, prev_hbm, flow_in_hbm,
    out_hbm, stats_hbm,
    win_scratch, prev_scratch, flow_scratch, grad_cache, a_cache, out_tile,
    sems,
    *, h, w, pad_y, pad_x, max_disp, tile_h, tile_w, local, win_k, bound_f,
    area_f, eig_thr, n_iters, prev_row0=0, scharr_mxu=False,
):
    """Single-tile level with EVERYTHING resident in VMEM across iterations.

    When one tile covers the whole (padded) level (the 270p top level of
    the production pyramid), the multi-tile kernel's per-iteration HBM
    traffic — flow in/out ping-pong, prev window refetch, Scharr + A
    recompute — is pure waste: grid scratch persists across sequential
    grid steps, so iteration 0 computes gradients, the structure tensor
    and the gating once into caches, flow lives in a VMEM scratch the
    whole time, and per iteration only the flow-dependent warp window DMA
    touches HBM.  The result writes once, at the last iteration.
    """
    k = pl.program_id(0)
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    c0 = 128 - _HALO

    @pl.when(k == 0)
    def _():
        dma_p = pltpu.make_async_copy(
            prev_hbm.at[pl.ds(prev_row0, tile_h + 32),
                        pl.ds(0, prev_scratch.shape[-1])],
            prev_scratch, sems.at[0],
        )
        dma_p.start()
        d = pltpu.make_async_copy(flow_in_hbm, flow_scratch, sems.at[1])
        d.start()
        d.wait()
        dma_p.wait()
        p = prev_scratch[:]
        if scharr_mxu:
            ix_w, iy_w = _scharr_mxu_cols(p, eth, etw)
        else:
            sy = (3.0 * p[7:7 + eth, 119:121 + etw]
                  + 10.0 * p[8:8 + eth, 119:121 + etw]
                  + 3.0 * p[9:9 + eth, 119:121 + etw]) * (1.0 / 16.0)
            ix_w = (sy[:, 2:] - sy[:, :-2]) * 0.5
            sx = (3.0 * p[7:9 + eth, 119:119 + etw]
                  + 10.0 * p[7:9 + eth, 120:120 + etw]
                  + 3.0 * p[7:9 + eth, 121:121 + etw]) * (1.0 / 16.0)
            iy_w = (sx[2:, :] - sx[:-2, :]) * 0.5

        def fill(a, width):
            ext = width - a.shape[-1]
            if ext == 0:
                return a
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], ext))], axis=-1
            )

        gw = grad_cache.shape[-1]
        grad_cache[0] = fill(ix_w, gw)
        grad_cache[1] = fill(iy_w, gw)
        grad_cache[2] = fill(p[8:8 + eth, 120:120 + etw], gw)
        a11 = _boxsum_tile_mxu(ix_w * ix_w, win_k, tile_h, tile_w)
        a12 = _boxsum_tile_mxu(ix_w * iy_w, win_k, tile_h, tile_w)
        a22 = _boxsum_tile_mxu(iy_w * iy_w, win_k, tile_h, tile_w)
        det = a11 * a22 - a12 * a12
        min_eig = (a11 + a22
                   - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
            2.0 * area_f
        )
        solvable = det > 1e-7
        validf = jnp.where((min_eig >= eig_thr) & solvable, 1.0, 0.0)
        aw = a_cache.shape[-1]
        a_cache[0] = fill(a11, aw)
        a_cache[1] = fill(a12, aw)
        a_cache[2] = fill(a22, aw)
        a_cache[3] = fill(validf / jnp.where(solvable, det, 1.0), aw)
        out_tile[0] = fill(min_eig, aw)
        out_tile[1] = fill(validf, aw)
        ds = pltpu.make_async_copy(out_tile, stats_hbm, sems.at[3])
        ds.start()
        ds.wait()   # out_tile reused for the final flow write

    fx_w = flow_scratch[0, :, c0:c0 + etw]
    fy_w = flow_scratch[1, :, c0:c0 + etw]
    jw = _warp_core(
        next_hbm, fx_w, fy_w, -_HALO, -_HALO, win_scratch, sems.at[2],
        h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, th=eth,
        tw=etw, local=local, ref_cy=eth // 2, ref_cx=etw // 2,
    )
    ix_w = grad_cache[0, :, :etw]
    iy_w = grad_cache[1, :, :etw]
    prev_w = grad_cache[2, :, :etw]
    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    b1 = _boxsum_tile_mxu(ix_w * r, win_k, tile_h, tile_w)
    b2 = _boxsum_tile_mxu(iy_w * r, win_k, tile_h, tile_w)
    a11 = a_cache[0, :, :tile_w]
    a12 = a_cache[1, :, :tile_w]
    a22 = a_cache[2, :, :tile_w]
    invd = a_cache[3, :, :tile_w]
    fx_t = fx_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    fy_t = fy_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    b1 = b1 + a11 * fx_t + a12 * fy_t
    b2 = b2 + a12 * fx_t + a22 * fy_t
    du = (a12 * b2 - a22 * b1) * invd
    dv = (a12 * b1 - a11 * b2) * invd
    bound = jnp.float32(bound_f)
    fx_new = jnp.clip(fx_t + du, -bound, bound)
    fy_new = jnp.clip(fy_t + dv, -bound, bound)
    # full-width row store (partial-lane stores are a Mosaic hazard): splice
    # the updated tile between the untouched left pad and right halo columns
    fdw = flow_scratch.shape[-1]
    row0 = flow_scratch[0, _HALO:_HALO + tile_h]
    row1 = flow_scratch[1, _HALO:_HALO + tile_h]
    flow_scratch[0, _HALO:_HALO + tile_h] = jnp.concatenate(
        [row0[:, :128], fx_new, row0[:, 128 + tile_w:fdw]], axis=1
    )
    flow_scratch[1, _HALO:_HALO + tile_h] = jnp.concatenate(
        [row1[:, :128], fy_new, row1[:, 128 + tile_w:fdw]], axis=1
    )

    @pl.when(k == n_iters - 1)
    def _():
        ow = out_tile.shape[-1]

        def fill2(a):
            ext = ow - a.shape[-1]
            if ext == 0:
                return a
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], ext))], axis=-1
            )

        out_tile[0] = fill2(fx_new)
        out_tile[1] = fill2(fy_new)
        d = pltpu.make_async_copy(out_tile, out_hbm, sems.at[3])
        d.start()
        d.wait()


def make_fused_lk_level_grads_resident(
    next_img: jnp.ndarray,
    prev_img: jnp.ndarray,
    n_iters: int,
    min_eig_threshold: float,
    max_disp: int = 32,
    local: int = LOCAL,
    win_k: int = 15,
    planes_out: bool = False,
    prepadded_hw: tuple | None = None,
    scharr_mxu: bool = True,
):
    """Single-tile build of the grads level: run(flow_init) ->
    (flow, min_eig, valid) with all level state VMEM-resident across the
    n_iters iterations (see _fused_level_grads_resident_kernel).  Requires
    the (padded) level to fit one tile: H <= 272, W <= 512, H % 8 == 0.
    planes_out: return flow as (2, H, W) planes (no moveaxis join).
    prepadded_hw: the TRUE level (h, w) when ``next_img``/``prev_img`` are
    already in the unified_pad_geometry layout (the video scan's carried
    frames) — the maker then does no jnp.pad glue."""
    if prepadded_hw is not None:
        h, w = prepadded_hw
    else:
        h, w = next_img.shape
    tile_h, tile_w = h, w
    assert h <= 272 and w <= 512 and h % 8 == 0, (h, w)
    assert win_k <= 2 * _HALO - 1
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    tw_pad = -(-tile_w // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    if prepadded_hw is not None:
        upt, upb, upl, upr = unified_pad_geometry(tile_h, tile_w, max_disp,
                                                  local)
        assert next_img.shape == prev_img.shape == (upt + h + upb,
                                                    upl + w + upr), (
            next_img.shape, (upt, upb, upl, upr))
        # the unified right pad must also cover the resident prev read,
        # which fetches etw_dma_p (not just etw_dma_p - 128) columns
        assert upl + w + upr >= etw_dma_p, (upr, etw_dma_p)
        pad_t, pad_l, prev_row0 = upt, upl, upt - 16
        next_pad = next_img
        prev_ext = prev_img
    else:
        pad_t, pad_b, pad_l, pad_r = _asym_pads(tile_h, tile_w, sh, sw,
                                                max_disp, local)
        prev_row0 = 0
        next_pad = jnp.pad(next_img.astype(jnp.float32),
                           ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")
        prev_ext = jnp.pad(
            prev_img.astype(jnp.float32),
            ((16, 16), (128, etw_dma_p - 128 - w)), mode="edge",
        )

    grid = (n_iters,)
    kernel = functools.partial(
        _fused_level_grads_resident_kernel, h=h, w=w, pad_y=pad_t,
        pad_x=pad_l,
        max_disp=max_disp, tile_h=tile_h, tile_w=tile_w, local=local,
        win_k=win_k, bound_f=float(max_disp), area_f=float(win_k * win_k),
        eig_thr=float(min_eig_threshold) * 1024.0, n_iters=n_iters,
        prev_row0=prev_row0,
        scharr_mxu=scharr_mxu and _scharr_mxu_ok(etw, etw_dma_p),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, tile_h, tw_pad), jnp.float32),
            jax.ShapeDtypeStruct((2, tile_h, tw_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded next
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded prev
            pl.BlockSpec(memory_space=pltpu.HBM),   # initial flow
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((3, eth, -(-etw // 128) * 128), jnp.float32),
            pltpu.VMEM((4, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, tile_h, tw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        # ~8.6 MB of persistent scratch + the kernel's own temporaries
        # exceed the default 16 MB scoped-vmem budget; v5e has 128 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024
        ),
    )

    def run(flow_init: jnp.ndarray):
        def pad_flow(x):
            return jnp.pad(x.astype(jnp.float32),
                           ((_HALO, _HALO), (128, etw_dma - 128 - w)),
                           mode="edge")

        buf = jnp.stack([pad_flow(flow_init[..., 0]),
                         pad_flow(flow_init[..., 1])])
        out, stats = call(next_pad, prev_ext, buf)
        planes = out[:, :, :w]
        flow = planes if planes_out else jnp.moveaxis(planes, 0, -1)
        return flow, stats[0, :, :w], stats[1, :, :w] > 0.5

    return run


def make_fused_lk_level_grads(
    next_img: jnp.ndarray,
    prev_img: jnp.ndarray,
    n_iters: int,
    min_eig_threshold: float,
    max_disp: int = 32,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    local: int = LOCAL,
    win_k: int = 15,
    coarse_flow: bool = False,
    planes_out: bool = False,
    prepadded: bool = False,
    write_stats: bool = True,
    scharr_mxu: bool = True,
):
    """Build run(flow_init) -> (flow, min_eig, valid): n_iters fused IC
    iterations with Scharr + structure tensor computed in-kernel.

    prepadded (requires n_iters == 1): ``next_img``/``prev_img`` are ALREADY
    in the unified_pad_geometry layout (the video scan pads each frame once
    per level and carries it), outputs leave in a TIGHT (no-margin) buffer,
    and the maker does no jnp.pad/slice at all — the XLA glue around the
    kernel drops to the coarse-plane pad.  write_stats=False additionally
    drops the (min_eig, valid) output planes (levels whose stats nobody
    reads — everything above level 0 in the pyramid chain); run then
    returns (flow, None, None).

    Unlike ``make_fused_lk_level`` this needs no precomputed ix/iy/A — the
    XLA prologue shrinks to padding prev/next, so it pays off from ONE
    iteration (the precomputed-A kernel only amortizes at >=4).  HBM traffic
    per iteration: prev+warp+flow windows in, one flow tile out.

    coarse_flow (requires n_iters == 1, tile_h % 16 == 0, tile_w % 256 == 0):
    run takes the COARSER level's flow as (2, h//2, w//2) planes and the
    kernel upsamples per tile in-VMEM (banded MXU matmuls, exact
    upsample2_linear taps, x2 scale folded in) — no XLA upsample/split/pad.
    planes_out: return flow as (2, h, w) planes (skips the moveaxis join,
    letting pyramid levels hand flow to each other without relayouts).

    min_eig_threshold is in OpenCV units (scaled by 1024 like flow/dense.py).
    Requires a square window (win_k x win_k) and win_k <= 2*_HALO - 1.
    """
    if prepadded:
        upt, upb, upl, upr = unified_pad_geometry(tile_h, tile_w, max_disp,
                                                  local)
        h = next_img.shape[0] - upt - upb
        w = next_img.shape[1] - upl - upr
        assert next_img.shape == prev_img.shape == (upt + h + upb,
                                                    upl + w + upr)
        assert tile_w % 128 == 0, tile_w   # tight out writes tile exactly
    else:
        h, w = next_img.shape
    assert h % tile_h == 0 and w % tile_w == 0, (h, w)
    assert tile_h % 8 == 0 and _HALO == 8 and win_k <= 2 * _HALO - 1
    assert write_stats or prepadded
    if coarse_flow:
        assert n_iters == 1 and tile_h % 16 == 0 and tile_w % 256 == 0, (
            n_iters, tile_h, tile_w)
        th2_c, tw2_c, ceth_c, cw_dma_c = _coarse_geometry(tile_h, tile_w)
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    # the Scharr stencil reads one col beyond the ext region: ensure the
    # prev DMA width strictly covers scratch col (tile_w + 136)
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    if prepadded:
        assert n_iters == 1, "prepadded requires the merge_stats form"
        pad_t, pad_l = upt, upl
        prev_row0 = upt - 16
        next_pad = next_img
        prev_ext = prev_img
    else:
        pad_t, pad_b, pad_l, pad_r = _asym_pads(tile_h, tile_w, sh, sw,
                                                max_disp, local)
        prev_row0 = 0
        next_pad = jnp.pad(next_img.astype(jnp.float32),
                           ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")
        prev_ext = jnp.pad(prev_img.astype(jnp.float32),
                           ((16, 16), (128, 256)), mode="edge")

    gy = _HALO
    hext = h + 2 * gy
    wext = w + 128 + 256

    n_ty = h // tile_h
    n_tx = w // tile_w
    grid = (n_iters, n_ty, n_tx)
    tw_pad = -(-tile_w // 128) * 128
    merge_stats = n_iters == 1
    kernel = functools.partial(
        _fused_level_grads_kernel, h=h, w=w, pad_y=pad_t, pad_x=pad_l,
        max_disp=max_disp,
        tile_h=tile_h, tile_w=tile_w, local=local, win_k=win_k,
        bound_f=float(max_disp), area_f=float(win_k * win_k),
        eig_thr=float(min_eig_threshold) * 1024.0,
        n_iters=n_iters, n_ty=n_ty, n_tx=n_tx, merge_stats=merge_stats,
        coarse=coarse_flow, prev_row0=prev_row0, tight_out=prepadded,
        write_stats=write_stats,
        scharr_mxu=scharr_mxu and _scharr_mxu_ok(etw, etw_dma_p),
    )
    if merge_stats and prepadded:
        # tight buffer, no margins, nothing to slice afterwards
        out_planes = 4 if write_stats else 2
        out_shapes = (
            jax.ShapeDtypeStruct((out_planes, h, w), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        )
        stats_planes = 1
        io_aliases = {}
    elif merge_stats:
        # single iteration: no ping-pong; planes (fx, fy, min_eig, valid)
        # leave in ONE DMA per step; stats buffers shrink to dummies
        out_shapes = (
            jax.ShapeDtypeStruct((4, hext, wext), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        )
        out_planes, stats_planes = 4, 1
        io_aliases = {}
    else:
        out_shapes = (
            jax.ShapeDtypeStruct((4, hext, wext), jnp.float32),
            jax.ShapeDtypeStruct((2, h, wext), jnp.float32),
        )
        out_planes, stats_planes = 2, 2
        io_aliases = {2: 0}
    call = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded next
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded prev
            pl.BlockSpec(memory_space=pltpu.HBM),   # flow (aliased ping-pong
                                                    # unless merge_stats)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((2, tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, 2, ceth_c, cw_dma_c) if coarse_flow
                       else (2, 2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((2, out_planes, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, stats_planes, tile_h, tw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        input_output_aliases=io_aliases,
        # double-buffered persistent scratch exceeds the default 16 MB
        # scoped-vmem budget at the 136-row production tiles; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    def pad_flow(x):
        return jnp.pad(x.astype(jnp.float32), ((gy, gy), (128, 256)),
                       mode="edge")

    def finish(out):
        if prepadded:
            planes = out[0:2]
        else:
            planes = out[0:2, gy:gy + h, 128:128 + w]
        flow = planes if planes_out else jnp.moveaxis(planes, 0, -1)
        if not write_stats:
            return flow, None, None
        if prepadded:
            return flow, out[2], out[3] > 0.5
        return (flow, out[2, gy:gy + h, 128:128 + w],
                out[3, gy:gy + h, 128:128 + w] > 0.5)

    def run(flow_init: jnp.ndarray):
        if coarse_flow:
            # flow_init: (2, h//2, w//2) coarse flow planes
            assert flow_init.shape == (2, h // 2, w // 2), flow_init.shape
            buf = jnp.pad(flow_init.astype(jnp.float32),
                          ((0, 0), (8, 8), (128, 128)), mode="edge")
            out, _ = call(next_pad, prev_ext, buf)
            return finish(out)
        fx = pad_flow(flow_init[..., 0])
        fy = pad_flow(flow_init[..., 1])
        if merge_stats:
            out, _ = call(next_pad, prev_ext, jnp.stack([fx, fy]))
            return finish(out)
        out, stats = call(next_pad, prev_ext, jnp.stack([fx, fy, fx, fy]))
        s = 2 * (n_iters % 2)
        planes = out[s:s + 2, gy:gy + h, 128:128 + w]
        flow = planes if planes_out else jnp.moveaxis(planes, 0, -1)
        min_eig = stats[0, :, 128:128 + w]
        valid = stats[1, :, 128:128 + w] > 0.5
        return flow, min_eig, valid

    return run


def _fused_level_grads_batched_kernel(
    frames_hbm, coarse_hbm,
    out_hbm,
    win_scratch, prev_scratch, flow_scratch, out_tile, sems,
    *, h, w, pad_y, pad_x, max_disp, tile_h, tile_w, local, win_k, bound_f,
    area_f, eig_thr, n_frames, n_ty, n_tx, prev_row0, write_stats,
    scharr_mxu,
):
    """Frame-batched single-iteration coarse-chain level: grid step
    (f, ti, tj) solves tile (ti, tj) of pair f -> f+1.

    The video chunk's specialization of ``_fused_level_grads_kernel``
    (merge_stats + coarse + tight_out always): consecutive cold video pairs
    are INDEPENDENT (no warm start), so K pairs share one kernel launch —
    one frames array (K+1, Hp, Wp) in the unified prepadded layout serves
    both the prev (index f) and warp (index f+1) reads, the grid grows a
    frame dim, and the double-buffered DMA pipeline runs straight across
    frame boundaries (prev and the coarse flow input are both read-only, so
    unlike the iterating kernel there is no ping-pong hazard to fence).
    Amortizes the per-launch pipeline fill/drain of the small levels over
    K frames and drops the per-frame XLA dispatch glue of the scan.
    """
    fi = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma_p = prev_scratch.shape[-1]
    s = (fi * n_ty + ti) * n_tx + tj      # linear step index
    slot = jax.lax.rem(s, 2)
    oslot = 1 - slot
    th2, tw2, ceth, cw_dma = _coarse_geometry(tile_h, tile_w)
    n_pl = 4 if write_stats else 2

    def prev_copy(f_, ti_, tj_, sl):
        return pltpu.make_async_copy(
            frames_hbm.at[
                f_,
                pl.ds(pl.multiple_of(prev_row0 + ti_ * tile_h, 8),
                      tile_h + 32),
                pl.ds(pl.multiple_of(tj_ * tile_w, 128), etw_dma_p),
            ],
            prev_scratch.at[sl], sems.at[sl],
        )

    def flow_copy(f_, ti_, tj_, sl):
        return pltpu.make_async_copy(
            coarse_hbm.at[
                f_, :,
                pl.ds(pl.multiple_of(ti_ * th2, 8), ceth),
                pl.ds(pl.multiple_of(tj_ * tw2, 128), cw_dma),
            ],
            flow_scratch.at[sl], sems.at[2 + sl],
        )

    def out_copy(f_, ti_, tj_, sl):
        return pltpu.make_async_copy(
            out_tile.at[sl],
            out_hbm.at[
                f_, pl.ds(0, n_pl),
                pl.ds(pl.multiple_of(ti_ * tile_h, 8), tile_h),
                pl.ds(pl.multiple_of(tj_ * tile_w, 128), tile_w),
            ],
            sems.at[5 + sl],
        )

    @pl.when(s == 0)
    def _():
        prev_copy(fi, ti, tj, slot).start()
        flow_copy(fi, ti, tj, slot).start()

    flow_copy(fi, ti, tj, slot).wait()
    cfx = flow_scratch[slot, 0]
    cfy = flow_scratch[slot, 1]
    rr = (eth // 2 + 1) // 2 - 4 + _HALO
    rc = (etw // 2 + 1) // 2 - 4 + 128
    ref_fx = 2.0 * cfx[rr, rc]
    ref_fy = 2.0 * cfy[rr, rc]

    # warp window of frame fi+1 as soon as the tile-center flow is known
    y0 = ti * tile_h
    x0 = tj * tile_w
    wstate = _warp_start(
        frames_hbm, ref_fx, ref_fy,
        y0 - _HALO, x0 - _HALO, win_scratch, sems.at[4],
        pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, local=local,
        frame=fi + 1,
    )

    # prefetch the next step's windows (wrapping tj -> ti -> frame)
    at_row_end = tj == n_tx - 1
    at_frame_end = at_row_end & (ti == n_ty - 1)
    ntj = jnp.where(at_row_end, 0, tj + 1)
    nti = jnp.where(at_frame_end, 0, jnp.where(at_row_end, ti + 1, ti))
    nf = jnp.where(at_frame_end, fi + 1, fi)
    last_step = (fi == n_frames - 1) & at_frame_end

    @pl.when(jnp.logical_not(last_step))
    def _():
        prev_copy(nf, nti, ntj, oslot).start()
        flow_copy(nf, nti, ntj, oslot).start()

    # upsample the coarse window (banded bf16 MXU matmuls, overlapping DMAs)
    rband = _upsample2_band(eth, ceth, _HALO, 2.0)
    cband = _upsample2_band(etw, cw_dma, 128, 1.0, transposed=True)

    def up2(cw_):
        t = jax.lax.dot_general(
            cw_.astype(jnp.bfloat16), cband, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.dot_general(
            rband, t.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    fx_w = up2(cfx)
    fy_w = up2(cfy)

    prev_copy(fi, ti, tj, slot).wait()

    p = prev_scratch[slot]
    if scharr_mxu:
        ix_w, iy_w = _scharr_mxu_cols(p, eth, etw)
    else:
        sy = (3.0 * p[7:7 + eth, 119:121 + etw]
              + 10.0 * p[8:8 + eth, 119:121 + etw]
              + 3.0 * p[9:9 + eth, 119:121 + etw]) * (1.0 / 16.0)
        ix_w = (sy[:, 2:] - sy[:, :-2]) * 0.5
        sx = (3.0 * p[7:9 + eth, 119:119 + etw]
              + 10.0 * p[7:9 + eth, 120:120 + etw]
              + 3.0 * p[7:9 + eth, 121:121 + etw]) * (1.0 / 16.0)
        iy_w = (sx[2:, :] - sx[:-2, :]) * 0.5
    prev_w = p[8:8 + eth, 120:120 + etw]

    a11 = _boxsum_tile_mxu(ix_w * ix_w, win_k, tile_h, tile_w)
    a12 = _boxsum_tile_mxu(ix_w * iy_w, win_k, tile_h, tile_w)
    a22 = _boxsum_tile_mxu(iy_w * iy_w, win_k, tile_h, tile_w)
    det = a11 * a22 - a12 * a12
    min_eig = (a11 + a22 - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
        2.0 * area_f
    )
    solvable = det > 1e-7
    validf = jnp.where((min_eig >= eig_thr) & solvable, 1.0, 0.0)
    invd = validf / jnp.where(solvable, det, 1.0)

    jw = _warp_finish(
        wstate, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch,
        h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
        th=eth, tw=etw, local=local,
    )

    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    b1 = _boxsum_tile_mxu(ix_w * r, win_k, tile_h, tile_w)
    b2 = _boxsum_tile_mxu(iy_w * r, win_k, tile_h, tile_w)
    fx_t = fx_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    fy_t = fy_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    b1 = b1 + a11 * fx_t + a12 * fy_t
    b2 = b2 + a12 * fx_t + a22 * fy_t
    du = (a12 * b2 - a22 * b1) * invd
    dv = (a12 * b1 - a11 * b2) * invd
    bound = jnp.float32(bound_f)

    @pl.when(s >= 2)
    def _():
        out_copy(fi, ti, tj, slot).wait()      # started two steps ago

    out_tile[slot, 0] = jnp.clip(fx_t + du, -bound, bound)
    out_tile[slot, 1] = jnp.clip(fy_t + dv, -bound, bound)
    if write_stats:
        out_tile[slot, 2] = min_eig
        out_tile[slot, 3] = validf
    out_copy(fi, ti, tj, slot).start()

    total = n_frames * n_ty * n_tx

    @pl.when(s == total - 1)
    def _():
        out_copy(fi, ti, tj, slot).wait()
        if total >= 2:
            out_copy(fi, ti, tj, oslot).wait()


def make_fused_lk_level_grads_batched(
    frames: jnp.ndarray,
    hw: tuple[int, int],
    min_eig_threshold: float,
    max_disp: int,
    tile_h: int,
    tile_w: int,
    local: int = LOCAL,
    win_k: int = 15,
    write_stats: bool = True,
    scharr_mxu: bool = True,
):
    """Frame-batched build of the single-iteration coarse-chain level.

    frames: (F+1, Hp, Wp) unified-prepadded level planes — pair f solves
    frames[f] -> frames[f+1].  Returns run(coarse) with
    coarse: (F, 2, h//2, w//2) coarser-level flow planes ->
    (flow (F, 2, h, w), min_eig (F, h, w), valid) (stats None unless
    write_stats).  Per-pair numerics are bit-identical to
    make_fused_lk_level_grads(prepadded=True, coarse_flow=True).
    """
    h, w = hw
    n_frames = frames.shape[0] - 1
    assert n_frames >= 1
    upt, upb, upl, upr = unified_pad_geometry(tile_h, tile_w, max_disp,
                                              local)
    assert frames.shape[1:] == (upt + h + upb, upl + w + upr), (
        frames.shape, (upt, upb, upl, upr), hw)
    assert h % tile_h == 0 and w % tile_w == 0, (h, w, tile_h, tile_w)
    assert tile_h % 16 == 0 and tile_w % 256 == 0, (tile_h, tile_w)
    assert _HALO == 8 and win_k <= 2 * _HALO - 1
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    th2_c, tw2_c, ceth_c, cw_dma_c = _coarse_geometry(tile_h, tile_w)
    n_ty = h // tile_h
    n_tx = w // tile_w
    n_pl = 4 if write_stats else 2
    kernel = functools.partial(
        _fused_level_grads_batched_kernel, h=h, w=w, pad_y=upt, pad_x=upl,
        max_disp=max_disp, tile_h=tile_h, tile_w=tile_w, local=local,
        win_k=win_k, bound_f=float(max_disp), area_f=float(win_k * win_k),
        eig_thr=float(min_eig_threshold) * 1024.0, n_frames=n_frames,
        n_ty=n_ty, n_tx=n_tx, prev_row0=upt - 16, write_stats=write_stats,
        scharr_mxu=scharr_mxu and _scharr_mxu_ok(etw, etw_dma_p),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_frames, n_pl, h, w), jnp.float32),
        grid=(n_frames, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # stacked frames
            pl.BlockSpec(memory_space=pltpu.HBM),   # coarse flow planes
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((2, tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, 2, ceth_c, cw_dma_c), jnp.float32),
            pltpu.VMEM((2, n_pl, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((7,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    def run(coarse: jnp.ndarray):
        assert coarse.shape == (n_frames, 2, h // 2, w // 2), coarse.shape
        buf = jnp.pad(coarse.astype(jnp.float32),
                      ((0, 0), (0, 0), (8, 8), (128, 128)), mode="edge")
        out = call(frames, buf)
        if not write_stats:
            return out[:, 0:2], None, None
        return out[:, 0:2], out[:, 2], out[:, 3] > 0.5

    return run


def _fused_level_grads_resident_batched_kernel(
    frames_hbm, flow_in_hbm,
    out_hbm, stats_hbm,
    win_scratch, prev_scratch, flow_scratch, grad_cache, a_cache, out_tile,
    stats_tile, sems,
    *, h, w, pad_y, pad_x, max_disp, tile_h, tile_w, local, win_k, bound_f,
    area_f, eig_thr, n_iters, n_frames, prev_row0, scharr_mxu,
):
    """Frame-batched VMEM-resident top level: grid step (f, k) runs
    iteration k of pair f -> f+1 with all pair state resident in VMEM.

    Same residency as ``_fused_level_grads_resident_kernel``, with the
    chunk's cold pairs sharing one launch: frame f+1's prev window and flow
    seed prefetch during frame f's iterations (slot = f parity) and the
    out/stats writes defer their waits two frames, so the per-frame
    synchronous DMA stalls of the single-pair kernel (prev+flow load, out
    and stats write ~6 us each) overlap neighboring frames' compute.
    """
    fi = pl.program_id(0)
    k = pl.program_id(1)
    slot = jax.lax.rem(fi, 2)
    oslot = 1 - slot
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    c0 = 128 - _HALO

    def prev_copy(f_, sl):
        return pltpu.make_async_copy(
            frames_hbm.at[f_, pl.ds(prev_row0, tile_h + 32),
                          pl.ds(0, prev_scratch.shape[-1])],
            prev_scratch.at[sl], sems.at[sl],
        )

    def flow_copy(f_, sl):
        return pltpu.make_async_copy(
            flow_in_hbm.at[f_], flow_scratch.at[sl], sems.at[2 + sl]
        )

    def out_copy(f_, sl):
        return pltpu.make_async_copy(
            out_tile.at[sl], out_hbm.at[f_], sems.at[5 + sl]
        )

    def stats_copy(f_, sl):
        return pltpu.make_async_copy(
            stats_tile.at[sl], stats_hbm.at[f_], sems.at[7 + sl]
        )

    @pl.when((fi == 0) & (k == 0))
    def _():
        prev_copy(0, 0).start()
        flow_copy(0, 0).start()

    @pl.when(k == 0)
    def _():
        prev_copy(fi, slot).wait()
        flow_copy(fi, slot).wait()

        @pl.when(fi + 1 < n_frames)
        def _():
            prev_copy(fi + 1, oslot).start()
            flow_copy(fi + 1, oslot).start()

        p = prev_scratch[slot]
        if scharr_mxu:
            ix_w, iy_w = _scharr_mxu_cols(p, eth, etw)
        else:
            sy = (3.0 * p[7:7 + eth, 119:121 + etw]
                  + 10.0 * p[8:8 + eth, 119:121 + etw]
                  + 3.0 * p[9:9 + eth, 119:121 + etw]) * (1.0 / 16.0)
            ix_w = (sy[:, 2:] - sy[:, :-2]) * 0.5
            sx = (3.0 * p[7:9 + eth, 119:119 + etw]
                  + 10.0 * p[7:9 + eth, 120:120 + etw]
                  + 3.0 * p[7:9 + eth, 121:121 + etw]) * (1.0 / 16.0)
            iy_w = (sx[2:, :] - sx[:-2, :]) * 0.5

        def fill(a, width):
            ext = width - a.shape[-1]
            if ext == 0:
                return a
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], ext))], axis=-1
            )

        gw = grad_cache.shape[-1]
        grad_cache[0] = fill(ix_w, gw)
        grad_cache[1] = fill(iy_w, gw)
        grad_cache[2] = fill(p[8:8 + eth, 120:120 + etw], gw)
        a11 = _boxsum_tile_mxu(ix_w * ix_w, win_k, tile_h, tile_w)
        a12 = _boxsum_tile_mxu(ix_w * iy_w, win_k, tile_h, tile_w)
        a22 = _boxsum_tile_mxu(iy_w * iy_w, win_k, tile_h, tile_w)
        det = a11 * a22 - a12 * a12
        min_eig = (a11 + a22
                   - jnp.sqrt((a11 - a22) ** 2 + 4.0 * a12 * a12)) / (
            2.0 * area_f
        )
        solvable = det > 1e-7
        validf = jnp.where((min_eig >= eig_thr) & solvable, 1.0, 0.0)
        aw = a_cache.shape[-1]
        a_cache[0] = fill(a11, aw)
        a_cache[1] = fill(a12, aw)
        a_cache[2] = fill(a22, aw)
        a_cache[3] = fill(validf / jnp.where(solvable, det, 1.0), aw)

        @pl.when(fi >= 2)
        def _():
            stats_copy(fi, slot).wait()    # started two frames ago
        stats_tile[slot, 0] = fill(min_eig, aw)
        stats_tile[slot, 1] = fill(validf, aw)
        stats_copy(fi, slot).start()

    fx_w = flow_scratch[slot, 0, :, c0:c0 + etw]
    fy_w = flow_scratch[slot, 1, :, c0:c0 + etw]
    jw = _warp_core(
        frames_hbm, fx_w, fy_w, -_HALO, -_HALO, win_scratch, sems.at[4],
        h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, th=eth,
        tw=etw, local=local, ref_cy=eth // 2, ref_cx=etw // 2, frame=fi + 1,
    )
    ix_w = grad_cache[0, :, :etw]
    iy_w = grad_cache[1, :, :etw]
    prev_w = grad_cache[2, :, :etw]
    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    b1 = _boxsum_tile_mxu(ix_w * r, win_k, tile_h, tile_w)
    b2 = _boxsum_tile_mxu(iy_w * r, win_k, tile_h, tile_w)
    a11 = a_cache[0, :, :tile_w]
    a12 = a_cache[1, :, :tile_w]
    a22 = a_cache[2, :, :tile_w]
    invd = a_cache[3, :, :tile_w]
    fx_t = fx_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    fy_t = fy_w[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w]
    b1 = b1 + a11 * fx_t + a12 * fy_t
    b2 = b2 + a12 * fx_t + a22 * fy_t
    du = (a12 * b2 - a22 * b1) * invd
    dv = (a12 * b1 - a11 * b2) * invd
    bound = jnp.float32(bound_f)
    fx_new = jnp.clip(fx_t + du, -bound, bound)
    fy_new = jnp.clip(fy_t + dv, -bound, bound)
    fdw = flow_scratch.shape[-1]
    row0 = flow_scratch[slot, 0, _HALO:_HALO + tile_h]
    row1 = flow_scratch[slot, 1, _HALO:_HALO + tile_h]
    flow_scratch[slot, 0, _HALO:_HALO + tile_h] = jnp.concatenate(
        [row0[:, :128], fx_new, row0[:, 128 + tile_w:fdw]], axis=1
    )
    flow_scratch[slot, 1, _HALO:_HALO + tile_h] = jnp.concatenate(
        [row1[:, :128], fy_new, row1[:, 128 + tile_w:fdw]], axis=1
    )

    @pl.when(k == n_iters - 1)
    def _():
        ow = out_tile.shape[-1]

        def fill2(a):
            ext = ow - a.shape[-1]
            if ext == 0:
                return a
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[:, -1:], (a.shape[0], ext))], axis=-1
            )

        @pl.when(fi >= 2)
        def _():
            out_copy(fi, slot).wait()      # started two frames ago
        out_tile[slot, 0] = fill2(fx_new)
        out_tile[slot, 1] = fill2(fy_new)
        out_copy(fi, slot).start()

    @pl.when((fi == n_frames - 1) & (k == n_iters - 1))
    def _():
        out_copy(fi, slot).wait()
        stats_copy(fi, slot).wait()
        if n_frames >= 2:
            out_copy(fi, oslot).wait()
            stats_copy(fi, oslot).wait()


def make_fused_lk_level_grads_resident_batched(
    frames: jnp.ndarray,
    hw: tuple[int, int],
    n_iters: int,
    min_eig_threshold: float,
    max_disp: int,
    local: int = LOCAL,
    win_k: int = 15,
    scharr_mxu: bool = True,
):
    """Frame-batched build of the VMEM-resident top level.

    frames: (F+1, Hp, Wp) unified-prepadded top-level planes; hw the true
    level size (one tile: h <= 272, w <= 512, h % 8 == 0).  Returns
    run(flow_init=None) -> (flow (F, 2, h, w) planes, min_eig, valid);
    flow_init may be (F, 2, h, w) planes for a warm seed.  Per-pair
    numerics bit-identical to make_fused_lk_level_grads_resident.
    """
    h, w = hw
    n_frames = frames.shape[0] - 1
    assert n_frames >= 1
    tile_h, tile_w = h, w
    assert h <= 272 and w <= 512 and h % 8 == 0, (h, w)
    assert win_k <= 2 * _HALO - 1
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    tw_pad = -(-tile_w // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    upt, upb, upl, upr = unified_pad_geometry(tile_h, tile_w, max_disp,
                                              local)
    assert frames.shape[1:] == (upt + h + upb, upl + w + upr), (
        frames.shape, (upt, upb, upl, upr))
    assert upl + w + upr >= etw_dma_p, (upr, etw_dma_p)
    kernel = functools.partial(
        _fused_level_grads_resident_batched_kernel, h=h, w=w, pad_y=upt,
        pad_x=upl, max_disp=max_disp, tile_h=tile_h, tile_w=tile_w,
        local=local, win_k=win_k, bound_f=float(max_disp),
        area_f=float(win_k * win_k),
        eig_thr=float(min_eig_threshold) * 1024.0, n_iters=n_iters,
        n_frames=n_frames, prev_row0=upt - 16,
        scharr_mxu=scharr_mxu and _scharr_mxu_ok(etw, etw_dma_p),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_frames, 2, tile_h, tw_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_frames, 2, tile_h, tw_pad), jnp.float32),
        ),
        grid=(n_frames, n_iters),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # stacked frames
            pl.BlockSpec(memory_space=pltpu.HBM),   # per-pair flow seeds
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((2, tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, 2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((3, eth, -(-etw // 128) * 128), jnp.float32),
            pltpu.VMEM((4, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, 2, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, 2, tile_h, tw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )

    def run(flow_init=None):
        if flow_init is None:
            buf = jnp.zeros((n_frames, 2, eth, etw_dma), jnp.float32)
        else:
            assert flow_init.shape == (n_frames, 2, h, w), flow_init.shape
            buf = jnp.pad(
                flow_init.astype(jnp.float32),
                ((0, 0), (0, 0), (_HALO, _HALO), (128, etw_dma - 128 - w)),
                mode="edge")
        out, stats = call(frames, buf)
        return (out[:, :, :, :w], stats[:, 0, :, :w],
                stats[:, 1, :, :w] > 0.5)

    return run


def make_fused_lk_level(
    next_img: jnp.ndarray,
    prev_img: jnp.ndarray,
    ix: jnp.ndarray,
    iy: jnp.ndarray,
    a11: jnp.ndarray,
    a12: jnp.ndarray,
    a22: jnp.ndarray,
    inv_det: jnp.ndarray,
    n_iters: int,
    max_disp: int = 32,
    tile_h: int = TILE_H,
    tile_w: int = TILE_W,
    local: int = LOCAL,
    win_k: int = 15,
):
    """Build run(flow_init) -> flow executing n_iters fused IC iterations.

    One pallas_call per level: grid (n_iters, tiles_y, tiles_x).  Flow lives
    in an HBM ping-pong buffer aliased input->output; per iteration each tile
    reads 3 stacked windows and writes one (2, th, tw) tile — no XLA glue,
    no HBM round-trips of intermediate arrays between iterations.

    Border note: the 8-px halo bands outside the frame hold the *initial*
    flow's edge replication for all iterations (the XLA path re-replicates
    per iteration).  This affects box sums only within the outermost window
    radius of the frame border.

    All arrays (H, W); H % tile_h == 0, W % tile_w == 0 (flow.dense pads).
    """
    h, w = next_img.shape
    assert h % tile_h == 0 and w % tile_w == 0, (h, w)
    assert tile_h % 8 == 0 and _HALO == 8
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    pad = max_disp + local + 1 + max(sh, sw - etw)
    next_pad = jnp.pad(next_img.astype(jnp.float32), pad, mode="edge")

    gy = _HALO  # row padding of the windowed inputs

    def pad_ext(x):
        # right col pad 256: the 128-rounded DMA width may overrun 128+halo
        return jnp.pad(x.astype(jnp.float32), ((gy, gy), (128, 256)),
                       mode="edge")

    static_stack = jnp.stack([pad_ext(prev_img), pad_ext(ix), pad_ext(iy)])
    a_stack = jnp.stack([a11, a12, a22, inv_det]).astype(jnp.float32)
    hext = h + 2 * gy
    wext = w + 128 + 256

    grid = (n_iters, h // tile_h, w // tile_w)
    kernel = functools.partial(
        _fused_level_kernel, h=h, w=w, pad=pad, max_disp=max_disp,
        tile_h=tile_h, tile_w=tile_w, local=local, win_k=win_k,
        bound_f=float(max_disp),
    )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, hext, wext), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # padded next
            pl.BlockSpec(memory_space=pltpu.HBM),   # prev/ix/iy stack
            pl.BlockSpec(memory_space=pltpu.HBM),   # flow ping-pong (aliased)
            pl.BlockSpec((4, tile_h, tile_w), lambda k, i, j: (0, i, j),
                         memory_space=pltpu.VMEM),  # structure tensor stack
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((3, eth, etw_dma), jnp.float32),
            pltpu.VMEM((2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((2, tile_h, -(-tile_w // 128) * 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={2: 0},
    )

    def run(flow_init: jnp.ndarray) -> jnp.ndarray:
        fx = pad_ext(flow_init[..., 0])
        fy = pad_ext(flow_init[..., 1])
        # both slot pairs start at the init flow so iteration 0's halo reads
        # (and odd/even result slots) are well-defined
        buf = jnp.stack([fx, fy, fx, fy])
        out = call(next_pad, static_stack, buf, a_stack)
        s = 2 * (n_iters % 2)
        flow = out[s:s + 2, gy:gy + h, 128:128 + w]
        return jnp.moveaxis(flow, 0, -1)

    return run


# ---------------------------------------------------------------------------
# Batched per-point window gather for the sparse tracker
# ---------------------------------------------------------------------------

_GK = 16         # points per grid step (all 2*_GK DMAs in flight)
_PW_ROWS = 32    # prev rows: corner row 1..8 in-fetch + (win+2)<=24 used
_SW_ROWS2 = 40   # aligned superwindow rows (32 + 8 align slack)
_GW = 256        # DMA width: 128-aligned cols + <=175 used
_PW_OUT = 24     # emitted prev rows: corner-1 at row 0 (win+1 <= 22)
_SW_OUT = 32     # emitted superwindow rows: corner at row 0


def _unroll_rows(a, e):
    """Undo the 8-alignment row remainder ``e`` with static-bit sublane
    rolls (exact at any geometry; the dynamic axis-0 roll is miscompiled
    for non-power-of-two sublane-group counts)."""
    for bit in (1, 2, 4):
        r = pltpu.roll(a, shift=a.shape[0] - bit, axis=0)
        a = jnp.where((e & bit) != 0, r, a)
    return a


def _prev_window_transform(p, col_rem, row_rem):
    """(_PW_ROWS, _GW) raw prev fetch -> three (_PW_OUT, 128) planes
    (intensities, Scharr ix, Scharr iy) with the corner at row 1 / COL 1.

    Shared by the per-point and per-frame-band gather kernels.  The lane
    roll by col_rem puts source col corner-1 at lane 0 (corner at lane 1)
    and the tile is immediately sliced to 128 lanes: every op after the
    roll — the static-bit row unrolls, both Scharr passes — runs on HALF
    the vregs (the per-point transform chain, not the DMAs, is what the
    gather's cost is made of; scripts/exp_tracker_split.py).  The window
    spans lanes 1..win+2 and the stencil's lane-roll wraparound garbage
    sits at lanes 0/127, outside every consumed column.  Scharr exactly
    as ops/gradients.py (smooth [3,10,3]/16, diff [-0.5, 0, 0.5])."""
    p = pltpu.roll(p, shift=-col_rem, axis=1)[:, :128]
    p = _unroll_rows(p, row_rem - 1)
    sm = (p[:-2] * (3.0 / 16.0) + p[1:-1] * (10.0 / 16.0)
          + p[2:] * (3.0 / 16.0))                  # row r -> p r+1
    ix = (pltpu.roll(sm, shift=127, axis=1)
          - pltpu.roll(sm, shift=1, axis=1)) * 0.5
    smx = (pltpu.roll(p, shift=1, axis=1) * (3.0 / 16.0)
           + p * (10.0 / 16.0)
           + pltpu.roll(p, shift=127, axis=1) * (3.0 / 16.0))
    iy = (smx[2:] - smx[:-2]) * 0.5                # row r -> p r+1
    # out row q == p row q (corner-1 at out row 0, corner at 1); gradient
    # row q == deriv at p row q == ix[q-1], so prepend one throwaway row
    # (out row 0 of planes 1/2 is never consumed)
    return (
        p[:_PW_OUT],
        jnp.concatenate([ix[:1], ix[:_PW_OUT - 1]], axis=0),
        jnp.concatenate([iy[:1], iy[:_PW_OUT - 1]], axis=0),
    )


def _sw_window_transform(sw, col_rem, row_rem):
    """(_SW_ROWS2, _GW) raw superwindow fetch -> (_SW_OUT, 128) with the
    corner at row 0 / col 0 (shared by both gather kernels; lanes sliced
    to 128 right after the roll, same rationale as the prev transform)."""
    sw = pltpu.roll(sw, shift=-col_rem, axis=1)[:, :128]
    sw = _unroll_rows(sw, row_rem)
    return sw[:_SW_OUT]


def make_point_window_gather(
    prev_f: jnp.ndarray,       # (FH, FW) folded prev frames (padded)
    next_f: jnp.ndarray,       # (FH, FW) folded next frames (padded)
):
    """Build gather(starts) -> (prev_wins, sw_wins) fetching per-point
    windows with pipelined Pallas DMAs, computing Scharr per window.

    The XLA path's per-point ``vmap(dynamic_slice)`` lowers to ~2-3.5 us
    serialized fetches — 3,840 of them per 32-stream frame dominated the
    whole tracker (measured 8.8 ms fixed cost, iteration-count independent).
    Here a grid step fetches windows for 16 points with all 32 DMAs in
    flight (plus the NEXT step's prefetched by slot parity), undoes BOTH
    alignment remainders in-kernel (dynamic lane roll; static-bit sublane
    rolls for rows), and computes the Scharr gradients per window in VMEM —
    so the caller needs neither a full-frame scharr pass nor any
    remainder-tap unfolding (the 8 masked row taps per array had cost
    ~0.65 ms/level at 1280 points).

    starts: (8, NP) int32 — [prev_row_al, prev_col_al, sw_row_al,
    sw_col_al, prev_col_rem, sw_col_rem, prev_row_rem, sw_row_rem];
    *_al rows 8-aligned / cols 128-aligned and in-bounds for a
    (_PW_ROWS/_SW_ROWS2, 256) slice (caller pads the images); prev_col_rem
    is the lane of source column corner-1 (so corner-1-aligned fetches),
    prev_row_rem the in-fetch row of the corner (1..8 — the fetch starts at
    the 8-floor of corner-1), sw_row_rem the superwindow-top row (0..7).
    NP % 16 == 0.

    Returns prev_wins (NP, 3, _PW_OUT, 128): plane 0 prev intensities,
    planes 1/2 Scharr ix/iy, with the CORNER at row 1 / col 0 on every
    plane (row 0 = corner-1); and sw_wins (NP, _SW_OUT, 128) with the
    superwindow corner at row 0 / col 0.
    """
    fh, fw = next_f.shape
    assert prev_f.shape == (fh, fw), (prev_f.shape, next_f.shape)
    assert fh % 8 == 0 and fw % 128 == 0, (fh, fw)
    gk = _GK

    def kernel(starts, pv_hbm, nx_hbm, outp, outs, scr_p, scr_s, sems):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        oslot = 1 - slot

        # descriptor builders: the wait consumes semaphore+size only, so
        # reconstructing with any in-bounds offsets of the same shape works
        def prev_copy(idx, sl, k):
            pr = pl.multiple_of(starts[0, idx], 8)
            pc = pl.multiple_of(starts[1, idx], 128)
            return pltpu.make_async_copy(
                pv_hbm.at[pl.ds(pr, _PW_ROWS), pl.ds(pc, _GW)],
                scr_p.at[sl, k], sems.at[sl, k],
            )

        def sw_copy(idx, sl, k):
            sr = pl.multiple_of(starts[2, idx], 8)
            sc = pl.multiple_of(starts[3, idx], 128)
            return pltpu.make_async_copy(
                nx_hbm.at[pl.ds(sr, _SW_ROWS2), pl.ds(sc, _GW)],
                scr_s.at[sl, k], sems.at[sl, gk + k],
            )

        def issue(step, sl):
            for k in range(gk):
                idx = step * gk + k
                prev_copy(idx, sl, k).start()
                sw_copy(idx, sl, k).start()

        @pl.when(i == 0)
        def _():
            issue(i, slot)

        # prefetch the NEXT grid step's 2*gk windows during this step's
        # compute — the per-step cost had been issue + wait latency in
        # series with the rolls/Scharr (measured ~1.7 us/point)
        @pl.when(i < n_steps - 1)
        def _():
            issue(i + 1, oslot)

        for k in range(gk):
            idx = i * gk + k
            prev_copy(idx, slot, k).wait()
            p0, p1, p2 = _prev_window_transform(
                scr_p[slot, k], starts[4, idx], starts[6, idx])
            outp[k, 0] = p0
            outp[k, 1] = p1
            outp[k, 2] = p2
            sw_copy(idx, slot, k).wait()
            outs[k] = _sw_window_transform(
                scr_s[slot, k], starts[5, idx], starts[7, idx])

    def gather(starts: jnp.ndarray):
        np_ = starts.shape[1]
        assert np_ % gk == 0, np_
        grid = (np_ // gk,)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=[
                    pl.BlockSpec((gk, 3, _PW_OUT, 128),
                                 lambda i, *_: (i, 0, 0, 0)),
                    pl.BlockSpec((gk, _SW_OUT, 128),
                                 lambda i, *_: (i, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, gk, _PW_ROWS, _GW), jnp.float32),
                    pltpu.VMEM((2, gk, _SW_ROWS2, _GW), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2 * gk)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((np_, 3, _PW_OUT, 128), jnp.float32),
                jax.ShapeDtypeStruct((np_, _SW_OUT, 128), jnp.float32),
            ],
        )(starts, prev_f, next_f)

    return gather


def make_frame_band_gather(
    prev_f: jnp.ndarray,       # (FH, FW) folded prev frames (padded)
    next_f: jnp.ndarray,       # (FH, FW) folded next frames (padded)
    n_frames: int,
    pts_per_frame: int,
    frame_stride: int,         # rows per folded frame (fph + 2), PADDED abs
):
    """Per-FRAME band gather: same output contract as
    make_point_window_gather, but one grid step per *frame* fetches that
    frame's whole folded row band (prev + next) into VMEM with TWO DMAs
    and extracts its points' windows with in-VMEM dynamic slices.

    Motivation (scripts/exp_tracker_split.py, B=64 x 20 pts @860x482):
    the per-point kernel's 2*16 DMAs per grid step are descriptor-issue
    bound — the three levels' gathers cost 4.5 ms of the 5.7 ms tracker
    while all compute after them is ~0.5 ms.  Here the DMA count drops
    1280 x 2 -> 64 x 2 per level and the traffic becomes two sequential
    full-band reads per frame, which HBM streams at line rate.

    Requires points grouped frame-major (starts[:, f*ppf + k] belongs to
    frame f — the batched tracker's natural layout) and every descriptor
    row in-band: the caller guarantees corners clipped inside the frame
    (sparse.py clips to the folded frame box).  starts layout identical
    to make_point_window_gather; rows stay ABSOLUTE (the kernel subtracts
    the band origin).
    """
    fh, fw = next_f.shape
    assert prev_f.shape == (fh, fw), (prev_f.shape, next_f.shape)
    assert fh % 8 == 0 and fw % 128 == 0, (fh, fw)
    # rows above the band origin any descriptor's fetch can reach: prev
    # corners are clipped to fph - win_h - 1 (win_h >= 1) and fetch 32
    # rows, superwindow corners to fph - sw_h (sw_h = min(32, fph)) and
    # fetch 40; both end <= frame_base + stride + 28, and the 8-floor
    # band origin sits at most 7 rows above frame_base.
    band_rows = -(-(frame_stride + 36) // 8) * 8
    assert fh >= 8 + (n_frames - 1) * frame_stride + band_rows, (
        "folded array needs >= band slack below the last frame",
        fh, n_frames, frame_stride, band_rows)

    def kernel(starts, pv_hbm, nx_hbm, outp, outs, scr_p, scr_s, sems):
        i = pl.program_id(0)
        n_steps = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        oslot = 1 - slot

        def band0(f):
            # 8-floor of the frame's first padded row (+8 top pad)
            return (8 + f * frame_stride) // 8 * 8

        def issue(f, sl):
            r0 = pl.multiple_of(band0(f), 8)
            pltpu.make_async_copy(
                pv_hbm.at[pl.ds(r0, band_rows), :], scr_p.at[sl],
                sems.at[sl, 0]).start()
            pltpu.make_async_copy(
                nx_hbm.at[pl.ds(r0, band_rows), :], scr_s.at[sl],
                sems.at[sl, 1]).start()

        @pl.when(i == 0)
        def _():
            issue(i, slot)

        @pl.when(i < n_steps - 1)
        def _():
            issue(i + 1, oslot)

        b0 = band0(i)
        pltpu.make_async_copy(
            pv_hbm.at[pl.ds(pl.multiple_of(b0, 8), band_rows), :],
            scr_p.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(
            nx_hbm.at[pl.ds(pl.multiple_of(b0, 8), band_rows), :],
            scr_s.at[slot], sems.at[slot, 1]).wait()

        for k in range(pts_per_frame):
            idx = i * pts_per_frame + k
            pr = pl.multiple_of(starts[0, idx] - b0, 8)
            pc = pl.multiple_of(starts[1, idx], 128)
            p = scr_p[slot, pl.ds(pr, _PW_ROWS), pl.ds(pc, _GW)]
            p0, p1, p2 = _prev_window_transform(
                p, starts[4, idx], starts[6, idx])
            outp[k, 0] = p0
            outp[k, 1] = p1
            outp[k, 2] = p2
            sr = pl.multiple_of(starts[2, idx] - b0, 8)
            sc = pl.multiple_of(starts[3, idx], 128)
            sw = scr_s[slot, pl.ds(sr, _SW_ROWS2), pl.ds(sc, _GW)]
            outs[k] = _sw_window_transform(
                sw, starts[5, idx], starts[7, idx])

    def gather(starts: jnp.ndarray):
        np_ = starts.shape[1]
        assert np_ == n_frames * pts_per_frame, (np_, n_frames,
                                                 pts_per_frame)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_frames,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.HBM),
                    pl.BlockSpec(memory_space=pltpu.HBM),
                ],
                out_specs=[
                    pl.BlockSpec((pts_per_frame, 3, _PW_OUT, 128),
                                 lambda i, *_: (i, 0, 0, 0)),
                    pl.BlockSpec((pts_per_frame, _SW_OUT, 128),
                                 lambda i, *_: (i, 0, 0)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, band_rows, fw), jnp.float32),
                    pltpu.VMEM((2, band_rows, fw), jnp.float32),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((np_, 3, _PW_OUT, 128), jnp.float32),
                jax.ShapeDtypeStruct((np_, _SW_OUT, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(starts, prev_f, next_f)

    return gather


# ---------------------------------------------------------------------------
# Dual-plane pyrDown: 5-tap Gaussian + 2x decimation for (prev, next) at once
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402  (band-matrix construction only)


@functools.lru_cache(maxsize=1)
def _pyr_pair_band_matrix() -> np.ndarray:
    """(512, 128) bf16-exact band matrix: out col l of a 128-wide chunk is
    the 5-tap [1,4,6,4,1]/16 filter of padded-input window cols 126+2l..130+2l
    (window q covers padded cols [256q, 256q+512); see pallas_pyr_down_pair).
    The same matrix serves every chunk — offsets are relative to the window.
    """
    g = (1 / 16, 4 / 16, 6 / 16, 4 / 16, 1 / 16)
    m = np.zeros((512, 128), np.float32)
    for l in range(128):  # noqa: E741
        for k in range(5):
            m[126 + 2 * l + k, l] = g[k]
    return m


def _pyr_down_kernel(
    *refs,
    n_planes, h2, w, th2, w2p, n_q, n_bands, tile_rows,
):
    """Grid step s: output band (s % n_bands) of plane (s // n_bands).

    Generic over n_planes: the pair form (n_planes=2) decimates (prev, next)
    of a level in one grid (the per-pair pyramid build); the single form
    (n_planes=1) serves video mode, where each scan step decimates only the
    ONE new frame (dense.build_frame_levels) and a dual-plane call would do
    double work.

    The input refs are the RAW frames viewed as (h/2, 2w) fused row pairs
    (a metadata-free reshape — no XLA prep pass), so the even/odd row split
    the 5-tap vertical filter needs becomes two LANE-ALIGNED slices.  All
    border handling happens in-kernel:

    * tile row j holds fused row (band*th2 - 8 + j); the first band DMAs
      with a +8 destination offset instead of a negative source row, and
      the last band's copy is clamped to the frame (both are pl.when
      branches with their own static descriptor, and the waits rebuild the
      same branch so the consumed semaphore size always matches);
    * the REFLECT_101 rows outside the frame are handled by zeroing the
      one out-of-frame tile row each edge band actually reads and adding
      the reflected taps back with a row-masked fix (rows -2,-1 reflect to
      rows 2,1; row h to row h-2);
    * the vertical-filter result lands at column offset 128 of a staging
      buffer whose margins are zeroed once at step 0 and never rewritten,
      so every 128-col output chunk is one bf16 banded matmul with the
      SAME (512, 128) matrix; the two REFLECT_101 column taps the zero
      margins drop (out col 0 and, for even w, out col w/2-1) come back as
      lane-masked adds.

    Vertical filter: 5 shifted f32 adds (exact).  Horizontal filter +
    decimation: chunked bf16 banded matmuls (lane-stride-2 access on the
    VPU would be a relayout per tap; the MXU does filter+decimate in one
    pass).  Input DMAs are double-buffered across steps; output DMAs wait
    two steps later with a final-step drain.
    """
    ins = refs[:n_planes]
    band_ref = refs[n_planes]
    outs = refs[n_planes + 1:2 * n_planes + 1]
    in_tile, v_buf, out_tile, sems = refs[2 * n_planes + 1:]

    s = pl.program_id(0)
    total = n_planes * n_bands
    slot = jax.lax.rem(s, 2)
    oslot = 1 - slot
    l0 = min(th2 + 8, h2)                       # band-0 copy rows
    l_last = h2 - (n_bands - 1) * th2 + 8       # last-band copy rows
    g0, g1, g2, g3, g4 = 0.0625, 0.25, 0.375, 0.25, 0.0625

    def in_cases(ref, band_, sl, op):
        """Issue (or wait) the band-appropriate input copy: the three
        cases have different static sizes, so the wait must rebuild the
        branch taken at start time."""
        def go(copy):
            getattr(copy, op)()

        if n_bands == 1:
            go(pltpu.make_async_copy(
                ref.at[pl.ds(0, l0), :],
                in_tile.at[sl, pl.ds(8, l0), :], sems.at[sl]))
            return

        @pl.when(band_ == 0)
        def _():
            go(pltpu.make_async_copy(
                ref.at[pl.ds(0, l0), :],
                in_tile.at[sl, pl.ds(8, l0), :], sems.at[sl]))

        if n_bands > 2:
            @pl.when((band_ > 0) & (band_ < n_bands - 1))
            def _():
                row0 = pl.multiple_of(band_ * th2 - 8, 8)
                go(pltpu.make_async_copy(
                    ref.at[pl.ds(row0, tile_rows), :],
                    in_tile.at[sl], sems.at[sl]))

        @pl.when(band_ == n_bands - 1)
        def _():
            row0 = pl.multiple_of((n_bands - 1) * th2 - 8, 8)
            go(pltpu.make_async_copy(
                ref.at[pl.ds(row0, l_last), :],
                in_tile.at[sl, pl.ds(0, l_last), :], sems.at[sl]))

    def for_plane(s_, fn):
        """Run fn(plane_refs_index, band) under the matching plane branch
        (static-unrolled; the single-plane form needs no predicate)."""
        pl_ = s_ // n_bands
        band_ = s_ - pl_ * n_bands
        if n_planes == 1:
            fn(0, band_)
            return
        for p in range(n_planes):
            @pl.when(pl_ == p)
            def _(p=p):
                fn(p, band_)

    def start_in(s_, sl):
        for_plane(s_, lambda p, band_: in_cases(ins[p], band_, sl, "start"))

    def out_copy(s_, sl, op):
        def go(p, band_):
            row0 = pl.multiple_of(band_ * th2, 8)
            getattr(pltpu.make_async_copy(
                out_tile.at[sl], outs[p].at[pl.ds(row0, th2), :],
                sems.at[2 + sl],
            ), op)()

        for_plane(s_, go)

    @pl.when(s == 0)
    def _():
        start_in(0, 0)
        # staging-buffer margins: zeroed once, never rewritten
        v_buf[:, :128] = jnp.zeros((th2, 128), jnp.float32)
        v_buf[:, 128 + w:] = jnp.zeros(
            (th2, v_buf.shape[1] - 128 - w), jnp.float32)

    @pl.when(s < total - 1)
    def _():
        start_in(s + 1, oslot)

    plane = s // n_bands
    band = s - plane * n_bands
    r0 = band * th2

    # wait this step's input (band-matched descriptor => matching size)
    for_plane(s, lambda p, band_: in_cases(ins[p], band_, slot, "wait"))

    # zero the single out-of-frame row each edge band reads (row 7 is
    # fused row -1 for band 0; row l_last is fused row h/2 for the last)
    @pl.when(band == 0)
    def _():
        in_tile[slot, 7:8, :] = jnp.zeros((1, 2 * w), jnp.float32)

    @pl.when(band == n_bands - 1)
    def _():
        in_tile[slot, l_last:l_last + 1, :] = jnp.zeros(
            (1, 2 * w), jnp.float32)

    # vertical 5-tap at even output rows: with tile row j = fused row
    # r0-8+j, out row i needs fused rows i-1 (e,o), i (e,o), i+1 (e)
    t = in_tile[slot]
    em1 = t[7:7 + th2, :w]
    om1 = t[7:7 + th2, w:]
    e0 = t[8:8 + th2, :w]
    o0 = t[8:8 + th2, w:]
    ep1 = t[9:9 + th2, :w]
    v = g0 * em1 + g1 * om1 + g2 * e0 + g3 * o0 + g4 * ep1

    # REFLECT_101 row fixes: out row 0 reflects raw rows -2,-1 -> 2,1
    # (= ep1, o0 at row 0); out row h/2-1 (h even) reflects row h -> h-2
    # (= e0 at that row).  The zeroed tile rows dropped exactly these taps.
    gr = jax.lax.broadcasted_iota(jnp.int32, (th2, 1), 0) + r0
    v = v + jnp.where((band == 0) & (gr == 0), g0 * ep1 + g1 * o0, 0.0)
    v = v + jnp.where((band == n_bands - 1) & (gr == h2 - 1),
                      g4 * e0, 0.0)
    v_buf[:, 128:128 + w] = v

    m = band_ref[:]
    cols = []
    qr = ((w // 2 - 1) // 128, (w // 2 - 1) % 128)   # right-edge chunk/lane
    lane = jax.lax.broadcasted_iota(jnp.int32, (th2, 128), 1)
    for q in range(n_q):
        win = v_buf[:, 256 * q:256 * q + 512].astype(jnp.bfloat16)
        c = jax.lax.dot_general(
            win, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # REFLECT_101 column fixes (zero margins dropped these taps):
        # out col 0 reflects raw cols -2,-1 -> 2,1; out col w/2-1 (w even)
        # reflects col w -> w-2
        if q == 0:
            c = c + jnp.where(
                lane == 0, g0 * v[:, 2:3] + g1 * v[:, 1:2], 0.0)
        if q == qr[0] and w % 2 == 0:
            c = c + jnp.where(lane == qr[1], g4 * v[:, w - 2:w - 1], 0.0)
        cols.append(c)

    @pl.when(s >= 2)
    def _():
        out_copy(s - 2, slot, "wait")     # this slot's copy, two steps ago

    out_tile[slot] = jnp.concatenate(cols, axis=1)
    out_copy(s, slot, "start")

    @pl.when(s == total - 1)
    def _():
        out_copy(s, slot, "wait")         # this step's own write
        if total >= 2:
            out_copy(s - 1, oslot, "wait")  # step total-2's write


def pyr_pair_supported(h: int, w: int) -> bool:
    """Geometry the in-kernel-prep pair kernel handles: h % 16 == 0 so every
    band's HBM row slice of the fused (h/2, 2w) view is sublane-aligned
    (Mosaic rejects copy lengths/offsets not divisible by 8 — measured:
    'Slice shape along dimension 0 must be aligned to tiling (8)'),
    lane-aligned width, and >= one 512-wide matmul window.  The production
    integration pads the pyramid base 1080 -> 1088 rows once (edge mode,
    matching the level kernels' own pad) so L0 (1088x1920) qualifies; L1
    (544x960) falls back to the XLA fast path on width."""
    return h % 16 == 0 and w % 128 == 0 and w >= 512 and h >= 16


def _pallas_pyr_down(planes: tuple) -> list:
    """cv.pyrDown-geometry decimation of N same-shape frames in ONE kernel.

    Matches ops.blur.pyr_down (5-tap [1,4,6,4,1]/16, REFLECT_101 border,
    even-pixel decimation, out size h/2 x ceil(w/2)) to bf16 data rounding
    in the column pass (the vertical pass is exact f32) — the same accuracy
    class as pyr_down(fast=True), gated end-to-end by bench.py's EPE check.
    Reference role: cv.pyrDown inside cv.calcOpticalFlowPyrLK's pyramid
    (LK_Final.py:531-532 uses maxLevel pyramids per frame pair).

    Rationale (all measured on v5e @1080p): the XLA fast path costs ~66 us
    per frame pair (two dense banded matmuls each); a first Pallas version
    that reflect-padded in XLA spent 79 us in the pads alone.  This kernel
    reads the raw frames directly as fused row-pair views and does ALL
    border handling in-kernel (see _pyr_down_kernel), leaving only
    HBM-bandwidth-bound traffic: each frame read ~1.1x once, each
    quarter-size result written once (~40 us/pair, planes sharing one
    grid to amortize the fixed per-step DMA cost).
    """
    h, w = planes[0].shape
    assert all(p.shape == (h, w) for p in planes)
    assert pyr_pair_supported(h, w), (h, w)
    n_planes = len(planes)
    h2 = h // 2
    w2 = -(-w // 2)
    w2p = -(-w2 // 128) * 128
    n_q = w2p // 128
    if h2 > 272:
        th2 = 136
    else:
        th2 = -(-h2 // 8) * 8
    n_bands = -(-h2 // th2)
    h2p = n_bands * th2
    tile_rows = th2 + 16

    fused = [p.astype(jnp.float32).reshape(h2, 2 * w) for p in planes]
    kernel = functools.partial(
        _pyr_down_kernel, n_planes=n_planes, h2=h2, w=w, th2=th2, w2p=w2p,
        n_q=n_q, n_bands=n_bands, tile_rows=tile_rows,
    )
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((h2p, w2p), jnp.float32)
            for _ in range(n_planes)
        ),
        grid=(n_planes * n_bands,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.HBM)] * n_planes
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        ),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_planes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tile_rows, 2 * w), jnp.float32),
            pltpu.VMEM((th2, 2 * w2p + 256), jnp.float32),
            pltpu.VMEM((2, th2, w2p), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
    )(*fused, jnp.asarray(_pyr_pair_band_matrix(), jnp.bfloat16))
    return [o[:h2, :w2] for o in outs]


def pallas_pyr_down_pair(
    a: jnp.ndarray, b: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decimate the (prev, next) frames of a level in one kernel — the
    per-pair pyramid build (see _pallas_pyr_down)."""
    outa, outb = _pallas_pyr_down((a, b))
    return outa, outb


def pallas_pyr_down_one(a: jnp.ndarray) -> jnp.ndarray:
    """Decimate ONE frame (degenerate n_planes=1 form of _pallas_pyr_down).

    Measured ~1% SLOWER than the XLA fast pyr_down when wired into video
    mode's per-step build (1475 vs 1490 fps @1080p end-to-end,
    scripts/exp_pyr_one.py): a single plane can't amortize the fixed
    per-grid-step DMA cost the way the pair form does, so
    dense.build_frame_levels keeps the XLA path.  Kept because it is the
    same kernel body as the winning pair form (no extra kernel code) and
    the right building block if a future caller has batched single frames.
    """
    return _pallas_pyr_down((a,))[0]
