"""Ablation timing of the L0 fused grads kernel (272x512 tiles, 1 iter).

Copies _fused_level_grads_kernel with short-circuit flags so the DMA
schedule stays identical while individual compute stages are removed:
  full      — production kernel
  no_warp   — _warp_finish skipped (jw := prev_w; warp DMA still runs)
  no_asums  — structure-tensor box sums replaced by constants
  no_bsums  — b box sums replaced by constants
  no_scharr — gradients replaced by cheap shifts
  no_box    — both A and b sums constant

Differential chain timing (slope between 10- and 40-iteration chains);
run alone on the TPU.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lk_tpu.flow.pallas_kernels import (
    _HALO, _asym_pads, _boxsum_tile_mxu, _warp_finish, _warp_start,
    _win_shape,
)

H, W = 1088, 2048
TILE_H, TILE_W = 272, 512
LOCAL = 3
MAX_DISP = 32
N_ITERS = 1


def _warp_finish_rolly(state, fx, fy, y0, x0, scratch,
                       *, h, w, pad_y, pad_x, max_disp, th, tw, local):
    """Variant: undo the ROW alignment remainder with a sublane roll (like
    the column pass) so the vertical select needs 2*local+2 taps, not
    2*local+9.  Weights use the tent form max(0, 1-|rel-d|) == the merged
    bilinear weight; masks computed at full vw width (widen once)."""
    dma, src_y_raw, src_x_raw, src_y, src_x = state
    bound = jnp.float32(max_disp)
    extra_y = src_y_raw - src_y        # 0..7, undone by the axis-0 roll
    extra_x = src_x_raw - src_x        # 0..127, undone by the axis-1 roll

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(jnp.float32)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    gx = jnp.clip(cols + x0 + jnp.clip(fx, -bound, bound), 0.0, w - 1.0)
    rel_y = jnp.clip(
        gy + pad_y - src_y_raw.astype(jnp.float32) - rows, 0.0, 2.0 * local
    )
    rel_x = jnp.clip(
        gx + pad_x - src_x_raw.astype(jnp.float32) - cols, 0.0, 2.0 * local
    )

    dma.wait()
    win = pltpu.roll(scratch[:].astype(jnp.float32), shift=-extra_x, axis=1)
    vw = tw + 2 * local + 1
    # undo the row alignment with STATIC-shift rolls selected by the bits of
    # extra_y: the dynamic axis-0 roll is miscompiled for non-power-of-two
    # sublane-group counts (measured: (304,*) shifts by s+32, (40,*) by
    # s+24; 64 rows exact) — static shifts are exact at any geometry.
    win = win[:, :-(-vw // 128) * 128]
    for bit in (1, 2, 4):
        r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
        win = jnp.where((extra_y & bit) != 0, r, win)

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, vw - tw))
        return jnp.concatenate([a, tail], axis=1)

    rel_y_w = widen(rel_y)
    acc = jnp.zeros((th, vw), jnp.float32)
    for d in range(2 * local + 2):
        m = jnp.maximum(0.0, 1.0 - jnp.abs(rel_y_w - d))
        acc = acc + m * win[d:d + th, :vw]
    vert = acc

    out = jnp.zeros((th, tw), jnp.float32)
    for d in range(2 * local + 2):
        m = jnp.maximum(0.0, 1.0 - jnp.abs(rel_x - d))
        out = out + m * vert[:, d:d + tw]
    return out


def _tent_gather_tree(win, rel, axis, out_len, local, sel_dtype=None):
    """_tent_gather with the equality-select CHAIN replaced by a bit-
    decomposed pairwise select TREE: di has 2*local+1 reachable values, so
    selecting taps[di] takes ceil(log2) rounds of pairwise selects on the
    di bits — same select count as the chain but depth 3 instead of 6 and
    the three bit masks are computed once (the chain recomputes an equality
    per tap).  With ``sel_dtype=bfloat16`` the taps are cast once (on the
    window, before slicing) and every select runs on half-width data; the
    lerp stays f32.  Correctness of the odd-tail rule: a tree level's
    unpaired last element passes through unselected, which is right only
    because di values that would pick its missing partner are unreachable
    (di <= 2*local)."""
    src = win if sel_dtype is None else win.astype(sel_dtype)
    n_di = 2 * local + 1
    taps = [jax.lax.slice_in_dim(src, d, d + out_len, axis=axis)
            for d in range(n_di + 1)]
    di_f = jnp.floor(rel)
    f = rel - di_f
    di = di_f.astype(jnp.int32)

    def tree(tlist):
        cur = list(tlist)
        bit = 1
        while len(cur) > 1:
            b = (di & bit) != 0
            nxt = []
            for i in range(0, len(cur), 2):
                if i + 1 < len(cur):
                    nxt.append(jnp.where(b, cur[i + 1], cur[i]))
                else:
                    nxt.append(cur[i])
            cur = nxt
            bit <<= 1
        return cur[0]

    t0 = tree(taps[:n_di])
    t1 = tree(taps[1:n_di + 1])
    if sel_dtype is not None:
        t0 = t0.astype(jnp.float32)
        t1 = t1.astype(jnp.float32)
    return (1.0 - f) * t0 + f * t1


def _warp_finish_tree(state, fx, fy, y0, x0, scratch, *,
                      h, w, pad_y, pad_x, max_disp, th, tw, local,
                      sel_dtype=None, chain_bf16=False):
    """Library _warp_finish with the gather swapped for the tree form (or
    the chain on bf16 taps when ``chain_bf16``)."""
    from lk_tpu.flow.pallas_kernels import _tent_gather

    dma, src_y_raw, src_x_raw, src_y, src_x = state
    bound = jnp.float32(max_disp)
    extra_y = src_y_raw - src_y
    extra_x = src_x_raw - src_x
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(
        jnp.float32)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    gx = jnp.clip(cols + x0 + jnp.clip(fx, -bound, bound), 0.0, w - 1.0)
    rel_y = jnp.clip(
        gy - (src_y_raw - pad_y).astype(jnp.float32) - rows, 0.0, 2.0 * local
    )
    rel_x = jnp.clip(
        gx - (src_x_raw - pad_x).astype(jnp.float32) - cols, 0.0, 2.0 * local
    )
    dma.wait()
    win = pltpu.roll(scratch[:].astype(jnp.float32), shift=-extra_x, axis=1)
    vw = tw + 2 * local + 1
    wp = -(-vw // 128) * 128
    win = win[:, :wp]
    for bit in (1, 2, 4):
        r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
        win = jnp.where((extra_y & bit) != 0, r, win)

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, wp - tw))
        return jnp.concatenate([a, tail], axis=1)

    if chain_bf16:
        vert = _tent_gather(win.astype(jnp.bfloat16), widen(rel_y), axis=0,
                            out_len=th, local=local).astype(jnp.float32)
        return _tent_gather(vert.astype(jnp.bfloat16), rel_x, axis=1,
                            out_len=tw, local=local).astype(jnp.float32)
    vert = _tent_gather_tree(win, widen(rel_y), axis=0, out_len=th,
                             local=local, sel_dtype=sel_dtype)
    return _tent_gather_tree(vert, rel_x, axis=1, out_len=tw, local=local,
                             sel_dtype=sel_dtype)


def _warp_finish_tpose(state, fx, fy, y0, x0, scratch, *,
                       h, w, pad_y, pad_x, max_disp, th, tw, local):
    """_warp_finish with the HORIZONTAL tent gather done on the transpose.

    The horizontal pass's 2*local+2 tap views are LANE-offset slices — each
    a Mosaic vector relayout (the same pathology scharr_mxu just removed
    from the gradients).  Transposing vert once turns them into SUBLANE
    slices (cheap); costs 3 transposes (vert, fx for rel_x, the result).
    Bit-identical math — only the layout moves."""
    from lk_tpu.flow.pallas_kernels import _tent_gather

    dma, src_y_raw, src_x_raw, src_y, src_x = state
    bound = jnp.float32(max_disp)
    extra_y = src_y_raw - src_y
    extra_x = src_x_raw - src_x
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(
        jnp.float32)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    rel_y = jnp.clip(
        gy - (src_y_raw - pad_y).astype(jnp.float32) - rows, 0.0, 2.0 * local
    )
    # rel_x built TRANSPOSED: iotas are free in either orientation; only
    # fx needs a data transpose
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (tw, th), 1).astype(
        jnp.float32)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (tw, th), 0).astype(
        jnp.float32)
    fx_t = fx.T
    gx_t = jnp.clip(cols_t + x0 + jnp.clip(fx_t, -bound, bound), 0.0, w - 1.0)
    rel_x_t = jnp.clip(
        gx_t - (src_x_raw - pad_x).astype(jnp.float32) - cols_t,
        0.0, 2.0 * local
    )
    dma.wait()
    win = pltpu.roll(scratch[:].astype(jnp.float32), shift=-extra_x, axis=1)
    vw = tw + 2 * local + 1
    wp = -(-vw // 128) * 128
    win = win[:, :wp]
    for bit in (1, 2, 4):
        r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
        win = jnp.where((extra_y & bit) != 0, r, win)

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, wp - tw))
        return jnp.concatenate([a, tail], axis=1)

    vert = _tent_gather(win, widen(rel_y), axis=0, out_len=th, local=local)
    out_t = _tent_gather(vert.T, rel_x_t, axis=0, out_len=tw, local=local)
    return out_t.T


def _boxsum_blocked_multi(ps, win_k, tile_h, tile_w):
    """Band-BLOCKED form of _boxsum_tile_mxu over several planes at once.

    The dense band matmuls waste MACs on the zero band tails: at L0
    geometry (288x528 ext, 272x512 tile) the column pass is 288x528x512
    and the row pass 272x288x512 per plane — 118M MACs/sum.  Blocking the
    column pass into 128-output-column chunks (each consuming a 256-col
    input slice) and the row pass into tile_h/2-row chunks (160-row input
    slices) cuts that to ~60M.  (Packing planes through one axis-0 concat
    fails in Mosaic: "offset mismatch on non-concat dimension" — the
    product planes carry different lane offsets.)  Band matrices stay
    exact 0/1 bf16; f32 accumulation; the same win_k values are summed, so
    outputs match the dense form up to MXU accumulation order.
    """
    eth, etw = ps[0].shape
    kc = 256
    rh = tile_h // 2
    kr = 160
    assert tile_w % 128 == 0 and etw >= kc and rh % 8 == 0 and eth >= kr
    outs = []
    for p in ps:
        pb = p.astype(jnp.bfloat16)
        cols = []
        for c in range(tile_w // 128):
            base = min(c * 128, etw - kc)
            off = c * 128 - base
            assert off + 127 + win_k <= kc - 1, (off, win_k, kc)
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
            assert roff % 8 == 0 and roff + rh - 1 + win_k <= kr - 1
            ir = jax.lax.broadcasted_iota(jnp.int32, (rh, kr), 0)
            jr = jax.lax.broadcasted_iota(jnp.int32, (rh, kr), 1)
            rmat = ((jr >= ir + roff + 1)
                    & (jr <= ir + roff + win_k)).astype(jnp.bfloat16)
            rows.append(jax.lax.dot_general(
                rmat, pc[kb:kb + kr], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        outs.append(jnp.concatenate(rows, axis=0))
    return outs


def _scharr_mxu(p, eth, etw, out_w=None, hilo=False):
    """Scharr ix/iy with the COLUMN passes as blocked banded bf16 MXU
    matmuls (the _boxsum_tile_mxu trick applied one stage earlier).

    The library form's column taps read the prev scratch at lane offsets
    119/120/121 — five lane-misaligned vector relayouts per tile (today's
    ablation: removing scharr saves 7.4 us/tile, far above its ~1 us of
    arithmetic).  Separability lets the lane-offset work move to the MXU:

        ix = rows_smooth(p) @ D      D: +-0.5 band at j_out+119 / j_out+121
        iy = rows_diff(p)   @ S      S: (3,10,3)/16 band at j_out+119..121

    where rows_smooth/rows_diff are SUBLANE taps (cheap) and the bands are
    exact in bf16.  The matmul INPUT rounds to bf16 (<= 2^-9 relative on
    pixel values) — same data-rounding class as the box sums' products,
    gated end-to-end by the EPE scenes.  Blocked into 128-output-column
    chunks of 256-col input slices: ~50M MACs per gradient plane.
    """
    ow = -(-etw // 128) * 128 if out_w is None else out_w
    assert ow % 128 == 0 and p.shape[1] >= ow + 256 - 128
    sy = ((3.0 * p[7:7 + eth, :] + 10.0 * p[8:8 + eth, :]
           + 3.0 * p[9:9 + eth, :]) * (1.0 / 16.0))
    dr = ((p[9:9 + eth, :] - p[7:7 + eth, :]) * 0.5).astype(jnp.bfloat16)

    def col_band(off_lo, vals):
        jc = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
        ic = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
        b = jnp.zeros((256, 128), jnp.float32)
        for k, v in enumerate(vals):
            b = b + jnp.where(jc == ic + off_lo + k, v, 0.0)
        return b.astype(jnp.bfloat16)

    dmat = col_band(119, (-0.5, 0.0, 0.5))
    smat = col_band(119, (3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0))

    def apply(src, band):
        outs = []
        for c in range(ow // 128):
            outs.append(jax.lax.dot_general(
                src[:, c * 128:c * 128 + 256], band,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]

    if hilo:
        # ix rounds BEFORE the +-0.5 cancellation (sy ~ pixel scale, the
        # diff ~ gradient scale), so single-bf16 costs ~0.25 gray absolute
        # there; a hi/lo split restores ~f32 accuracy at 2x the D MACs.
        # iy's matmul input is already the (small) row diff — single bf16
        # is relatively accurate and stays single.
        hi = sy.astype(jnp.bfloat16)
        lo = (sy - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ix = apply(hi, dmat) + apply(lo, dmat)
    else:
        ix = apply(sy.astype(jnp.bfloat16), dmat)
    iy = apply(dr, smat)
    return ix[:, :etw], iy[:, :etw]


def _warp_start_nostart(next_hbm, ref_fx, ref_fy, y0, x0, scratch, sem,
                        *, pad_y, pad_x, max_disp, local):
    """_warp_start minus the dma.start(): the caller gates the issue (the
    dma_once mode issues/waits only at s==0, reusing a stale window — the
    timing isolates how much of the per-step warp DMA is EXPOSED, i.e. not
    hidden behind the MXU/scharr work between issue and wait)."""
    bound = jnp.float32(max_disp)
    dy0 = jnp.round(jnp.clip(ref_fy, -bound, bound)).astype(jnp.int32)
    dx0 = jnp.round(jnp.clip(ref_fx, -bound, bound)).astype(jnp.int32)
    src_y_raw = y0 + pad_y + dy0 - local
    src_x_raw = x0 + pad_x + dx0 - local
    src_y = pl.multiple_of((src_y_raw // 8) * 8, 8)
    src_x = pl.multiple_of((src_x_raw // 128) * 128, 128)
    sh, sw = scratch.shape
    dma = pltpu.make_async_copy(
        next_hbm.at[pl.ds(src_y, sh), pl.ds(src_x, sw)], scratch, sem
    )
    return dma, src_y_raw, src_x_raw, src_y, src_x


def _warp_finish_optwait(state, fx, fy, y0, x0, scratch, wait_pred,
                         *, h, w, pad_y, pad_x, max_disp, th, tw, local):
    """Library _warp_finish with the dma.wait() gated on ``wait_pred``
    (dma_once mode: the issue was gated the same way)."""
    from lk_tpu.flow.pallas_kernels import _tent_gather

    dma, src_y_raw, src_x_raw, src_y, src_x = state
    bound = jnp.float32(max_disp)
    extra_y = src_y_raw - src_y
    extra_x = src_x_raw - src_x
    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(
        jnp.float32)
    gy = jnp.clip(rows + y0 + jnp.clip(fy, -bound, bound), 0.0, h - 1.0)
    gx = jnp.clip(cols + x0 + jnp.clip(fx, -bound, bound), 0.0, w - 1.0)
    rel_y = jnp.clip(
        gy - (src_y_raw - pad_y).astype(jnp.float32) - rows, 0.0, 2.0 * local
    )
    rel_x = jnp.clip(
        gx - (src_x_raw - pad_x).astype(jnp.float32) - cols, 0.0, 2.0 * local
    )

    @pl.when(wait_pred)
    def _():
        dma.wait()

    win = pltpu.roll(scratch[:].astype(jnp.float32), shift=-extra_x, axis=1)
    vw = tw + 2 * local + 1
    wp = -(-vw // 128) * 128
    win = win[:, :wp]
    for bit in (1, 2, 4):
        r = pltpu.roll(win, shift=win.shape[0] - bit, axis=0)
        win = jnp.where((extra_y & bit) != 0, r, win)

    def widen(a):
        tail = jnp.broadcast_to(a[:, tw - 1:tw], (th, wp - tw))
        return jnp.concatenate([a, tail], axis=1)

    vert = _tent_gather(win, widen(rel_y), axis=0, out_len=th, local=local)
    return _tent_gather(vert, rel_x, axis=1, out_len=tw, local=local)


def _kernel(
    next_hbm, prev_hbm, flowbuf_hbm,
    out_hbm, stats_hbm,
    win_scratch, prev_scratch, flow_scratch, out_tile, stats_tile, sems,
    *, h, w, pad_y, pad_x, max_disp, tile_h, tile_w, local, win_k, bound_f,
    area_f, eig_thr, n_iters, n_ty, n_tx, merge_stats,
    do_warp, do_asums, do_bsums, do_scharr, warp_mode="base",
    boxsum_mode="dense", scharr_mode="base",
):
    k = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = prev_scratch.shape[-1]
    tw_dma_out = out_tile.shape[-1]
    tiles = n_ty * n_tx
    s = (k * n_ty + ti) * n_tx + tj
    slot = jax.lax.rem(s, 2)
    oslot = 1 - slot

    def prev_copy(ti_, tj_, sl):
        return pltpu.make_async_copy(
            prev_hbm.at[
                pl.ds(pl.multiple_of(ti_ * tile_h, 8), tile_h + 32),
                pl.ds(pl.multiple_of(tj_ * tile_w, 128), etw_dma_p),
            ],
            prev_scratch.at[sl], sems.at[sl],
        )

    def flow_copy(buf, kk, ti_, tj_, sl):
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
        @pl.when(kk == 0)
        def _():
            flow_copy(flowbuf_hbm, kk, ti_, tj_, sl).start()

        @pl.when(kk > 0)
        def _():
            flow_copy(out_hbm, kk, ti_, tj_, sl).start()

    def out_copy(kk, ti_, tj_, sl):
        if merge_stats:
            dst, n_pl = 0, 4
        else:
            dst, n_pl = 2 - jax.lax.rem(kk, 2) * 2, 2
        return pltpu.make_async_copy(
            out_tile.at[sl],
            out_hbm.at[
                pl.ds(dst, n_pl),
                pl.ds(pl.multiple_of(ti_ * tile_h + _HALO, 8), tile_h),
                pl.ds(pl.multiple_of(tj_ * tile_w + 128, 128), tw_dma_out),
            ],
            sems.at[5 + sl],
        )

    @pl.when(s == 0)
    def _():
        prev_copy(ti, tj, slot).start()

    first_tile = (ti == 0) & (tj == 0)

    @pl.when(first_tile)
    def _():
        start_flow(k, ti, tj, slot)

    flow_copy(flowbuf_hbm, k, ti, tj, slot).wait()

    c0 = 128 - _HALO
    fx_w = flow_scratch[slot, 0, :, c0:c0 + etw]
    fy_w = flow_scratch[slot, 1, :, c0:c0 + etw]

    y0 = ti * tile_h
    x0 = tj * tile_w
    if warp_mode == "dma_once":
        wstate = _warp_start_nostart(
            next_hbm, fx_w[eth // 2, etw // 2], fy_w[eth // 2, etw // 2],
            y0 - _HALO, x0 - _HALO, win_scratch, sems.at[4],
            pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, local=local,
        )

        @pl.when(s == 0)
        def _():
            wstate[0].start()
    else:
        wstate = _warp_start(
            next_hbm, fx_w[eth // 2, etw // 2], fy_w[eth // 2, etw // 2],
            y0 - _HALO, x0 - _HALO, win_scratch, sems.at[4],
            pad_y=pad_y, pad_x=pad_x, max_disp=max_disp, local=local,
        )

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
        prev_copy(0, 0, oslot).start()

    prev_copy(ti, tj, slot).wait()

    p = prev_scratch[slot]
    if not do_scharr:
        ix_w = p[8:8 + eth, 120:120 + etw] * 0.01
        iy_w = p[8:8 + eth, 120:120 + etw] * 0.02
    elif scharr_mode in ("mxu", "mxu2"):
        ix_w, iy_w = _scharr_mxu(p, eth, etw, hilo=scharr_mode == "mxu2")
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

    if do_asums:
        if boxsum_mode == "blocked":
            a11, a12, a22 = _boxsum_blocked_multi(
                [ix_w * ix_w, ix_w * iy_w, iy_w * iy_w],
                win_k, tile_h, tile_w)
        else:
            a11 = _boxsum_tile_mxu(ix_w * ix_w, win_k, tile_h, tile_w)
            a12 = _boxsum_tile_mxu(ix_w * iy_w, win_k, tile_h, tile_w)
            a22 = _boxsum_tile_mxu(iy_w * iy_w, win_k, tile_h, tile_w)
    else:
        a11 = jnp.full((tile_h, tile_w), 3.0, jnp.float32)
        a12 = jnp.full((tile_h, tile_w), 0.1, jnp.float32)
        a22 = jnp.full((tile_h, tile_w), 2.0, jnp.float32)
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

    if do_warp:
        if warp_mode == "dma_once":
            jw = _warp_finish_optwait(
                wstate, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch,
                s == 0,
                h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
                th=eth, tw=etw, local=local,
            )
        elif warp_mode == "tpose":
            jw = _warp_finish_tpose(
                wstate, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch,
                h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
                th=eth, tw=etw, local=local,
            )
        elif warp_mode in ("tree", "tree_bf16", "chain_bf16"):
            jw = _warp_finish_tree(
                wstate, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch,
                h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
                th=eth, tw=etw, local=local,
                sel_dtype=(jnp.bfloat16 if warp_mode == "tree_bf16"
                           else None),
                chain_bf16=(warp_mode == "chain_bf16"),
            )
        else:
            fin = (_warp_finish if warp_mode == "base"
                   else _warp_finish_rolly)
            jw = fin(
                wstate, fx_w, fy_w, y0 - _HALO, x0 - _HALO, win_scratch,
                h=h, w=w, pad_y=pad_y, pad_x=pad_x, max_disp=max_disp,
                th=eth, tw=etw, local=local,
            )
    else:
        wstate[0].wait()
        jw = prev_w * 1.0001

    r = jw - prev_w - (ix_w * fx_w + iy_w * fy_w)
    if do_bsums:
        if boxsum_mode == "blocked":
            b1, b2 = _boxsum_blocked_multi(
                [ix_w * r, iy_w * r], win_k, tile_h, tile_w)
        else:
            b1 = _boxsum_tile_mxu(ix_w * r, win_k, tile_h, tile_w)
            b2 = _boxsum_tile_mxu(iy_w * r, win_k, tile_h, tile_w)
    else:
        b1 = r[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w] * 2.0
        b2 = r[_HALO:_HALO + tile_h, _HALO:_HALO + tile_w] * 3.0
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
        out_copy(k, ti, tj, slot).wait()

    out_tile[slot, 0] = fx_new
    out_tile[slot, 1] = fy_new
    if merge_stats:
        out_tile[slot, 2] = extend_cols(min_eig)
        out_tile[slot, 3] = extend_cols(validf)
    out_copy(k, ti, tj, slot).start()

    total = n_iters * tiles

    @pl.when(s == total - 1)
    def _():
        out_copy(k, ti, tj, slot).wait()
        if total >= 2:
            out_copy(k, ti, tj, oslot).wait()


def build(next_img, prev_img, **flags):
    h, w = next_img.shape
    tile_h, tile_w, local, win_k = TILE_H, TILE_W, LOCAL, 15
    max_disp, n_iters = MAX_DISP, N_ITERS
    eth = tile_h + 2 * _HALO
    etw = tile_w + 2 * _HALO
    etw_dma = -(-(tile_w + 128 + _HALO) // 128) * 128
    etw_dma_p = -(-(tile_w + 128 + _HALO + 1) // 128) * 128
    sh, sw = _win_shape(eth, etw, local)
    pad_t, pad_b, pad_l, pad_r = _asym_pads(tile_h, tile_w, sh, sw,
                                            max_disp, local)
    next_pad = jnp.pad(next_img.astype(jnp.float32),
                       ((pad_t, pad_b), (pad_l, pad_r)), mode="edge")
    prev_ext = jnp.pad(prev_img.astype(jnp.float32), ((16, 16), (128, 256)),
                       mode="edge")
    gy = _HALO
    hext = h + 2 * gy
    wext = w + 128 + 256
    n_ty = h // tile_h
    n_tx = w // tile_w
    grid = (n_iters, n_ty, n_tx)
    tw_pad = -(-tile_w // 128) * 128
    kernel = functools.partial(
        _kernel, h=h, w=w, pad_y=pad_t, pad_x=pad_l, max_disp=max_disp,
        tile_h=tile_h, tile_w=tile_w, local=local, win_k=win_k,
        bound_f=float(max_disp), area_f=float(win_k * win_k),
        eig_thr=1e-4 * 1024.0, n_iters=n_iters, n_ty=n_ty, n_tx=n_tx,
        merge_stats=True, **flags,
    )
    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((4, hext, wext), jnp.float32),
            jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sh, sw), jnp.float32),
            pltpu.VMEM((2, tile_h + 32, etw_dma_p), jnp.float32),
            pltpu.VMEM((2, 2, eth, etw_dma), jnp.float32),
            pltpu.VMEM((2, 4, tile_h, tw_pad), jnp.float32),
            pltpu.VMEM((2, 1, tile_h, tw_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )

    def pad_flow(x):
        return jnp.pad(x.astype(jnp.float32), ((gy, gy), (128, 256)),
                       mode="edge")

    def run(flow_init):
        fx = pad_flow(flow_init[..., 0])
        fy = pad_flow(flow_init[..., 1])
        out, _ = call(next_pad, prev_ext, jnp.stack([fx, fy]))
        return jnp.moveaxis(out[0:2, gy:gy + h, 128:128 + w], 0, -1)

    return run


def time_variant(name, prev, nxt, flow0, **flags):
    run = build(nxt, prev, **flags)

    def chained(n):
        @jax.jit
        def go(f0):
            def body(i, f):
                return run(f * (1.0 - 1e-12)) * 1e-6 + f * (1 - 1e-6)
            return jnp.sum(jax.lax.fori_loop(0, n, body, f0))
        return go

    r0, r1 = chained(10), chained(40)
    float(r0(flow0)); float(r1(flow0))
    t0s, t1s = [], []
    for _ in range(5):
        t = time.perf_counter(); float(r0(flow0))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(flow0))
        t1s.append(time.perf_counter() - t)
    ms = (min(t1s) - min(t0s)) / 30 * 1e3
    print(f"{name:12s} {ms:7.3f} ms/call  ({ms / 16 * 1e3:6.1f} us/tile)")
    return ms


def main():
    rng = np.random.default_rng(7)
    prev = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((H, W)) * 255).astype(np.float32))
    flow0 = jnp.zeros((H, W, 2), jnp.float32)
    base = dict(do_warp=True, do_asums=True, do_bsums=True, do_scharr=True)
    cases = [
        ("full", {}),
        ("blocked", {"boxsum_mode": "blocked"}),
        ("blk+dma1", {"boxsum_mode": "blocked", "warp_mode": "dma_once"}),
        ("dma_once", {"warp_mode": "dma_once"}),
        ("tree", {"warp_mode": "tree"}),
        ("tree_bf16", {"warp_mode": "tree_bf16"}),
        ("chain_bf16", {"warp_mode": "chain_bf16"}),
        ("blk+treeb", {"boxsum_mode": "blocked", "warp_mode": "tree_bf16"}),
        ("scharr_mxu", {"scharr_mode": "mxu"}),
        ("scharr_mxu2", {"scharr_mode": "mxu2"}),
        ("tpose", {"warp_mode": "tpose"}),
        ("mxu+tpose", {"scharr_mode": "mxu", "warp_mode": "tpose"}),
        ("no_warp", {"do_warp": False}),
        ("no_asums", {"do_asums": False}),
        ("no_bsums", {"do_bsums": False}),
        ("no_box", {"do_asums": False, "do_bsums": False}),
        ("no_scharr", {"do_scharr": False}),
    ]
    # numeric check first: rolly must match base exactly on smooth flow
    if os.environ.get("EXP_CHECK", "1") == "1":
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        f = np.stack([3.0 + 2.5 * np.sin(xx / 300.0) + yy / 700.0,
                      -2.0 + 1.8 * np.cos(yy / 250.0) + xx / 900.0], -1)
        fj = jnp.asarray(f)
        a = build(nxt, prev, **base)(fj)
        b = build(nxt, prev, **{**base, "warp_mode": "rolly"})(fj)
        d = np.abs(np.asarray(a) - np.asarray(b))
        print("rolly max|diff| =", float(d.max()))
        c = build(nxt, prev, **{**base, "boxsum_mode": "blocked"})(fj)
        d = np.abs(np.asarray(a) - np.asarray(c))
        print("blocked max|diff| =", float(d.max()))
        # tree reorders only the SELECT structure (taps are identical
        # f32 values, lerp unchanged) — must be bit-identical to base
        t = build(nxt, prev, **{**base, "warp_mode": "tree"})(fj)
        d = np.abs(np.asarray(a) - np.asarray(t))
        print("tree max|diff| =", float(d.max()))
        assert float(d.max()) == 0.0, "tree warp must be bit-equal to base"
        # bf16 variants trade select width for tap precision: print the
        # flow error they introduce so accuracy cost sits next to timing
        for m in ("tree_bf16", "chain_bf16"):
            v = build(nxt, prev, **{**base, "warp_mode": m})(fj)
            d = np.abs(np.asarray(a) - np.asarray(v))
            print(f"{m} max|diff| = {float(d.max()):.6f} "
                  f"mean|diff| = {float(d.mean()):.6f}")
        for m in ("mxu", "mxu2"):
            v = build(nxt, prev, **{**base, "scharr_mode": m})(fj)
            d = np.abs(np.asarray(a) - np.asarray(v))
            print(f"scharr_{m} max|diff| = {float(d.max()):.6f} "
                  f"mean|diff| = {float(d.mean()):.6f}")
        # tpose moves layout only — must be bit-identical to base
        v = build(nxt, prev, **{**base, "warp_mode": "tpose"})(fj)
        d = np.abs(np.asarray(a) - np.asarray(v))
        print("tpose max|diff| =", float(d.max()))
        assert float(d.max()) == 0.0, "tpose warp must be bit-equal to base"
    only = os.environ.get("EXP_ONLY", "")
    if only:
        keep = {s.strip() for s in only.split(",")}
        cases = [c for c in cases if c[0] in keep]
    for name, over in cases:
        time_variant(name, prev, nxt, flow0, **{**base, **over})


if __name__ == "__main__":
    main()
