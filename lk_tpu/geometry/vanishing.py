"""The vanishing-point state machine as a fixed-shape scanned pytree.

Reproduces the reference's per-frame CP-accumulation / VP-update logic
(reference LK_Final.py:569-647, LK3_classification.py:425-487) including its
quirks (SURVEY.md §2.3):

* the VP can update multiple times per frame — once per accepted cross point,
  each update reading the ring of the last VP_REF_NUM CPs *including* the one
  just appended (LK_Final.py:585-615) — so pair processing is a sequential
  lax.scan over the static upper-triangular pair list;
* robust update: component-wise mean±std*MAX_CP_STD clip over the CP-to-VP
  diffs, then mean-of-kept scaled by VP_UPDATE_RATE (LK_Final.py:594-612);
* init: as soon as VP_REF_NUM CPs accumulate, VP = their mean; LK_Final's
  loop-variable shadowing aliases the new VP with the last appended CP object
  (LK_Final.py:617-624), so that ring entry reads as the *current* VP until
  it leaves the window — reproduced via an alias index when
  cfg.vp_init_aliasing (LK3 names the loop variable differently and has no
  alias, LK3_classification.py:464-471);
* hide/reset after HIDE_VP_THOLD frames without update (LK_Final.py:629-633);
* CSV rows are emitted on every update *and* once per shown frame
  (LK_Final.py:612-614,637-638; LK3 emits only the shown row);
* vanishing lines: x->y and y->x least-squares over the VP history ring
  (scipy.stats.linregress in the reference, LK_Final.py:219-238), recomputed
  every shown frame once the VP has ever moved.

Documented deviation: cross points whose coordinates *compute* to nan (e.g. a
vertical first line dividing by zero) are rejected here; the reference's
``x is nan`` identity test only catches its literal parallel-case sentinel,
so a computed-nan CP accepted while the VP is uninitialized would poison the
init mean with nan and subsequently crash the drawing code (int(nan)).  We
reject all nan CPs instead of reproducing a crash.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.geometry.crosspoints import PAIR_INDICES, cross_point_pairs
from lk_tpu.geometry.flowlines import FlowLineStats


class VPState(NamedTuple):
    vp_xy: jnp.ndarray        # (2,) f32
    vp_init: jnp.ndarray      # () bool
    vp_moved: jnp.ndarray     # () bool
    ring_xy: jnp.ndarray      # (vp_ref_num, 2) recent-CP ring
    ring_total: jnp.ndarray   # () i32 — appends since last clear
    alias_pos: jnp.ndarray    # () i32 — append index aliased to the VP, -1 none
    vp_ult: jnp.ndarray       # () i32 — frames since last VP update
    hist_xy: jnp.ndarray      # (vp_ref, 2) VP-history ring (all_vp)
    hist_total: jnp.ndarray   # () i32


class FrameGeomOut(NamedTuple):
    """Per-frame geometry outputs (fixed shapes; masked)."""
    update_rows: jnp.ndarray   # (P, 2) VP position after each in-frame update
    update_mask: jnp.ndarray   # (P,) bool
    cp_xy: jnp.ndarray         # (P, 2) accepted cross points (viz)
    cp_mask: jnp.ndarray       # (P,) bool
    show_row: jnp.ndarray      # (2,) VP position in the show block
    show_mask: jnp.ndarray     # () bool
    vp_hidden: jnp.ndarray     # () bool — VP was reset this frame


def init_vp_state(cfg: PipelineConfig) -> VPState:
    return VPState(
        vp_xy=jnp.zeros(2, jnp.float32),
        vp_init=jnp.array(False),
        vp_moved=jnp.array(False),
        ring_xy=jnp.zeros((cfg.vp_ref_num, 2), jnp.float32),
        ring_total=jnp.int32(0),
        alias_pos=jnp.int32(-1),
        vp_ult=jnp.int32(0),
        hist_xy=jnp.zeros((cfg.vp_ref, 2), jnp.float32),
        hist_total=jnp.int32(0),
    )


def _ring_slots(total: jnp.ndarray, capacity: int):
    """Per-slot absolute append index (largest a < total with a%cap == k)."""
    k = jnp.arange(capacity, dtype=jnp.int32)
    abs_idx = total - 1 - jnp.mod(total - 1 - k, capacity)
    valid = (abs_idx >= 0) & (total > 0)
    return abs_idx, valid


def process_frame_pairs(
    state: VPState,
    lines: FlowLineStats,
    accepted: jnp.ndarray,
    cfg: PipelineConfig,
    frame_size: Tuple[int, int],
) -> Tuple[VPState, FrameGeomOut]:
    """Run the cross-point / VP-update pass for one frame's accepted lines."""
    width, height = frame_size
    n = lines.start.shape[0]
    ii, jj = PAIR_INDICES(n)
    p = len(ii)
    r_cap = cfg.vp_ref_num

    cps = cross_point_pairs(lines.start, lines.stop)        # (P, 2)
    ang_d = jnp.abs(lines.angle[ii] - lines.angle[jj])
    pair_ok = (
        accepted[ii] & accepted[jj]
        & (ang_d >= cfg.min_ang_dif) & (ang_d <= 360.0 - cfg.min_ang_dif)
    )
    if cfg.cp_min_start_sep_frac > 0:
        sep = jnp.abs(lines.start[ii, 0] - lines.start[jj, 0])
        pair_ok = pair_ok & (sep >= width * cfg.cp_min_start_sep_frac)
    not_nan = ~(jnp.isnan(cps[:, 0]) | jnp.isnan(cps[:, 1]))
    above = (cps[:, 1] <= lines.start[ii, 1]) & (cps[:, 1] <= lines.start[jj, 1])
    cand = pair_ok & not_nan & above

    bound = jnp.array(
        [width * cfg.cp_thold, height * cfg.cp_thold], jnp.float32
    )
    rate = jnp.float32(cfg.vp_update_rate)
    s_clip = jnp.float32(cfg.max_cp_std)

    # Compact the statically-rejectable pairs away so the sequential part
    # (the only data-dependent stage) walks just the candidates — typically a
    # fraction of the P=190 pairs.  Stable order preserves the reference's
    # combinations sequence among survivors.
    order = jnp.argsort(~cand, stable=True)
    cps_c = cps[order]
    cand_c = cand[order]
    n_cand = jnp.sum(cand)

    def body(st: VPState, inp):
        cp, ok = inp
        close = jnp.all(jnp.abs(st.vp_xy - cp) < bound)
        accept = ok & (~st.vp_init | close)

        # ring push
        slot = jnp.mod(st.ring_total, r_cap)
        ring_xy = jnp.where(
            accept, st.ring_xy.at[slot].set(cp), st.ring_xy
        )
        ring_total = st.ring_total + jnp.where(accept, 1, 0)

        # --- update branch (VP initialized) ------------------------------
        abs_idx, slot_valid = _ring_slots(ring_total, r_cap)
        vals = jnp.where(
            (abs_idx == st.alias_pos)[:, None] & (st.alias_pos >= 0),
            st.vp_xy[None, :],
            ring_xy,
        )
        m = jnp.maximum(jnp.sum(slot_valid), 1).astype(jnp.float32)
        difs = vals - st.vp_xy[None, :]
        w_mask = slot_valid[:, None].astype(jnp.float32)
        mean = jnp.sum(difs * w_mask, axis=0) / m
        var = jnp.sum((difs - mean) ** 2 * w_mask, axis=0) / m
        std = jnp.sqrt(var)
        keep = (
            slot_valid
            & jnp.all(difs <= mean + std * s_clip, axis=1)
            & jnp.all(difs >= mean - std * s_clip, axis=1)
        )
        c = jnp.sum(keep)
        move = jnp.sum(difs * keep[:, None], axis=0) / jnp.maximum(c, 1)
        do_update = accept & st.vp_init & (c != 0)
        new_vp_upd = st.vp_xy + move * rate

        # --- init branch ---------------------------------------------------
        do_init = accept & ~st.vp_init & (ring_total >= r_cap)
        init_vp = jnp.sum(ring_xy, axis=0) / jnp.float32(r_cap)

        vp_xy = jnp.where(
            do_update, new_vp_upd, jnp.where(do_init, init_vp, st.vp_xy)
        )
        vp_init = st.vp_init | do_init
        vp_moved = st.vp_moved | do_update
        vp_ult = jnp.where(do_update | do_init, 0, st.vp_ult)
        alias_pos = jnp.where(
            do_init,
            jnp.int32(ring_total - 1) if cfg.vp_init_aliasing else jnp.int32(-1),
            st.alias_pos,
        )

        # history push on update (deepcopy append, LK_Final.py:613-614)
        hist_slot = jnp.mod(st.hist_total, cfg.vp_ref)
        hist_xy = jnp.where(
            do_update, st.hist_xy.at[hist_slot].set(vp_xy), st.hist_xy
        )
        hist_total = st.hist_total + jnp.where(do_update, 1, 0)

        new_st = VPState(
            vp_xy=vp_xy, vp_init=vp_init, vp_moved=vp_moved,
            ring_xy=ring_xy, ring_total=ring_total, alias_pos=alias_pos,
            vp_ult=vp_ult, hist_xy=hist_xy, hist_total=hist_total,
        )
        out = (vp_xy, do_update, cp, accept)
        return new_st, out

    def while_body(carry):
        i, st, rows, row_mask, cp_out, cp_mask = carry
        st, (vp_xy, did, cp, acc) = body(st, (cps_c[i], cand_c[i]))
        rows = rows.at[i].set(vp_xy)
        row_mask = row_mask.at[i].set(did)
        cp_out = cp_out.at[i].set(cp)
        cp_mask = cp_mask.at[i].set(acc)
        return i + 1, st, rows, row_mask, cp_out, cp_mask

    init = (
        jnp.int32(0), state,
        jnp.zeros((p, 2), jnp.float32), jnp.zeros((p,), jnp.bool_),
        jnp.zeros((p, 2), jnp.float32), jnp.zeros((p,), jnp.bool_),
    )
    _, state2, rows, row_mask, cp_out, cp_mask = jax.lax.while_loop(
        lambda c: c[0] < n_cand, while_body, init
    )
    out = FrameGeomOut(
        update_rows=rows, update_mask=row_mask,
        cp_xy=cp_out, cp_mask=cp_mask,
        show_row=jnp.zeros(2, jnp.float32), show_mask=jnp.array(False),
        vp_hidden=jnp.array(False),
    )
    return state2, out


def vp_show_step(
    state: VPState, out: FrameGeomOut, cfg: PipelineConfig
) -> Tuple[VPState, FrameGeomOut]:
    """The per-frame show/hide block (reference LK_Final.py:627-649).

    Must run after process_frame_pairs; increments vp_ult (LK_Final.py:705).
    """
    hide = state.vp_init & (state.vp_ult > cfg.hide_vp_thold)
    show = state.vp_init & ~hide

    # hide: fresh un-init VP + cleared recent ring (history persists)
    vp_init = state.vp_init & ~hide
    vp_moved = state.vp_moved & ~hide
    ring_total = jnp.where(hide, 0, state.ring_total)
    alias_pos = jnp.where(hide, -1, state.alias_pos)

    # show: append VP row + history push
    hist_slot = jnp.mod(state.hist_total, cfg.vp_ref)
    hist_xy = jnp.where(
        show, state.hist_xy.at[hist_slot].set(state.vp_xy), state.hist_xy
    )
    hist_total = state.hist_total + jnp.where(show, 1, 0)

    new_state = VPState(
        vp_xy=jnp.where(hide, 0.0, state.vp_xy),
        vp_init=vp_init,
        vp_moved=vp_moved,
        ring_xy=state.ring_xy,
        ring_total=ring_total,
        alias_pos=alias_pos,
        vp_ult=state.vp_ult + 1,
        hist_xy=hist_xy,
        hist_total=hist_total,
    )
    new_out = out._replace(
        show_row=state.vp_xy, show_mask=show, vp_hidden=hide
    )
    return new_state, new_out


def vanishing_lines(
    state: VPState, cfg: PipelineConfig, frame_size: Tuple[int, int]
):
    """VL endpoint pairs through the current VP (reference LK_Final.py:219-238).

    Returns ((lp, rp, up, dp), ok): lp/rp from the x->y regression extended to
    the left/right frame borders through the VP; up/dp from the y->x
    regression to the top/bottom borders.  ok mirrors the reference's
    ``best_point`` mode (st is effectively always True once initialized; we
    report finite-slope validity instead).
    """
    width, height = frame_size
    abs_idx, valid = _ring_slots(state.hist_total, cfg.vp_ref)
    w = valid[:, None].astype(jnp.float32)
    m_count = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
    xs = state.hist_xy[:, 0]
    ys = state.hist_xy[:, 1]
    wx = w[:, 0]
    mx = jnp.sum(xs * wx) / m_count
    my = jnp.sum(ys * wx) / m_count
    cov = jnp.sum((xs - mx) * (ys - my) * wx)
    varx = jnp.sum((xs - mx) ** 2 * wx)
    vary = jnp.sum((ys - my) ** 2 * wx)
    slope = cov / varx           # x -> y
    slope_v = cov / vary         # y -> x
    bx, by = state.vp_xy[0], state.vp_xy[1]
    lp = jnp.stack([jnp.float32(0), by - bx * slope])
    rp = jnp.stack([jnp.float32(width - 1), by + (width - 1 - bx) * slope])
    up = jnp.stack([bx - by * slope_v, jnp.float32(0)])
    dp = jnp.stack([bx + (height - 1 - by) * slope_v, jnp.float32(height - 1)])
    ok = state.vp_moved & jnp.isfinite(slope) & jnp.isfinite(slope_v)
    return (lp, rp, up, dp), ok
