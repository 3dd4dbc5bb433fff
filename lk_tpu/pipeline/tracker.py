"""Simple masked point tracker — the LK1/LK2 pipelines' core.

A reduced pipeline (no VP machine): track fixed-capacity point slots across
frames inside an ROI mask, replenish when the live count drops below a
threshold (replace like LK1_masking.py:152-153 or append-keep-newest like
LK2_road_line_detection.py:245-260), and emit per-frame segments.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lk_tpu.config import FeatureConfig, LKConfig
from lk_tpu.features.shi_tomasi import (
    good_features_from_response,
    min_eig_response,
)
from lk_tpu.flow.sparse import track_points
from lk_tpu.pipeline.step import check_inside, compact_slots


class TrackerState(NamedTuple):
    prev_gray: jnp.ndarray
    pts: jnp.ndarray     # (N, 2)
    valid: jnp.ndarray   # (N,)


class TrackerOutputs(NamedTuple):
    old_pts: jnp.ndarray   # (N, 2) segment starts
    new_pts: jnp.ndarray   # (N, 2) segment ends
    seg_mask: jnp.ndarray  # (N,) tracked this frame
    live: jnp.ndarray      # () i32 live after replenish


def make_tracker(
    mask: jnp.ndarray,
    lk: LKConfig = LKConfig(),
    features: FeatureConfig = FeatureConfig(max_corners=100),
    replenish_below: int = 25,
    policy: str = "replace",   # "replace" (LK1) | "append" (LK2)
):
    """Returns (step, init) over TrackerState for a static ROI mask."""
    n = features.max_corners

    def detect(gray):
        resp = min_eig_response(gray, features.block_size)
        return good_features_from_response(resp, mask, features)

    def init(first_gray) -> TrackerState:
        pts, valid = detect(first_gray.astype(jnp.float32))
        return TrackerState(
            prev_gray=first_gray.astype(jnp.float32), pts=pts, valid=valid
        )

    def step(state: TrackerState, gray: jnp.ndarray):
        gray = gray.astype(jnp.float32)
        p1, st, _ = track_points(state.prev_gray, gray, state.pts,
                                 state.valid, lk)
        st = check_inside(p1, mask, st)
        live = jnp.sum(st)
        det_pts, det_valid = detect(gray)
        trigger = live < replenish_below
        if policy == "replace":
            pts_next = jnp.where(trigger, det_pts, jnp.where(st[:, None], p1, 0.0))
            valid_next = jnp.where(trigger, det_valid, st)
        elif policy == "append":
            cp_, cv_ = compact_slots(jnp.where(st[:, None], p1, 0.0), st)
            both_p = jnp.concatenate([cp_, det_pts], axis=0)
            both_v = jnp.concatenate([cv_, det_valid], axis=0)
            n_tot = jnp.sum(both_v)
            rank = jnp.cumsum(both_v)
            keep = both_v & (rank > jnp.maximum(n_tot - n, 0))
            ap, av = compact_slots(jnp.where(keep[:, None], both_p, 0.0), keep)
            pts_next = jnp.where(trigger, ap[:n], jnp.where(st[:, None], p1, 0.0))
            valid_next = jnp.where(trigger, av[:n], st)
        else:
            raise ValueError(policy)
        new_state = TrackerState(prev_gray=gray, pts=pts_next, valid=valid_next)
        out = TrackerOutputs(
            old_pts=state.pts, new_pts=p1, seg_mask=st & state.valid,
            live=jnp.sum(valid_next),
        )
        return new_state, out

    def run_chunk(state, frames):
        return jax.lax.scan(step, state, frames)

    return run_chunk, init


def run_tracker_frames(run_chunk, init, preprocess, frames, chunk: int,
                       max_frames=None, on_outputs=None) -> int:
    """Host loop: feed raw frames through a tracker in chunks.

    preprocess: raw frame batch (T, Hs, Ws[, C]) -> processed (T, H, W).
    on_outputs(outs): called with each chunk's stacked TrackerOutputs.
    Returns the number of frames consumed.  Shared by the LK1/LK2 apps
    (previously two diverging copies of the same init-frame bookkeeping).
    """
    import numpy as np

    run_jit = jax.jit(run_chunk)
    state = None
    buf = []
    n = 0

    def flush():
        nonlocal state
        grays = preprocess(jnp.asarray(np.stack(buf)))
        if state is None:
            state = init(grays[0])
            grays = grays[1:]
            if grays.shape[0] == 0:
                return
        state, outs = run_jit(state, grays)
        if on_outputs is not None:
            on_outputs(outs)

    for f in frames:
        if max_frames is not None and n >= max_frames:
            break
        buf.append(f)
        n += 1
        if len(buf) >= chunk + (1 if state is None else 0):
            flush()
            buf.clear()
    if buf:
        flush()
    return n


def donut_mask(h: int, w: int, outer: Tuple[float, float, float, float],
               inner: Tuple[float, float, float, float]) -> jnp.ndarray:
    """Rectangular ring ROI (LK1's hand-rolled donut crop, LK1:45-54,75-82)."""
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    ol, ou, orr, od = (outer[0] * w, outer[1] * h, outer[2] * w, outer[3] * h)
    il, iu, ir, idn = (inner[0] * w, inner[1] * h, inner[2] * w, inner[3] * h)
    in_outer = (xs >= ol) & (xs < orr) & (ys >= ou) & (ys < od)
    in_inner = (xs >= il) & (xs < ir) & (ys >= iu) & (ys < idn)
    return (in_outer & ~in_inner).astype(jnp.float32)
