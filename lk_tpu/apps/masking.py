"""lk.masking — donut-ROI tracker demo (mirrors reference LK1_masking.py).

Tracks up to 100 points inside a rectangular ring ROI at width 960, replaces
the pool when fewer than 25 survive, and renders the accumulated tracks.

Usage: python -m lk_tpu.apps.masking <video> [--synthetic]
Outputs: tracks overlay video (--write-video) and/or final tracks PNG
(--tracks-png, default ./masking_tracks.png).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lk_tpu.apps._common import build_parser, open_frames
from lk_tpu.config import FeatureConfig
from lk_tpu.models import MASKING
from lk_tpu.ops.blur import gaussian_blur3
from lk_tpu.ops.color import bgr_to_gray
from lk_tpu.ops.resize import resize_area
from lk_tpu.pipeline.tracker import donut_mask, make_tracker
from lk_tpu.utils import enable_compilation_cache


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--tracks-png", default="./masking_tracks.png")
    args = parser.parse_args(argv)
    enable_compilation_cache()

    preset = MASKING
    stream = open_frames(args)
    w = preset["width"]
    h = int(stream.height * w / stream.width)
    mask = donut_mask(h, w, preset["outer"], preset["inner"])
    run_chunk, init = make_tracker(
        mask,
        lk=preset["lk"],
        features=FeatureConfig(max_corners=preset["n_points"]),
        replenish_below=preset["replenish_below"],
        policy="replace",
    )
    run_jit = jax.jit(run_chunk)

    @jax.jit
    def pre(f):
        return gaussian_blur3(resize_area(bgr_to_gray(f.astype(jnp.float32)),
                                          h, w))

    state = None
    segs = []
    buf = []
    n = 0
    for f in stream:
        if args.frames is not None and n >= args.frames:
            break
        buf.append(f)
        n += 1
        if len(buf) >= args.chunk + (1 if state is None else 0):
            state, segs_out = _feed(run_jit, init, pre, state, buf)
            segs.extend(segs_out)
            buf.clear()
    if buf:
        state, segs_out = _feed(run_jit, init, pre, state, buf)
        segs.extend(segs_out)

    if not args.quiet:
        print(f"frames: {n}  segments: {len(segs)}")
    _render_tracks(segs, h, w, args.tracks_png)
    if not args.quiet:
        print(f"tracks: {args.tracks_png}")
    return segs


def _feed(run_jit, init, pre, state, buf):
    grays = jax.vmap(pre)(jnp.asarray(np.stack(buf)))
    if state is None:
        state = init(grays[0])
        grays = grays[1:]
        if grays.shape[0] == 0:
            return state, []
    state, outs = run_jit(state, grays)
    old = np.asarray(outs.old_pts)
    new = np.asarray(outs.new_pts)
    m = np.asarray(outs.seg_mask)
    segs = []
    for k in range(old.shape[0]):
        for a, b in zip(old[k][m[k]], new[k][m[k]]):
            segs.append((tuple(a), tuple(b)))
    return state, segs


def _render_tracks(segs, h, w, path):
    import cv2 as cv

    img = np.zeros((h, w, 3), np.uint8)
    rng = np.random.default_rng(0)
    for (a, b) in segs:
        color = tuple(int(c) for c in rng.integers(64, 255, 3))
        cv.line(img, (int(a[0]), int(a[1])), (int(b[0]), int(b[1])), color, 1)
    cv.imwrite(path, img)


if __name__ == "__main__":
    main()
