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
    @jax.jit
    def pre(f):
        return gaussian_blur3(resize_area(bgr_to_gray(f.astype(jnp.float32)),
                                          h, w))

    segs = []

    def on_outputs(outs):
        old = np.asarray(outs.old_pts)
        new_ = np.asarray(outs.new_pts)
        m = np.asarray(outs.seg_mask)
        for k in range(old.shape[0]):
            for a, b in zip(old[k][m[k]], new_[k][m[k]]):
                segs.append((tuple(a), tuple(b)))

    from lk_tpu.pipeline.tracker import run_tracker_frames

    n = run_tracker_frames(run_chunk, init, lambda fb: jax.vmap(pre)(fb),
                           stream, args.chunk, max_frames=args.frames,
                           on_outputs=on_outputs)

    if not args.quiet:
        print(f"frames: {n}  segments: {len(segs)}")
    _render_tracks(segs, h, w, args.tracks_png)
    if not args.quiet:
        print(f"tracks: {args.tracks_png}")
    return segs


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
