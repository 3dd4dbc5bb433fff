"""lk.roadlines — road-line flow analytics (mirrors reference
LK2_road_line_detection.py).

Tracks 30 points inside the road trapezoid at width 960 with append-style
replenishment, accumulates per-segment length/angle stats, and emits the
post-run analytics plots (length-vs-index scatter and 100-bin histogram —
the reference's distribution.png / frequency.png, LK2:274-294).

Usage: python -m lk_tpu.apps.roadlines <video> [--synthetic]
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lk_tpu.apps._common import build_parser, open_frames
from lk_tpu.config import FeatureConfig
from lk_tpu.geometry.flowlines import flow_line_stats
from lk_tpu.models import ROADLINES
from lk_tpu.ops.blur import gaussian_blur3
from lk_tpu.ops.color import bgr_to_gray
from lk_tpu.ops.rasterize import fill_convex_poly
from lk_tpu.ops.resize import resize_area
from lk_tpu.pipeline.tracker import make_tracker
from lk_tpu.utils import enable_compilation_cache


def main(argv=None):
    parser = build_parser(__doc__)
    parser.add_argument("--dist-png", default="./distribution.png")
    parser.add_argument("--freq-png", default="./frequency.png")
    parser.add_argument("--hough-png", default="./hough.png")
    parser.add_argument("--hough-k", type=int, default=4,
                        help="dominant road lines to extract")
    args = parser.parse_args(argv)
    enable_compilation_cache()

    preset = ROADLINES
    stream = open_frames(args)
    w = preset["width"]
    h = int(stream.height * w / stream.width)
    quad = np.array(
        [[int(fx * w), int(fy * h)] for fx, fy in preset["trapezoid"]],
        np.int32,
    )
    mask = fill_convex_poly(h, w, quad)
    n_points = preset["n_points"]
    run_chunk, init = make_tracker(
        mask,
        lk=preset["lk"],
        features=FeatureConfig(max_corners=n_points),
        replenish_below=int(n_points * preset["replenish_below_frac"]),
        policy="append",
    )
    @jax.jit
    def pre(f):
        return gaussian_blur3(resize_area(bgr_to_gray(f.astype(jnp.float32)),
                                          h, w))

    lengths, angles = [], []
    seg_old, seg_new = [], []

    def on_outputs(outs):
        old = np.asarray(outs.old_pts)
        new_ = np.asarray(outs.new_pts)
        m = np.asarray(outs.seg_mask)
        for k in range(old.shape[0]):
            if not m[k].any():
                continue
            st = flow_line_stats(jnp.asarray(old[k]), jnp.asarray(new_[k]))
            # LK2 records every surviving track's segment, including
            # zero-length ones (LK2_road_line_detection.py:214-216).
            lengths.extend(np.asarray(st.length)[m[k]].tolist())
            angles.extend(np.asarray(st.angle)[m[k]].tolist())
            seg_old.append(old[k][m[k]])
            seg_new.append(new_[k][m[k]])

    from lk_tpu.pipeline.tracker import run_tracker_frames

    n = run_tracker_frames(run_chunk, init, lambda fb: jax.vmap(pre)(fb),
                           stream, args.chunk, max_frames=args.frames,
                           on_outputs=on_outputs)

    if not args.quiet:
        print(f"frames: {n}  segments: {len(lengths)}")
    _plots(lengths, args.dist_png, args.freq_png)

    # Hough-style voting over every recorded segment (moving ones vote;
    # zero-length segments have no line) — the dominant road-line
    # parameters for the run, lk_tpu.geometry.hough.
    hough = None
    if seg_old:
        from lk_tpu.geometry.hough import hough_road_lines

        old_all = np.concatenate(seg_old, axis=0).astype(np.float32)
        new_all = np.concatenate(seg_new, axis=0).astype(np.float32)
        moving = (old_all != new_all).any(axis=1)
        hough = hough_road_lines(
            jnp.asarray(old_all), jnp.asarray(new_all), jnp.asarray(moving),
            (w, h), k=args.hough_k)
        _hough_plot(hough, (w, h), args.hough_png)
        if not args.quiet:
            for t, r, v in zip(np.asarray(hough.theta),
                               np.asarray(hough.rho),
                               np.asarray(hough.votes)):
                if v > 0:
                    print(f"road line: theta={np.degrees(t):6.1f}deg "
                          f"rho={r:8.1f}px votes={v:.0f}")
    if not args.quiet:
        print(f"plots: {args.dist_png} {args.freq_png} {args.hough_png}")
    return lengths, angles, hough


def _plots(lengths, dist_png, freq_png):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 8), dpi=80)
    plt.title("Flow length distribution")
    plt.xlabel("segment index (time order)")
    plt.ylabel("length (px)")
    plt.scatter(np.arange(len(lengths)), lengths, 4)
    plt.savefig(dist_png)
    plt.close()

    plt.figure(figsize=(12, 8), dpi=80)
    plt.title("Flow length frequency")
    plt.xlabel("length (px)")
    plt.ylabel("count")
    plt.hist(lengths, bins=100)
    plt.savefig(freq_png)
    plt.close()


def _hough_plot(hough, image_size, png):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    w, h = image_size
    acc = np.asarray(hough.accumulator)
    rho_max = float(np.hypot(w, h))
    plt.figure(figsize=(12, 8), dpi=80)
    plt.title("Hough road-line votes (length-weighted)")
    plt.xlabel("rho (px)")
    plt.ylabel("theta (deg)")
    plt.imshow(acc, aspect="auto", origin="lower",
               extent=[-rho_max, rho_max, 0, 180], cmap="magma")
    plt.colorbar(label="votes")
    for t, r, v in zip(np.asarray(hough.theta), np.asarray(hough.rho),
                       np.asarray(hough.votes)):
        if v > 0:
            plt.plot(r, np.degrees(t), "c+", markersize=14)
    plt.savefig(png)
    plt.close()


if __name__ == "__main__":
    main()
