"""lk.serve — multi-stream VP-pipeline serving demo.

Runs N concurrent dashcam streams through one shared compiled pipeline step
(every stream has the same frame geometry, so all VideoPipeline instances hit
the same executable) and reports aggregate throughput.  This is the
single-chip serving model; across chips, streams shard over the ``data`` mesh
axis with zero collectives (lk_tpu.parallel.streams).

Usage: python -m lk_tpu.apps.serve --streams 16 --frames 64
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import VideoPipeline
from lk_tpu.utils import enable_compilation_cache


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--streams", type=int, default=16)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)
    enable_compilation_cache()

    cfg = PipelineConfig()
    scenes = [
        SyntheticRoadStream(width=args.width, height=args.height,
                            n_frames=args.frames, seed=s,
                            vp=(args.width * (0.45 + 0.01 * (s % 5)),
                                args.height * 0.45))
        for s in range(args.streams)
    ]
    pipes = [
        VideoPipeline(cfg, src_size=(args.width, args.height),
                      chunk=args.chunk, host_preprocess=True)
        for _ in range(args.streams)
    ]

    # pre-generate frames so host synthesis doesn't pollute the measurement
    frames = [np.stack([sc.frame(t) for t in range(args.frames)])
              for sc in scenes]

    # warm/compile outside the timed window with a throwaway pipeline over a
    # FULL stream: run() feeds chunk+1, chunk, ..., trailing-partial shapes,
    # and each distinct chunk length is its own executable — a partial warm-up
    # would leave the trailing shape to compile inside the timed window.
    warm = VideoPipeline(cfg, src_size=(args.width, args.height),
                         chunk=args.chunk, host_preprocess=True)
    warm.run(iter(frames[0]))

    t0 = time.time()
    for s in range(args.streams):
        pipes[s].run(iter(frames[s]))   # run() owns the +1 init bookkeeping
    total = sum(p_.frames_done for p_ in pipes)
    dt = time.time() - t0

    ok = sum(1 for p_ in pipes if len(p_.csv_rows) > 0)
    if not args.quiet:
        print(f"streams: {args.streams}  frames: {total}  wall: {dt:.1f}s")
        print(f"aggregate: {total / dt:.1f} frames/s/chip "
              f"({total / dt / 30:.1f} x 30fps streams)")
        print(f"streams with VP output: {ok}/{args.streams}")
    return total / dt


if __name__ == "__main__":
    main()
