"""lk.serve — multi-stream VP-pipeline serving benchmark.

Runs N concurrent dashcam streams batched through ONE on-device pipeline
step (pipeline.runner.MultiStreamPipeline): the full VP pipeline — tracker,
flow-line geometry, cross points, VP state machine — executes for all
streams inside the same vmapped ``lax.scan``.  This is the single-chip
serving model; across chips, stream batches shard over the ``data`` mesh
axis with zero collectives (lk_tpu.parallel.streams).

The timed window measures the pipeline with frames pre-staged as processed
grayscale on the device (decode/ingest engineered separately in lk_tpu.io;
its throughput is a host property, not a chip property).  Output drains
(device->host fetch + CSV bookkeeping) are inside the timed window.

Usage: python -m lk_tpu.apps.serve --streams 32 --frames 64
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import MultiStreamPipeline
from lk_tpu.utils import enable_compilation_cache


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--streams", type=int, default=32)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--chunk", type=int, default=16)
    p.add_argument("--drain-every", type=int, default=16,
                   help="chunks buffered on device before one host readback")
    p.add_argument("--async-drains", action="store_true",
                   help="readback + bookkeeping on a worker thread "
                        "(measured neutral under the axon tunnel — the "
                        "device_get sync dominates — but frees the feed "
                        "thread on hosts where bookkeeping CPU matters)")
    p.add_argument("--live-ingest", action="store_true",
                   help="decode per stream on producer threads during the "
                        "timed window (io.prefetch.MultiStreamPrefetcher) "
                        "instead of pre-staging clips in HBM — true "
                        "end-to-end serving incl. decode overlap.  NOTE: "
                        "under the axon tunnel (~36 MB/s host->device) this "
                        "measures the tunnel, not the chip; on a real TPU "
                        "host (PCIe) it is the production serving mode")
    p.add_argument("--device-preprocess", action="store_true",
                   help="stage u8 grays at SOURCE resolution and run the "
                        "reference's fixed-width INTER_AREA resize "
                        "(LK_Final.py:429,517) ON DEVICE inside the timed "
                        "window — BASELINE config #5's stated geometry "
                        "(e.g. --width 1920 --height 1080).  Watch HBM: "
                        "staging is F*B*H*W bytes")
    p.add_argument("--stage-window", type=int, default=0,
                   help="frames per staged device window (0 = stage the "
                        "whole run).  1080p-source staging at B=64 x 192 "
                        "frames is 25.5 GB — beyond HBM — so config-#5 "
                        "measurement re-stages in windows: upload UNTIMED "
                        "between timed windows (production overlaps PCIe "
                        "uploads with compute; the axon tunnel here is "
                        "~36 MB/s and would measure the tunnel), each "
                        "timed window ends with its drain (the sync point)")
    p.add_argument("--preset", default="final",
                   choices=("final", "vp_detect", "classify"),
                   help="pipeline preset (models.PRESETS); 'classify' is "
                        "the LK3 motion-classification configuration "
                        "BASELINE config #5 names")
    p.add_argument("--out-cap", type=int, default=48,
                   help="per-frame average budget for the device-side "
                        "output-row compaction (PipelineConfig.out_cap); "
                        "0 transports the full 190-slot padding")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)
    enable_compilation_cache()

    import dataclasses

    import jax

    # out_cap: compact the update/CP row transport on device (exact, counts
    # checked on drain) — the fixed 190-slot padding dominated the host
    # readback, 58% of the B=64 serving wall (BENCH_NOTES.md).  48/frame
    # avg per 16-frame chunk = 768-row budget vs measured p99 ~100 peaks
    # on single frames, mean ~14.
    from lk_tpu.models import PRESETS

    cfg = dataclasses.replace(PRESETS[args.preset], out_cap=args.out_cap)
    if jax.default_backend() != "cpu":
        # Pallas window gather for the batched tracker (TPU-only Mosaic
        # kernel; the vmapped dynamic_slice path stays for CPU/tests) +
        # fast-MXU coarse pyramid (parity < 0.1 px, tested) + fused
        # single-pass finish (u8->f32 [+tone] + blur in one VMEM stream)
        cfg = dataclasses.replace(
            cfg, pallas_finish=True,
            lk=dataclasses.replace(cfg.lk, pallas_windows=True,
                                    fast_pyramid=True)
        )
    scenes = [
        SyntheticRoadStream(width=args.width, height=args.height,
                            n_frames=args.frames, seed=s,
                            vp=(args.width * (0.45 + 0.01 * (s % 5)),
                                args.height * 0.45))
        for s in range(args.streams)
    ]

    server = MultiStreamPipeline(cfg, src_size=(args.width, args.height),
                                 n_streams=args.streams, chunk=args.chunk)
    server.drain_every = args.drain_every
    if args.async_drains:
        server.start_async_drains()
    # Warm/compile untimed: one full pass through a throwaway server with
    # every chunk shape feed() will see (chunk+1 leading, trailing partial).
    warm = MultiStreamPipeline(cfg, src_size=(args.width, args.height),
                               n_streams=args.streams, chunk=args.chunk)
    warm.drain_every = args.drain_every

    if args.live_ingest:
        # decode + upload + pipeline all overlap; warm with the same path
        _feed_live(warm, scenes, args)
        warm.drain()
        t0 = time.time()
        decode_busy = _feed_live(server, scenes, args)
        server.drain()
        dt = time.time() - t0
    else:
        # Pre-stage grays on device as u8 (untimed): decode+resize is the
        # io subsystem's job and measured by --live-ingest.  Staged f32
        # OOMs HBM at B>=64 (B*T*H*W*4); u8 staging is 4x smaller, and the
        # finishing blur (device work any real server performs) runs per
        # chunk inside the timed window.  TIME-MAJOR (F, B, h, w) layout:
        # each chunk slice is contiguous and feed_staged fuses
        # slice+finish+scan into one dispatch (scripts/exp_feed_split.py).
        import cv2 as cv

        if args.device_preprocess:
            # SOURCE-resolution staging: gray conversion on host (decode's
            # job), the 1080p->processing-size INTER_AREA resize runs on
            # device inside the timed feed (feed_staged src_hw path)
            h, w = args.height, args.width
            u8 = np.empty((args.frames, args.streams, h, w), np.uint8)
            for b in range(args.streams):
                for t in range(args.frames):
                    u8[t, b] = cv.cvtColor(scenes[b].frame(t),
                                           cv.COLOR_BGR2GRAY)
        else:
            h, w = server.height, server.width
            u8 = np.empty((args.frames, args.streams, h, w), np.uint8)
            for b in range(args.streams):
                for t in range(args.frames):
                    g = cv.cvtColor(scenes[b].frame(t), cv.COLOR_BGR2GRAY)
                    u8[t, b] = cv.resize(g, (w, h),
                                         interpolation=cv.INTER_AREA)
        decode_busy = None
        if args.stage_window:
            # windowed re-staging: see --stage-window help.  Drain cadence
            # becomes the window (each timed segment must end at a real
            # sync, and drain() is the only true sync under the tunnel).
            _feed_windowed(warm, u8, args)
            dt = _feed_windowed(server, u8, args)
        else:
            grays = jnp.asarray(u8)
            grays.block_until_ready()

            _feed_all(warm, grays, args)
            warm.drain()

            t0 = time.time()
            _feed_all(server, grays, args)
            server.drain()          # device_get inside: synchronizes
            dt = time.time() - t0

    total = server.frames_done
    ok = sum(1 for p_ in server.pipes if len(p_.csv_rows) > 0)
    agg = total / dt
    if not args.quiet:
        print(f"streams: {args.streams}  frames: {total}  wall: {dt:.2f}s")
        src = (f" from {args.width}x{args.height} source, on-device "
               f"preprocess" if args.device_preprocess else "")
        print(f"aggregate: {agg:.1f} frames/s/chip "
              f"({agg / 30:.1f} x 30fps streams/chip at "
              f"{server.width}x{server.height}{src})")
        if decode_busy is not None:
            print(f"decode busy (all threads): {decode_busy:.2f}s "
                  f"across {args.streams} workers — overlap "
                  f"{decode_busy / max(dt, 1e-9):.1f}x wall")
        print(f"streams with VP output: {ok}/{args.streams}")
    return agg


def _feed_live(server: MultiStreamPipeline, scenes, args) -> float:
    """Feed via per-stream decode threads + batched device staging; returns
    total decode-thread busy seconds (the overlap evidence)."""
    import cv2 as cv

    from lk_tpu.io.prefetch import MultiStreamPrefetcher

    h, w = server.height, server.width
    finish = server.pipes[0]._finish_jit

    def gray_stream(scene):
        for t in range(args.frames):
            g = cv.cvtColor(scene.frame(t), cv.COLOR_BGR2GRAY)
            yield cv.resize(g, (w, h), interpolation=cv.INTER_AREA)

    def batch_transform(u8_batch):    # (B, n, h, w) u8, coordinator thread
        b, n = u8_batch.shape[:2]
        return finish(jnp.asarray(u8_batch.reshape(b * n, h, w))).reshape(
            b, n, h, w
        )

    mp = MultiStreamPrefetcher(
        [gray_stream(s) for s in scenes], chunk=args.chunk, depth=2,
        first_extra=1, batch_transform=batch_transform,
    )
    try:
        for batch in mp:
            server.feed_processed(batch)
    finally:
        mp.close()
    return mp.decode_busy_s


def _feed_windowed(server: MultiStreamPipeline, u8, args) -> float:
    """Feed the host (F, B, h, w) u8 array in --stage-window frame windows:
    upload each window untimed, feed + drain it timed; returns summed timed
    seconds.  The per-window drain bounds the timed segment at a real device
    sync (device_get), so no dispatched work leaks into the untimed upload
    gaps."""
    timed = 0.0
    f = args.frames
    tg = 0
    while tg < f:
        n_win = min(args.stage_window, f - tg)
        g = jnp.asarray(u8[tg:tg + n_win])
        g.block_until_ready()               # upload, untimed
        t0 = time.time()
        t = 0
        while t < n_win:
            n = min(args.chunk + (1 if server.states is None else 0),
                    n_win - t)
            server.feed_staged(g, t, n)
            t += n
        server.drain()
        timed += time.time() - t0
        tg += n_win
    return timed


def _feed_all(server: MultiStreamPipeline, grays, args) -> None:
    """Feed a time-major (F, B, h, w) u8 device staging array, one fused
    dispatch per chunk (slice + finish + scan; see feed_staged)."""
    t = 0
    f = args.frames
    while t < f:
        # first feed consumes one extra frame for initialization
        n = min(args.chunk + (1 if server.states is None else 0), f - t)
        server.feed_staged(grays, t, n)
        t += n


if __name__ == "__main__":
    main()
