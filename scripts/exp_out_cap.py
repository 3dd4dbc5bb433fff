"""A/B the serving drain budget (PipelineConfig.out_cap) in ONE process.

out_cap pads the compacted update/CP row transport to cap*chunk rows; at 48
that is 768B/stream-frame of the ~1.4KB drain payload crossing the ~36 MB/s
axon tunnel.  Lower caps shrink the transport but tighten the
overflow-raises margin (observed mean 14 rows/frame, single-frame p99 ~100;
scripts/exp_row_counts.py).  Alternating reps in one process so the ±30%
cross-process serve drift cancels.
"""
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import MultiStreamPipeline

STREAMS = int(os.environ.get("S", "64"))
FRAMES = int(os.environ.get("F", "192"))
CHUNK = 16
CAPS = tuple(int(c) for c in os.environ.get("CAPS", "48,24").split(","))
REPS = int(os.environ.get("REPS", "3"))


def make_cfg(cap):
    # Mosaic-only paths, like serve.py: fall back on the CPU/test backend.
    on_tpu = jax.default_backend() != "cpu"
    cfg = dataclasses.replace(PipelineConfig(), out_cap=cap)
    return dataclasses.replace(
        cfg, lk=dataclasses.replace(cfg.lk, pallas_windows=on_tpu,
                                    fast_pyramid=on_tpu))


def run_once(cfg, grays):
    server = MultiStreamPipeline(cfg, src_size=(1280, 720),
                                 n_streams=STREAMS, chunk=CHUNK)
    t = 0
    t0 = time.time()
    while t < FRAMES:
        n = min(CHUNK + (1 if server.states is None else 0), FRAMES - t)
        server.feed_staged(grays, t, n)
        t += n
    server.drain()
    dt = time.time() - t0
    return server.frames_done / dt, server


def main():
    import cv2 as cv

    scenes = [
        SyntheticRoadStream(width=1280, height=720, n_frames=FRAMES, seed=s,
                            vp=(1280 * (0.45 + 0.01 * (s % 5)), 720 * 0.45))
        for s in range(STREAMS)
    ]
    probe = MultiStreamPipeline(make_cfg(CAPS[0]), src_size=(1280, 720),
                                n_streams=STREAMS, chunk=CHUNK)
    h, w = probe.height, probe.width
    u8 = np.empty((FRAMES, STREAMS, h, w), np.uint8)
    for b in range(STREAMS):
        for t in range(FRAMES):
            g = cv.cvtColor(scenes[b].frame(t), cv.COLOR_BGR2GRAY)
            u8[t, b] = cv.resize(g, (w, h), interpolation=cv.INTER_AREA)
    grays = jnp.asarray(u8)
    grays.block_until_ready()
    print(f"staged {FRAMES}x{STREAMS} @ {w}x{h}", flush=True)

    cfgs = {c: make_cfg(c) for c in CAPS}
    for c in CAPS:                      # compile + warm untimed
        try:
            fps, srv = run_once(cfgs[c], grays)
        except RuntimeError as e:       # overflow kills only this cap
            print(f"warm cap={c}: OVERFLOW ({e})", flush=True)
            continue
        rows = sum(len(p.csv_rows) for p in srv.pipes)
        print(f"warm cap={c}: {fps:.0f} fps ({rows} csv rows)", flush=True)

    results = {c: [] for c in CAPS}
    overflows = {c: 0 for c in CAPS}
    for r in range(REPS):
        for c in CAPS:                  # alternate so drift hits both
            try:
                fps, _ = run_once(cfgs[c], grays)
            except RuntimeError as e:   # compaction overflow on a low cap
                overflows[c] += 1
                print(f"rep {r} cap={c}: OVERFLOW ({e})", flush=True)
                continue
            results[c].append(fps)
            print(f"rep {r} cap={c}: {fps:.0f} fps", flush=True)
    for c in CAPS:
        if not results[c]:
            print(f"cap={c}: all {overflows[c]} reps overflowed")
            continue
        med = statistics.median(results[c])
        note = f" ({overflows[c]} overflowed reps)" if overflows[c] else ""
        print(f"cap={c}: median {med:.0f} fps = "
              f"{med / 30:.1f} x 30fps streams/chip  {results[c]}{note}")


if __name__ == "__main__":
    main()
