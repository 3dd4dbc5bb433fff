"""LKRAW ingest throughput per host core — the engineered answer to the
r4 "decode-bound" diagnosis (VERDICT r4 item 7).

exp_host_ingest.py measured MJPG decode+preprocess at ~81 f/s = 2.7 x
30fps 1080p streams per core: codec decode, not the chip, bounds
production serving.  The repo's mitigation is the LKRAW zero-decode
container (io/raw.py + io/native/framestore.cpp): raw u8 frames behind a
mmap ring with a native prefetch thread, written once at record time (or
transcoded offline).  This harness measures the per-core serving FEED
path from LKRAW against the MJPG baseline, single-threaded
(cv2.setNumThreads(1)) like the r4 harness:

  lkraw-gray read         — native batch read of 1080p GRAY frames
  lkraw-gray read+pre     — + INTER_AREA resize to the 860-wide staging
  lkraw-gray ds2 read+pre — native half-res ring (downscale=2 in the
                            reader: the 2x2 box average IS most of the
                            INTER_AREA work) + resize 960->860
  lkraw-staged860 read    — LKRAW recorded AT the staging geometry
                            (860-wide gray): ingest = pure mmap read,
                            the production transcode-once form
  lkraw-bgr  read+pre     — color LKRAW (record-time transcode kept BGR)
                            + BGR2GRAY + resize
  mjpg decode+pre         — the r4 baseline, re-measured here

Storage cost is the honest tradeoff: gray 1080p LKRAW is 2.07 MB/frame
(62 MB/s/stream) vs ~0.4-0.8 MB/frame MJPG — LKRAW buys chip-rate feeds
with disk bandwidth, which hosts have (a single NVMe sustains ~50-100x
a stream's raw rate).

Usage: python scripts/exp_lkraw_ingest.py [--frames 150]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2 as cv
import numpy as np

from lk_tpu.io.raw import RawFrameReader, write_lkraw

W, H = 1920, 1080
OUT_W = 860


def synth_frames(n, color):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    base = cv.GaussianBlur(base, (0, 0), 3.0)
    out = []
    for t in range(n):
        m = np.float32([[1, 0, (t * 3) % 64], [0, 1, (t * 2) % 48]])
        f = cv.warpAffine(base, m, (W, H), borderMode=cv.BORDER_WRAP)
        out.append(f if color else cv.cvtColor(f, cv.COLOR_BGR2GRAY))
    return np.stack(out)


def _pre(gray, out_w=OUT_W):
    h, w = gray.shape[:2]
    out_h = int(round(h * out_w / w))
    return cv.resize(gray, (out_w, out_h), interpolation=cv.INTER_AREA)


def time_lkraw(path, n_frames, stage, downscale=1, batch=8, reps=3):
    best = 0.0
    for _ in range(reps):
        rd = RawFrameReader(path, ring=16, downscale=downscale)
        n = 0
        t0 = time.perf_counter()
        while True:
            chunk = rd.next_batch(batch)
            if chunk is None:
                break
            for f in chunk:
                if stage == "read":
                    pass
                elif stage == "read+pre":
                    g = f[..., 0] if f.shape[-1] == 1 else \
                        cv.cvtColor(f, cv.COLOR_BGR2GRAY)
                    _pre(g)
                n += 1
        dt = time.perf_counter() - t0
        rd.close()
        best = max(best, n / dt)
    return best


def time_mjpg(path, reps=3):
    best = 0.0
    for _ in range(reps):
        cap = cv.VideoCapture(path)
        n = 0
        t0 = time.perf_counter()
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            _pre(cv.cvtColor(frame, cv.COLOR_BGR2GRAY))
            n += 1
        dt = time.perf_counter() - t0
        cap.release()
        best = max(best, n / dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    args = ap.parse_args()
    cv.setNumThreads(1)

    tmp = tempfile.mkdtemp(prefix="lk_ingest_")
    gray = synth_frames(args.frames, color=False)
    bgr = synth_frames(args.frames, color=True)
    p_gray = write_lkraw(os.path.join(tmp, "clip_gray.lkraw"), gray)
    p_bgr = write_lkraw(os.path.join(tmp, "clip_bgr.lkraw"), bgr)
    p_mjpg = os.path.join(tmp, "clip.avi")
    vw = cv.VideoWriter(p_mjpg, cv.VideoWriter_fourcc(*"MJPG"), 30.0,
                        (W, H))
    for f in bgr:
        vw.write(f)
    vw.release()

    rd = RawFrameReader(p_gray)
    native = rd.native
    rd.close()
    print(f"native framestore: {native}")

    # record-time transcode to the 860-wide staging geometry: ingest is
    # then a pure mmap read — the production form (transcode once, serve
    # many times)
    staged = np.stack([_pre(f) for f in gray])
    p_staged = write_lkraw(os.path.join(tmp, "clip_staged.lkraw"), staged)

    rows = [
        ("lkraw-gray read", time_lkraw(p_gray, args.frames, "read")),
        ("lkraw-gray read+pre", time_lkraw(p_gray, args.frames,
                                           "read+pre")),
        ("lkraw-gray ds2 read+pre", time_lkraw(p_gray, args.frames,
                                               "read+pre", downscale=2)),
        ("lkraw-staged860 read", time_lkraw(p_staged, args.frames,
                                            "read")),
        ("lkraw-bgr read+pre", time_lkraw(p_bgr, args.frames, "read+pre")),
        ("mjpg decode+pre", time_mjpg(p_mjpg)),
    ]
    for name, fps in rows:
        print(f"{name:26s} {fps:8.1f} f/s = {fps/30:6.1f} x 30fps "
              "1080p streams/core", flush=True)

    # host scaling: N workers, each its own reader on the same gray file
    # (the serving feed pattern: one reader thread per stream group).
    # Meaningful only on multi-core hosts: on a 1-core box the workers
    # contend on the GIL/core and the aggregate DROPS — report per-core
    # numbers there and skip the sweep.
    import threading

    n_cores = os.cpu_count() or 1
    if n_cores == 1:
        print("host has 1 core: worker-scaling sweep skipped "
              "(the per-core rows above ARE the host bound here)",
              flush=True)
    for n_workers in (2, 4, 8) if n_cores > 1 else ():
        counts = [0] * n_workers

        def worker(i):
            rd = RawFrameReader(p_gray, ring=16)
            while True:
                chunk = rd.next_batch(8)
                if chunk is None:
                    break
                for f in chunk:
                    _pre(f[..., 0] if f.shape[-1] == 1 else f)
                    counts[i] += 1
            rd.close()

        ts = [threading.Thread(target=worker, args=(i,))
              for i in range(n_workers)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        agg = sum(counts) / dt
        print(f"lkraw-gray read+pre x{n_workers} workers: {agg:8.1f} f/s "
              f"aggregate = {agg/30:6.1f} x 30fps streams", flush=True)

    for p in (p_gray, p_bgr, p_mjpg, p_staged):
        os.unlink(p)
    os.rmdir(tmp)


if __name__ == "__main__":
    main()
