"""Host-side ingest bound: decode + preprocess throughput per core.

The serving numbers (BENCH_NOTES) measure the chip; this measures the OTHER
half of SURVEY §7 hard part 5 — how many 1080p30 streams one host core can
actually FEED.  No TPU, no tunnel: pure cv2 decode (VideoCapture) plus the
reference's host preprocess (BGR->gray, LK_Final.py:402; INTER_AREA resize
to width 860, LK_Final.py:429/517 via imutils), timed wall-clock.

Stages measured (median of reps over a recorded clip):
  decode        — VideoCapture.read() only
  decode+gray   — + cvtColor BGR2GRAY
  decode+pre    — + INTER_AREA resize to 860-wide (the serving staging form)
  synth+pre     — SyntheticRoadStream frame gen + preprocess (the bench path,
                  for calibrating what the synthetic serving harness hides)

Threading: cv2 decodes with an internal pool by default; we report both
cv2.setNumThreads(1) (the honest per-core datum) and the default, plus a
N-worker scaling run (each worker = its own VideoCapture on the same file)
to show aggregate host throughput.

Usage: python scripts/exp_host_ingest.py [--codec mjpg|mp4v] [--frames 240]
"""

import argparse
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2 as cv
import numpy as np


def make_clip(path: str, codec: str, n_frames: int, w=1920, h=1080) -> None:
    """Record a synthetic 1080p clip with realistic spatial structure (flat
    frames over-compress and flatter decode cost)."""
    fourcc = cv.VideoWriter_fourcc(*("MJPG" if codec == "mjpg" else "mp4v"))
    out = cv.VideoWriter(path, fourcc, 30.0, (w, h))
    assert out.isOpened(), f"VideoWriter failed for {codec} at {path}"
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    base = cv.GaussianBlur(base, (0, 0), 3.0)
    for t in range(n_frames):
        m = np.float32([[1, 0, (t * 3) % 64], [0, 1, (t * 2) % 48]])
        frame = cv.warpAffine(base, m, (w, h), borderMode=cv.BORDER_WRAP)
        out.write(frame)
    out.release()


def _preprocess(frame, out_w=860):
    gray = cv.cvtColor(frame, cv.COLOR_BGR2GRAY)
    h, w = gray.shape
    out_h = int(round(h * out_w / w))
    return cv.resize(gray, (out_w, out_h), interpolation=cv.INTER_AREA)


def time_stage(path: str, stage: str, reps: int = 3) -> float:
    """Frames/s for one sequential reader running ``stage``."""
    best = 0.0
    for _ in range(reps):
        cap = cv.VideoCapture(path)
        assert cap.isOpened()
        n = 0
        t0 = time.perf_counter()
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if stage == "decode+gray":
                cv.cvtColor(frame, cv.COLOR_BGR2GRAY)
            elif stage == "decode+pre":
                _preprocess(frame)
            n += 1
        dt = time.perf_counter() - t0
        cap.release()
        best = max(best, n / dt)
    return best


def time_synth(n_frames: int, reps: int = 3) -> float:
    from lk_tpu.io.video import SyntheticRoadStream

    best = 0.0
    for _ in range(reps):
        stream = SyntheticRoadStream(width=1920, height=1080,
                                     n_frames=n_frames, seed=3)
        it = iter(stream)
        t0 = time.perf_counter()
        n = 0
        for frame in it:
            _preprocess(frame)
            n += 1
        dt = time.perf_counter() - t0
        best = max(best, n / dt)
    return best


def time_parallel(path: str, n_workers: int) -> float:
    """Aggregate fps with n_workers independent readers of the same file
    (each its own VideoCapture — the per-stream serving shape)."""
    counts = [0] * n_workers
    barrier = threading.Barrier(n_workers + 1)

    def work(i):
        cap = cv.VideoCapture(path)
        barrier.wait()
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            _preprocess(frame)
            counts[i] += 1
        cap.release()

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(n_workers)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    return sum(counts) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="mjpg", choices=["mjpg", "mp4v"])
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--workers", type=int, nargs="*", default=[2, 4, 8])
    args = ap.parse_args()

    ncpu = os.cpu_count()
    print(f"host: {ncpu} cpus; codec={args.codec}; {args.frames} frames @1080p")

    with tempfile.TemporaryDirectory() as td:
        ext = "avi" if args.codec == "mjpg" else "mp4"
        path = os.path.join(td, f"clip.{ext}")
        make_clip(path, args.codec, args.frames)
        sz = os.path.getsize(path) / 1e6
        print(f"clip: {sz:.1f} MB ({sz / args.frames * 1e3:.0f} KB/frame)")

        for nthreads, label in ((1, "1-thread cv2"), (0, "default cv2")):
            cv.setNumThreads(nthreads)
            for stage in ("decode", "decode+gray", "decode+pre"):
                fps = time_stage(path, stage)
                print(f"[{label:12s}] {stage:12s} {fps:7.1f} fps "
                      f"= {fps / 30:5.1f} x 30fps streams")

        cv.setNumThreads(1)
        fps = time_synth(min(args.frames, 120))
        print(f"[1-thread cv2] synth+pre    {fps:7.1f} fps "
              f"= {fps / 30:5.1f} x 30fps streams")

        for nw in args.workers:
            fps = time_parallel(path, nw)
            print(f"[{nw}-worker    ] decode+pre   {fps:7.1f} fps aggregate "
                  f"= {fps / 30:5.1f} x 30fps streams "
                  f"({fps / 30 / nw:.2f} streams/worker)")


if __name__ == "__main__":
    main()
