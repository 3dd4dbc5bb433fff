"""Sharded serving on the REAL chip with the Pallas serving kernels ON.

VERDICT r3 weak #3: serve.py enables pallas_windows/fast_pyramid/
pallas_finish only off-CPU, while the mesh parity test and the multichip
dryrun run on the CPU mesh — so the shard_map + Mosaic composition (what
production multi-chip serving would actually execute) had never run
anywhere.  One real chip is enough to close that: a 1-device Mesh
MultiStreamPipeline on TPU compiles and executes the same shard_map program
(same partitioning machinery, degenerate axis), composed with the Mosaic
kernels.  This script runs it, checks exact parity of every host-visible
output against the unsharded run, and times both.

Run alone on the TPU: python scripts/exp_mesh_tpu.py [--streams 32]
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.models import PRESETS
from lk_tpu.pipeline.runner import MultiStreamPipeline


def run_once(cfg, grays, n_streams, frames, w, h, mesh=None):
    server = MultiStreamPipeline(cfg, src_size=(w, h), n_streams=n_streams,
                                 chunk=16, mesh=mesh)
    t = 0
    while t < frames:
        n = min(16 + (1 if server.states is None else 0), frames - t)
        server.feed_staged(grays, t, n)
        t += n
    server.drain()
    return server


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=32)
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--width", type=int, default=860)
    ap.add_argument("--height", type=int, default=483)
    args = ap.parse_args()

    assert jax.default_backend() != "cpu", "run on the real TPU"
    dev = jax.devices()[:1]
    mesh = Mesh(np.asarray(dev), ("streams",))

    cfg = PRESETS["final"]
    cfg = dataclasses.replace(
        cfg, pallas_finish=True, out_cap=48,
        lk=dataclasses.replace(cfg.lk, pallas_windows=True,
                               fast_pyramid=True))

    import cv2 as cv

    scenes = [SyntheticRoadStream(width=args.width, height=args.height,
                                  n_frames=args.frames, seed=s)
              for s in range(args.streams)]
    u8 = np.empty((args.frames, args.streams, args.height, args.width),
                  np.uint8)
    for b in range(args.streams):
        for t in range(args.frames):
            u8[t, b] = cv.cvtColor(scenes[b].frame(t), cv.COLOR_BGR2GRAY)
    grays = jnp.asarray(u8)
    grays.block_until_ready()

    results = {}
    for name, m in (("unsharded", None), ("mesh1", mesh)):
        # warm (compile) pass, then 3 timed passes
        run_once(cfg, grays, args.streams, args.frames, args.width,
                 args.height, mesh=m)
        walls = []
        for _ in range(3):
            t0 = time.time()
            server = run_once(cfg, grays, args.streams, args.frames,
                              args.width, args.height, mesh=m)
            walls.append(time.time() - t0)
        results[name] = (server, sorted(walls))
        fps = server.frames_done / np.median(walls)
        print(f"{name:10s} walls {['%.2f' % w_ for w_ in sorted(walls)]} "
              f"median agg {fps:.0f} fps = {fps / 30:.1f} x 30fps streams")

    a, b = results["unsharded"][0], results["mesh1"][0]
    n_rows_a = [len(p.csv_rows) for p in a.pipes]
    n_rows_b = [len(p.csv_rows) for p in b.pipes]
    assert n_rows_a == n_rows_b, (n_rows_a, n_rows_b)
    max_d = 0.0
    for pa, pb in zip(a.pipes, b.pipes):
        ra = np.asarray(pa.csv_rows, np.float64).reshape(-1, 2)
        rb = np.asarray(pb.csv_rows, np.float64).reshape(-1, 2)
        if len(ra):
            max_d = max(max_d, float(np.abs(ra - rb).max()))
    ok = sum(1 for p in a.pipes if len(p.csv_rows) > 0)
    print(f"parity: {ok}/{args.streams} streams emit VP rows; "
          f"max |csv diff| sharded vs unsharded = {max_d:.2e}")
    assert max_d == 0.0, "sharded serving must match unsharded exactly"
    print("OK: shard_map + Mosaic serving composition verified on TPU")


if __name__ == "__main__":
    main()
