"""Split the headline serve wall into feed vs drain vs payload bytes.

Reproduces apps/serve.py's pre-staged B=64 x 192-frame run but times the
feed loop and the final drain separately, and sizes the fetched FrameOutputs
pytree (the axon tunnel moves ~36 MB/s — a large output payload is seconds
of the measured wall).
"""
import os
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


def build(cfg):
    return MultiStreamPipeline(cfg, src_size=(1280, 720), n_streams=STREAMS,
                               chunk=CHUNK)


def feed_all(server, grays):
    b = grays.shape[0]
    h, w = grays.shape[-2:]
    finish = server.pipes[0]._finish_jit
    t = 0
    while t < FRAMES:
        n = min(CHUNK + (1 if server.states is None else 0), FRAMES - t)
        chunk = finish(grays[:, t:t + n].reshape(b * n, h, w))
        server.feed_processed(chunk.reshape(b, n, h, w))
        t += n


def main():
    import cv2 as cv

    cfg = PipelineConfig()
    cfg = dataclasses.replace(
        cfg, out_cap=int(os.environ.get("CAP", "0")),
        lk=dataclasses.replace(cfg.lk, pallas_windows=True,
                               fast_pyramid=True))
    scenes = [
        SyntheticRoadStream(width=1280, height=720, n_frames=FRAMES, seed=s,
                            vp=(1280 * (0.45 + 0.01 * (s % 5)), 720 * 0.45))
        for s in range(STREAMS)
    ]
    server = build(cfg)
    server.drain_every = 10 ** 9          # never drain inside the loop
    warm = build(cfg)
    warm.drain_every = 10 ** 9

    h, w = server.height, server.width
    u8 = np.empty((STREAMS, FRAMES, h, w), np.uint8)
    for b in range(STREAMS):
        for t in range(FRAMES):
            g = cv.cvtColor(scenes[b].frame(t), cv.COLOR_BGR2GRAY)
            u8[b, t] = cv.resize(g, (w, h), interpolation=cv.INTER_AREA)
    grays = jnp.asarray(u8)
    grays.block_until_ready()

    feed_all(warm, grays)
    warm.drain()

    t0 = time.time()
    feed_all(server, grays)
    # feed loop returns as soon as the last dispatch is queued (async);
    # force completion without fetching the payload:
    jax.block_until_ready(server.states)
    # the axon block_until_ready is itself async-ish; fetch one scalar
    float(server.states.vp_x[0] if hasattr(server.states, "vp_x")
          else jax.tree_util.tree_leaves(server.states)[0].ravel()[0])
    t_feed = time.time() - t0

    nbytes = sum(x.nbytes for o in server._pending
                 for x in jax.tree_util.tree_leaves(o))
    orig_get = jax.device_get
    fetch_t = [0.0]

    def timed_get(x):
        tg = time.time()
        r = orig_get(x)
        fetch_t[0] += time.time() - tg
        return r

    jax.device_get = timed_get
    t0 = time.time()
    server.drain()
    t_drain = time.time() - t0
    jax.device_get = orig_get
    print(f"  drain split: device_get {fetch_t[0]:.2f}s, "
          f"host bookkeeping {t_drain - fetch_t[0]:.2f}s")

    total = server.frames_done
    print(f"feed+compute wall: {t_feed:.2f}s   drain wall: {t_drain:.2f}s")
    print(f"pending payload: {nbytes / 1e6:.1f} MB "
          f"({nbytes / 1e6 / max(t_drain, 1e-9):.1f} MB/s effective)")
    agg = total / (t_feed + t_drain)
    print(f"aggregate: {agg:.1f} fr/s ({agg / 30:.1f} x30fps streams) — "
          f"feed-only would be {total / t_feed:.1f} fr/s "
          f"({total / t_feed / 30:.1f} streams)")


if __name__ == "__main__":
    main()
