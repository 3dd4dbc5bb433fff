"""Max per-frame update/CP row counts in a realistic serve run.

Informs the output-compaction capacity (PipelineConfig.out_cap): the
FrameOutputs transport reserves P=190 pair slots per frame while real frames
emit a handful — this prints the observed max/p99 so the cap can be chosen
with a real margin.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import dataclasses
import cv2 as cv
import jax
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import MultiStreamPipeline

S, F, CHUNK = int(os.environ.get("S", "16")), int(os.environ.get("F", "64")), 16


def main():
    cfg = PipelineConfig()
    if jax.default_backend() != "cpu":
        cfg = dataclasses.replace(
            cfg, lk=dataclasses.replace(cfg.lk, pallas_windows=True,
                                        fast_pyramid=True))
    scenes = [
        SyntheticRoadStream(width=1280, height=720, n_frames=F, seed=s,
                            vp=(1280 * (0.45 + 0.01 * (s % 5)), 720 * 0.45))
        for s in range(S)
    ]
    server = MultiStreamPipeline(cfg, src_size=(1280, 720), n_streams=S,
                                 chunk=CHUNK)
    server.drain_every = 10 ** 9
    h, w = server.height, server.width
    u8 = np.empty((S, F, h, w), np.uint8)
    for b in range(S):
        for t in range(F):
            g = cv.cvtColor(scenes[b].frame(t), cv.COLOR_BGR2GRAY)
            u8[b, t] = cv.resize(g, (w, h), interpolation=cv.INTER_AREA)
    grays = jnp.asarray(u8)

    finish = server.pipes[0]._finish_jit
    t = 0
    while t < F:
        n = min(CHUNK + (1 if server.states is None else 0), F - t)
        chunk = finish(grays[:, t:t + n].reshape(S * n, h, w))
        server.feed_processed(chunk.reshape(S, n, h, w))
        t += n

    upd, cp, seg = [], [], []
    for outs in jax.device_get(server._pending):
        upd.append(np.asarray(outs.update_mask).sum(-1).ravel())
        cp.append(np.asarray(outs.cp_mask).sum(-1).ravel())
        seg.append(np.asarray(outs.line_mask).sum(-1).ravel())
    upd = np.concatenate(upd); cp = np.concatenate(cp)
    seg = np.concatenate(seg)
    for name, a in [("update", upd), ("cp", cp), ("segments", seg)]:
        print(f"{name:8s} rows/frame: max {a.max():3d}  p99 "
              f"{np.percentile(a, 99):5.1f}  p90 {np.percentile(a, 90):5.1f}"
              f"  mean {a.mean():5.2f}")


if __name__ == "__main__":
    main()
