"""Split the serving feed wall: staging slice vs finish blur vs chunk scan.

The serve feed loop per chunk does: (a) slice grays[:, t:t+n] from the
(B, F, H, W) u8 staging array (axis-1 strided!), (b) _finish_jit (u8->f32 +
blur), (c) _vrun chunk scan.  exp_serve_wall2 measured the sum at ~294
us/stream-frame while the scan alone was ~124; this script times each part.
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
from lk_tpu.pipeline.runner import MultiStreamPipeline, _cached_finish

B = int(os.environ.get("S", "64"))
F = int(os.environ.get("F", "192"))
CHUNK = 16
H, W = 482, 860


def timeit(fn, reps=5):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        # force a scalar fetch (axon block_until_ready is async-ish)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = dataclasses.replace(
        PipelineConfig(), out_cap=48,
        )
    cfg = dataclasses.replace(
        cfg, lk=dataclasses.replace(cfg.lk, pallas_windows=True,
                                    fast_pyramid=True))
    server = MultiStreamPipeline(cfg, src_size=(1280, 720), n_streams=B,
                                 chunk=CHUNK)
    h, w = server.height, server.width
    rng = np.random.default_rng(0)
    u8_bf = jnp.asarray(rng.integers(0, 255, (B, F, h, w), np.uint8))
    u8_fb = jnp.asarray(rng.integers(0, 255, (F, B, h, w), np.uint8))
    jax.block_until_ready((u8_bf, u8_fb))
    finish = _cached_finish(cfg)

    # (a) axis-1 strided slice from (B, F, ...) staging
    sl_bf = jax.jit(lambda a, t: jax.lax.dynamic_slice_in_dim(a, t, CHUNK, 1))
    t = timeit(lambda: sl_bf(u8_bf, 32))
    print(f"slice (B,F) axis-1 u8 chunk:  {t*1e3:8.2f} ms", flush=True)

    # (b) axis-0 contiguous slice from (F, B, ...) staging
    sl_fb = jax.jit(lambda a, t: jax.lax.dynamic_slice_in_dim(a, t, CHUNK, 0))
    t = timeit(lambda: sl_fb(u8_fb, 32))
    print(f"slice (F,B) axis-0 u8 chunk:  {t*1e3:8.2f} ms", flush=True)

    # (c) finish blur on one chunk (B*CHUNK frames)
    chunk_u8 = jnp.asarray(rng.integers(0, 255, (B * CHUNK, h, w), np.uint8))
    jax.block_until_ready(chunk_u8)
    t = timeit(lambda: finish(chunk_u8))
    print(f"finish (u8->f32+blur) chunk:  {t*1e3:8.2f} ms "
          f"({t/ (B*CHUNK) * 1e6:6.1f} us/stream-frame)", flush=True)

    # (d) the chunk scan alone, fixed pre-finished input re-fed
    grays_c = finish(chunk_u8).reshape(B, CHUNK, h, w)
    states = server._vinit(grays_c[:, 0])
    jax.block_until_ready((grays_c, states))
    def run():
        s, outs = server._vrun(states, grays_c)
        return outs
    t = timeit(run)
    print(f"chunk scan (_vrun):           {t*1e3:8.2f} ms "
          f"({t / (B*CHUNK) * 1e6:6.1f} us/stream-frame)", flush=True)

    # (e) full feed iteration as serve.py does it (slice+finish+vrun)
    def full(tix):
        c = sl_bf(u8_bf, tix)
        g = finish(c.reshape(B * CHUNK, h, w)).reshape(B, CHUNK, h, w)
        s, outs = server._vrun(states, g)
        return outs
    t = timeit(lambda: full(32))
    print(f"full feed iter (slice+fin+run):{t*1e3:7.2f} ms "
          f"({t / (B*CHUNK) * 1e6:6.1f} us/stream-frame)", flush=True)


if __name__ == "__main__":
    main()
