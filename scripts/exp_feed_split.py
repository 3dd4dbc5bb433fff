"""Split the serving feed wall: staging slice vs finish blur vs chunk scan.

The serve feed loop per chunk does: (a) slice grays[:, t:t+n] from the
(B, F, H, W) u8 staging array (axis-1!), (b) _finish_jit (u8->f32 + blur),
(c) _vrun chunk scan.  exp_serve_wall2 measured the sum at ~294
us/stream-frame while the scan alone was ~124; this script times each part
and a fused staged-runner candidate (slice+finish+run in ONE jit, where
XLA can cancel the (B,T)<->(T,B) transposes).

Methodology: staging data is generated ON DEVICE (a host-staged 5 GB array
takes minutes over the ~36 MB/s axon tunnel) and every timing is the SLOPE
between an 8-call and a 2-call chain ending in one scalar fetch — the
tunnel RTT cancels (see BENCH_NOTES.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import dataclasses
import functools

import jax
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.pipeline.runner import MultiStreamPipeline, _cached_finish

B = int(os.environ.get("S", "64"))
F = int(os.environ.get("F", "64"))
CHUNK = 16
N_LO, N_HI = 2, 8


def fetch_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def slope_time(fn, reps=3):
    """Per-call seconds: slope between N_HI- and N_LO-call chains."""
    fetch_scalar(fn())  # warm
    ts = {}
    for n in (N_LO, N_HI):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn()
            fetch_scalar(out)
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO)


def report(name, t):
    print(f"{name:34s} {t*1e3:8.2f} ms  "
          f"({t / (B * CHUNK) * 1e6:6.1f} us/stream-frame)", flush=True)


def main():
    cfg = dataclasses.replace(PipelineConfig(), out_cap=48)
    cfg = dataclasses.replace(
        cfg, lk=dataclasses.replace(cfg.lk, pallas_windows=True,
                                    fast_pyramid=True))
    server = MultiStreamPipeline(cfg, src_size=(1280, 720), n_streams=B,
                                 chunk=CHUNK)
    h, w = server.height, server.width
    print(f"B={B} F={F} chunk={CHUNK} frame={h}x{w}", flush=True)

    key = jax.random.PRNGKey(0)
    gen = jax.jit(functools.partial(
        jax.random.randint, minval=0, maxval=255, dtype=jnp.uint8),
        static_argnames="shape")
    u8_bf = gen(key, shape=(B, F, h, w))
    u8_fb = jnp.swapaxes(u8_bf, 0, 1)
    chunk_u8 = gen(key, shape=(B * CHUNK, h, w))
    jax.block_until_ready((u8_bf, u8_fb, chunk_u8))
    finish = _cached_finish(cfg)

    # (a) axis-1 slice from (B, F, ...) staging (what serve.py does today)
    sl_bf = jax.jit(lambda a, t: jax.lax.dynamic_slice_in_dim(a, t, CHUNK, 1))
    report("slice (B,F) axis-1 u8", slope_time(lambda: sl_bf(u8_bf, 32)))

    # (b) axis-0 contiguous slice from (F, B, ...) staging
    sl_fb = jax.jit(lambda a, t: jax.lax.dynamic_slice_in_dim(a, t, CHUNK, 0))
    report("slice (F,B) axis-0 u8", slope_time(lambda: sl_fb(u8_fb, 32)))

    # (c) finish blur on one chunk (B*CHUNK frames)
    report("finish (u8->f32+blur)", slope_time(lambda: finish(chunk_u8)))

    # (d) the chunk scan alone, fixed pre-finished input re-fed
    grays_c = finish(chunk_u8).reshape(B, CHUNK, h, w)
    states = server._vinit(grays_c[:, 0])
    jax.block_until_ready((grays_c, states))
    report("chunk scan (_vrun)",
           slope_time(lambda: server._vrun(states, grays_c)[1]))

    # (e) full feed iteration as serve.py does it (slice+finish+vrun,
    #     three separate dispatches)
    def full(tix):
        c = sl_bf(u8_bf, tix)
        g = finish(c.reshape(B * CHUNK, h, w)).reshape(B, CHUNK, h, w)
        return server._vrun(states, g)[1]
    report("full feed (3 dispatches, B,F)", slope_time(lambda: full(32)))

    # (f) fused candidate: ONE jit over (F, B) staging; the finish output
    #     feeds the scan time-major so the host-side (B,T) reshape and the
    #     scan's swapaxes can cancel inside XLA
    vrun = server._vrun

    @jax.jit
    def fused(states, staging_fb, t):
        c = jax.lax.dynamic_slice_in_dim(staging_fb, t, CHUNK, 0)
        g = finish(c.reshape(CHUNK * B, h, w)).reshape(CHUNK, B, h, w)
        return vrun(states, jnp.swapaxes(g, 0, 1))[1]

    report("fused slice+finish+run (F,B)",
           slope_time(lambda: fused(states, u8_fb, 32)))

    # (g) fused over the CURRENT (B, F) layout for comparison
    @jax.jit
    def fused_bf(states, staging_bf, t):
        c = jax.lax.dynamic_slice_in_dim(staging_bf, t, CHUNK, 1)
        g = finish(c.reshape(B * CHUNK, h, w)).reshape(B, CHUNK, h, w)
        return vrun(states, g)[1]

    report("fused slice+finish+run (B,F)",
           slope_time(lambda: fused_bf(states, u8_bf, 32)))


if __name__ == "__main__":
    main()
