"""Component timing of the batched VP-pipeline step at B=64, 860x483."""
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

from lk_tpu.config import PipelineConfig, LKConfig

B = 64
H, W = 482, 860     # processed geometry (860 wide, imutils height)


def diff_time(fn, args, c0=20, c1=80, reps=5):
    def chained(n):
        @jax.jit
        def go(*a):
            def body(i, acc):
                out = fn(*[x + acc * 1e-12 if x.dtype == jnp.float32 else x
                           for x in a])
                return acc * (1 - 1e-9) + out * 1e-9
            return jax.lax.fori_loop(0, n, body, 0.0)
        return go

    r0, r1 = chained(c0), chained(c1)
    float(r0(*args)); float(r1(*args))
    t0s, t1s = [], []
    for _ in range(reps):
        t = time.perf_counter(); float(r0(*args))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(*args))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (c1 - c0)


def main():
    rng = np.random.default_rng(0)
    prev = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.float32))
    cfg = PipelineConfig()
    lk = dataclasses.replace(cfg.lk, pallas_windows=True,
                             fast_pyramid=True)
    n = cfg.tp_num   # slots per stream
    pts = jnp.asarray(
        np.stack([rng.uniform((100, 300), (700, 420), (n, 2))
                  for _ in range(B)]).astype(np.float32))
    valid = jnp.ones((B, n), bool)

    from lk_tpu.flow.sparse import track_points_batched
    from lk_tpu.ops.blur import pyr_down

    ms = diff_time(
        lambda a, b: jnp.sum(track_points_batched(a, b, pts, valid, lk)[0]),
        (prev, nxt)) * 1e3
    print(f"track_points_batched B={B} n={n}: {ms:7.3f} ms/batch-frame "
          f"({ms / B * 1e3:6.1f} us/stream-frame)", flush=True)

    # --- sub-components ----------------------------------------------------
    def pyr_chain(a):
        l1 = pyr_down(a)
        l2 = pyr_down(l1)
        return jnp.sum(l1) + jnp.sum(l2)

    ms = diff_time(lambda a: pyr_chain(a), (prev,)) * 1e3
    print(f"  pyramid build (exact, one (B,h,w) frame set): {ms:7.3f} ms "
          f"(x2 per pair)", flush=True)

    def pyr_chain_fast(a):
        l1 = pyr_down(a, fast=True)
        l2 = pyr_down(l1, fast=True)
        return jnp.sum(l1) + jnp.sum(l2)

    ms = diff_time(lambda a: pyr_chain_fast(a), (prev,)) * 1e3
    print(f"  pyramid build (fast matmuls):                 {ms:7.3f} ms",
          flush=True)

    pad = max(lk.win_size) + 2

    def fold_cost(a):
        xp = jnp.pad(a, ((0, 0), (pad + 1, pad + 1), (pad, pad)),
                     mode="reflect")
        f = xp.reshape(B * xp.shape[1], xp.shape[2])
        return jnp.sum(f)

    ms = diff_time(lambda a: fold_cost(a), (prev,)) * 1e3
    print(f"  fold (reflect pad + reshape, one L0 array):   {ms:7.3f} ms "
          f"(x2 arrays x ~1.3 levels-equiv per pair)", flush=True)

    # gather alone at L0 geometry (folded frames, nn=B*n points)
    from lk_tpu.flow.sparse import _gather_windows_pallas
    nn = B * n
    fold_h = B * (H + 2 * pad + 2)
    fold_w = W + 2 * pad
    pf = jnp.asarray((rng.random((fold_h, fold_w)) * 255).astype(np.float32))
    nf = jnp.asarray((rng.random((fold_h, fold_w)) * 255).astype(np.float32))
    cy = jnp.asarray(rng.integers(20, fold_h - 60, nn).astype(np.int32))
    cx = jnp.asarray(rng.integers(20, fold_w - 80, nn).astype(np.int32))
    sy = jnp.asarray(rng.integers(0, fold_h - 40, nn).astype(np.int32))
    sx = jnp.asarray(rng.integers(0, fold_w - 64, nn).astype(np.int32))

    def g(a, b):
        raw, sw = _gather_windows_pallas(a, b, cy, cx, sy, sx, 15, 15, 32, 48)
        return jnp.sum(raw) + jnp.sum(sw)

    ms = diff_time(lambda a, b: g(a, b), (pf, nf)) * 1e3
    print(f"  gather+unfold nn={nn} @L0 fold: {ms:7.3f} ms (x~1.5 over "
          f"3 levels)", flush=True)

    # kernel alone (no unfold)
    from lk_tpu.flow.pallas_kernels import make_point_window_gather
    fhp = -(-fold_h // 8) * 8 + 48
    fwp = -(-fold_w // 128) * 128 + 384
    pvp = jnp.pad(pf, ((8, fhp - fold_h - 8), (128, fwp - fold_w - 128)))
    nxp = jnp.pad(nf, ((8, fhp - fold_h - 8), (128, fwp - fold_w - 128)))
    starts = jnp.stack([
        (cy + 8) // 8 * 8 - 8, (cx + 127) // 128 * 128,
        (sy + 8) // 8 * 8, (sx + 128) // 128 * 128,
        (cx + 127) - (cx + 127) // 128 * 128,
        (sx + 128) - (sx + 128) // 128 * 128,
    ]).astype(jnp.int32)

    def kern_only(a, b):
        pw, sww = make_point_window_gather(a, b)(starts)
        return jnp.sum(pw) + jnp.sum(sww)

    ms = diff_time(lambda a, b: kern_only(a, b), (pvp, nxp)) * 1e3
    print(f"  gather kernel only nn={nn}:     {ms:7.3f} ms", flush=True)

    for iters in (1, 3, 10):
        lk_i = dataclasses.replace(lk, max_iters=iters)
        ms = diff_time(
            lambda a, b, l=lk_i: jnp.sum(
                track_points_batched(a, b, pts, valid, l)[0]),
            (prev, nxt)) * 1e3
        print(f"  tracker max_iters={iters:2d}: {ms:7.3f} ms", flush=True)

    # full batched step via the runner's cached step fn
    from lk_tpu.pipeline.runner import make_batched_chunk_runner

    cfg2 = dataclasses.replace(cfg, lk=lk)
    run_chunk, init_fn, _masks = make_batched_chunk_runner(cfg2, (W, H))
    # build states via init on a first gray batch (already-processed size)
    grays0 = prev
    states = init_fn(grays0)
    frames = jnp.stack([nxt] * 4, axis=1)  # (B, T=4, H, W)

    def chunk_fn(f):
        st2, outs = run_chunk(states, f)
        return jnp.sum(st2.vp.vp_xy) + jnp.sum(outs.vp_xy)

    ms = diff_time(lambda f: chunk_fn(f), (frames,), c0=10, c1=40) * 1e3
    print(f"full chunk (T=4) per batch-frame: {ms / 4:7.3f} ms "
          f"({ms / 4 / B * 1e3:6.1f} us/stream-frame)", flush=True)


if __name__ == "__main__":
    main()
