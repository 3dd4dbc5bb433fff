"""Where does serving wall time go OUTSIDE the batched step?

End-to-end serving (apps/serve.py, B=64) measures ~306 us/stream-frame while
the batched step alone measures ~110-124 us — this script times the other
wall components at the serving geometry:

  1. the per-chunk finishing blur (vmapped gaussian_blur3 over (B*T, h, w) —
     a batched 3-D stencil, the known-pathological lowering class),
  2. a row-folded 2-D variant of the same blur (per-frame 1-row guards),
  3. u8 HBM slice + astype (the staging read),
  4. the feed loop without drains vs with drains at several cadences.

Run on the real chip with nothing else using the TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from lk_tpu.ops.blur import gaussian_blur3

B = 64
T = 16                # chunk
H, W = 482, 860


def diff_time(fn, args, c0=4, c1=16, reps=5):
    """Differential chain timing (tunnel RTT cancels in the slope)."""
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


def folded_blur(g):
    """gaussian_blur3 with the frame batch folded into rows.

    (N, h, w) -> pad each frame 1 row top/bottom (REFLECT_101) -> fold to
    (N*(h+2), w) -> 2-D blur -> unfold, drop guards.  Every op is 2-D."""
    n, h, w = g.shape
    gp = jnp.pad(g, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    out = gaussian_blur3(gp.reshape(n * (h + 2), w))
    return out.reshape(n, h + 2, w)[:, 1:-1]


def main():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, (B, T, H, W), np.uint8))
    g32 = jnp.asarray((rng.random((B * T, H, W)) * 255).astype(np.float32))
    g32.block_until_ready()

    ms = diff_time(lambda a: jnp.sum(gaussian_blur3(a)[:, -1, -1]),
                   (g32,)) * 1e3
    print(f"vmapped/batched blur3 (B*T={B*T}, {H}x{W}) 3-D: {ms:8.3f} ms/chunk"
          f"  ({ms / (B*T) * 1e3:6.1f} us/frame)", flush=True)

    ms = diff_time(lambda a: jnp.sum(folded_blur(a)[:, -1, -1]),
                   (g32,)) * 1e3
    print(f"row-folded blur3 (2-D ops):                    {ms:8.3f} ms/chunk"
          f"  ({ms / (B*T) * 1e3:6.1f} us/frame)", flush=True)

    def stage_read(u):
        g = u.reshape(B * T, H, W).astype(jnp.float32)
        return jnp.sum(g[:, -1, -1])

    ms = diff_time(stage_read, (u8,)) * 1e3
    print(f"u8 -> f32 staging read:                        {ms:8.3f} ms/chunk"
          f"  ({ms / (B*T) * 1e3:6.1f} us/frame)", flush=True)

    def stage_blur(u):
        g = u.reshape(B * T, H, W).astype(jnp.float32)
        return jnp.sum(folded_blur(g)[:, -1, -1])

    ms = diff_time(stage_blur, (u8,)) * 1e3
    print(f"staging read + folded blur (fused):            {ms:8.3f} ms/chunk"
          f"  ({ms / (B*T) * 1e3:6.1f} us/frame)", flush=True)


if __name__ == "__main__":
    main()
