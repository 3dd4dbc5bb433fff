"""A/B: XLA finish chain vs fused Pallas finish at serving geometry.

The finish (u8->f32 [+tone] + 3x3 blur) measured ~23 us/stream-frame in
the feed split (scripts/exp_feed_split.py) — ~4 HBM materializations for
an op whose information flow is one 0.4 MB read + one 1.7 MB write.
Differential chain timing, one process.  Usage: python scripts/exp_finish.py
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
from lk_tpu.ops.pallas_finish import fused_finish
from lk_tpu.ops.tone import contrast_brightness

B, H, W = 64, 483, 860


def diff_time(fn, x, c0=10, c1=40, reps=5):
    def chained(n):
        @jax.jit
        def go(a):
            def body(i, carry):
                acc, aa = carry
                out = fn(aa)
                acc = acc * (1 - 1e-9) + jnp.sum(out) * 1e-9
                # acc feedback makes each iteration's input depend on the
                # previous output — XLA cannot hoist fn out of the loop
                # (1 - 1e-12 alone rounds to 1.0f and the chain collapses)
                return acc, aa + acc * 1e-12
            return jax.lax.fori_loop(0, n, body, (0.0, a))[0]
        return go

    r0, r1 = chained(c0), chained(c1)
    float(r0(x)); float(r1(x))
    t0s, t1s = [], []
    for _ in range(reps):
        t = time.perf_counter(); float(r0(x))
        t0s.append(time.perf_counter() - t)
        t = time.perf_counter(); float(r1(x))
        t1s.append(time.perf_counter() - t)
    return (min(t1s) - min(t0s)) / (c1 - c0)


def main():
    rng = np.random.default_rng(5)
    xf = jnp.asarray((rng.random((B, H, W)) * 255).astype(np.float32))

    def xla_plain(a):
        return gaussian_blur3(a)

    def xla_tone(a):
        return gaussian_blur3(contrast_brightness(a))

    def pf_plain(a):
        return fused_finish(a)

    def pf_tone(a):
        return fused_finish(a, contrast=True)

    # numeric check on the chip first
    a = np.asarray(jax.jit(xla_plain)(xf))
    b = np.asarray(jax.jit(pf_plain)(xf))
    print("chip maxdiff plain:", np.abs(a - b).max(), flush=True)

    for name, fn in [("xla_blur", xla_plain), ("pallas_blur", pf_plain),
                     ("xla_tone+blur", xla_tone),
                     ("pallas_tone+blur", pf_tone)]:
        ms = diff_time(fn, xf) * 1e3
        print(f"{name:18s} {ms:7.3f} ms/batch ({ms / B * 1e3:6.1f} "
              f"us/frame)", flush=True)


if __name__ == "__main__":
    main()
