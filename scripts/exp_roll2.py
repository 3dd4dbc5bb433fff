"""Axis-0 shift workarounds: static roll correctness + dynamic_slice."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from lk_tpu.utils import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_kernel(x, s, mode):
    def kernel(s_ref, x_ref, o_ref):
        sh = s_ref[0]
        w = x_ref[:]
        if mode == "static_bits":
            for bit in (1, 2, 4):
                r = pltpu.roll(w, shift=w.shape[0] - bit, axis=0)
                w = jnp.where((sh & bit) != 0, r, w)
            o_ref[:] = w
        elif mode == "dyn_slice":
            sl = jax.lax.dynamic_slice(
                w, (sh, 0), (w.shape[0] - 8, w.shape[1]))
            o_ref[:] = jnp.concatenate(
                [sl, jnp.zeros((8, w.shape[1]), w.dtype)], axis=0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray([s], jnp.int32), x)


def main():
    rows, cols = 304, 1024
    x = jnp.asarray(
        np.arange(rows * cols, dtype=np.float32).reshape(rows, cols))
    xn = np.asarray(x)
    for mode in ("static_bits", "dyn_slice"):
        bad = []
        try:
            for s in range(8):
                got = np.asarray(run_kernel(x, s, mode))
                if mode == "static_bits":
                    want = np.roll(xn, -s, axis=0)
                else:
                    want = np.concatenate(
                        [xn[s:s + rows - 8], np.zeros((8, cols), np.float32)])
                if not np.array_equal(got, want):
                    bad.append((s, int(got[0, 0] // cols)))
            print(f"{mode}: " + ("OK 0..7" if not bad else f"MISMATCH {bad}"))
        except Exception as e:  # noqa: BLE001
            print(f"{mode}: REJECTED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
