"""Isolate Mosaic dynamic sublane (axis-0) roll semantics on real TPU."""
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


def roll0(x, s):
    def kernel(s_ref, x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=-s_ref[0], axis=0)

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
    for rows, cols in [(304, 1024), (304, 128), (64, 128), (40, 256)]:
        x = jnp.asarray(
            np.arange(rows * cols, dtype=np.float32).reshape(rows, cols))
        bad = []
        for s in range(0, 8):
            got = np.asarray(roll0(x, s))
            want = np.roll(np.asarray(x), -s, axis=0)
            if not np.array_equal(got, want):
                # find actual shift applied to row 0
                row0 = got[0, 0]
                bad.append((s, int(row0 // cols)))
        print(f"({rows},{cols}): " + ("OK all shifts 0..7" if not bad
              else f"MISMATCH {bad} (requested, actual-row-at-0)"))


if __name__ == "__main__":
    main()
