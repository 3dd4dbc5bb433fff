"""Fused Pallas finish (u8->f32 [+tone] + 3x3 Gaussian) — bit parity with
the XLA chain it replaces (interpret mode on CPU; the chip is covered by
scripts/tpu_smoke.py)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental import pallas as pl

from lk_tpu.ops.blur import gaussian_blur3
from lk_tpu.ops.pallas_finish import fused_finish
from lk_tpu.ops.tone import contrast_brightness


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)


@pytest.mark.parametrize("shape", [(3, 483, 860), (2, 64, 128), (1, 37, 250)])
def test_fused_finish_u8_bit_parity(rng, shape):
    x = jnp.asarray(rng.integers(0, 256, shape).astype(np.uint8))
    want = gaussian_blur3(x.astype(jnp.float32))
    got = fused_finish(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_finish_f32_input(rng):
    x = jnp.asarray((rng.random((2, 120, 300)) * 255).astype(np.float32))
    want = gaussian_blur3(x)
    got = fused_finish(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_finish_contrast_parity(rng):
    """Tone path: in-kernel (x - b0)*k + b1 fuses to an FMA (measured: a
    bare pallas kernel computing just this expression differs from the XLA
    form by 1 ulp at image scale), so the contrast parity budget is 1e-3
    absolute on 0..255 data rather than bit-equality."""
    x = jnp.asarray(rng.integers(0, 256, (2, 100, 200)).astype(np.uint8))
    want = gaussian_blur3(contrast_brightness(x.astype(jnp.float32)))
    got = fused_finish(x, contrast=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)
