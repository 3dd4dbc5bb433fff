"""Fused serving `finish` (u8 -> f32 [+tone] + 3x3 Gaussian) as ONE Pallas
pass per frame.

The XLA finish chain (runner._cached_finish: astype + optional
ops.tone.contrast_brightness + ops.blur.gaussian_blur3) materializes the
frame ~4x in HBM (convert, reflect-pad+h-pass, v-pass) — measured
~23 us/stream-frame at 860x483, ~15% of the B=64 serving wall — where the
information flow is one u8 read + one f32 write (~2.6 us at HBM peak).
This kernel streams frames through VMEM with double-buffered DMA: convert,
tone, and both blur passes happen in-VMEM; the REFLECT_101 borders
(x[-1] == x[1], x[n] == x[n-2]) are restored by two iota-selects per axis
on the rolled taps.

Bit-exactness: the accumulation order matches ops.blur._sep_filter_axis
exactly — (0.25*left + 0.5*center) + 0.25*right per axis, horizontal pass
first — so outputs equal gaussian_blur3(...) bit-for-bit (tests pin this
in interpret mode; scripts/tpu_smoke.py on the chip).

Geometry: frames are processed as (ceil8(h), ceil128(w)) padded blocks
(pad values never influence the [:h, :w] result — border selects use the
TRUE h/w edges).  The maker pads/slices in XLA (one cheap u8 pad, one
f32 slice); callers that already hold padded staging can pass
``padded=True`` to skip both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_axis(x, n_true: int, axis: int):
    """One 3-tap [0.25, 0.5, 0.25] REFLECT_101 pass along ``axis`` of the
    padded block ``x``; rows/cols >= n_true hold don't-care values."""
    size = x.shape[axis]
    prev = pltpu.roll(x, shift=1, axis=axis)
    nxt = pltpu.roll(x, shift=size - 1, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    # REFLECT_101: the out-of-range neighbor mirrors to the opposite tap
    left = jnp.where(idx == 0, nxt, prev)
    right = jnp.where(idx == n_true - 1, prev, nxt)
    # accumulation order must match ops.blur._sep_filter_axis bit-for-bit
    return (0.25 * left + 0.5 * x) + 0.25 * right


def _finish_kernel(x_hbm, out_hbm, xs, ys, sems, *, n, h, w, hp, wp,
                   tone_k, tone_b0, tone_b1):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)
    oslot = 1 - slot

    def in_copy(i_, sl):
        return pltpu.make_async_copy(x_hbm.at[i_], xs.at[sl], sems.at[sl])

    def out_copy(i_, sl):
        return pltpu.make_async_copy(ys.at[sl], out_hbm.at[i_],
                                     sems.at[2 + sl])

    @pl.when(i == 0)
    def _():
        in_copy(i, slot).start()

    @pl.when(i < n - 1)
    def _():
        in_copy(i + 1, oslot).start()

    in_copy(i, slot).wait()
    x = xs[slot]
    if x.dtype == jnp.uint8:
        # Mosaic has no direct u8->f32 cast; widen through i32 (exact)
        x = x.astype(jnp.int32)
    x = x.astype(jnp.float32)
    if tone_k is not None:
        x = jnp.clip((x - tone_b0) * tone_k + tone_b1, 0.0, 255.0)
    x = _blur_axis(x, w, axis=1)   # horizontal first (sep_filter2d order)
    x = _blur_axis(x, h, axis=0)

    @pl.when(i >= 2)
    def _():
        out_copy(i, slot).wait()   # this slot's write from step i-2

    ys[slot] = x
    out_copy(i, slot).start()

    @pl.when(i == n - 1)
    def _():
        out_copy(i, slot).wait()
        if n >= 2:
            out_copy(i, oslot).wait()


def _make_call(n: int, hp: int, wp: int, h: int, w: int, dtype_name: str,
               contrast: bool):
    # NOT cached: pallas_call construction happens at trace time only, and
    # caching would pin the interpret-mode monkeypatch CPU tests apply
    dtype = jnp.dtype(dtype_name)
    if contrast:
        import math

        # contrast_brightness defaults (ops/tone.py): b=0, c=100/255
        c = 100.0 / 255.0
        tone_k = math.tan((45.0 + 44.0 * c) / 180.0 * math.pi)
        tone_b0, tone_b1 = 127.5, 127.5
    else:
        tone_k = tone_b0 = tone_b1 = None
    kernel = functools.partial(
        _finish_kernel, n=n, h=h, w=w, hp=hp, wp=wp,
        tone_k=tone_k, tone_b0=tone_b0, tone_b1=tone_b1,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hp, wp), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, hp, wp), dtype),
            pltpu.VMEM((2, hp, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def fused_finish(x: jnp.ndarray, contrast: bool = False) -> jnp.ndarray:
    """(N, H, W) u8/f32 frames -> (N, H, W) f32, tone+blur fused per frame.

    Bit-equal to runner._cached_finish's XLA chain (same op order); one
    HBM read + one write per frame instead of ~4 materializations.
    """
    n, h, w = x.shape
    sub = 32 if x.dtype == jnp.uint8 else 8
    hp = -(-h // sub) * sub
    wp = -(-w // 128) * 128
    xp = x if (hp, wp) == (h, w) else jnp.pad(
        x, ((0, 0), (0, hp - h), (0, wp - w)))
    call = _make_call(n, hp, wp, h, w, str(x.dtype), contrast)
    out = call(xp)
    if (hp, wp) == (h, w):
        return out
    return out[:, :h, :w]
