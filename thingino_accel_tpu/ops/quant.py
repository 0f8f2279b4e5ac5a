"""Quantization / requantization math.

The reference uses **two different rounding rules** that must both be
replicated exactly for bit-parity with its int8 outputs:

1. ``HALF_AWAY`` — round half away from zero:
   ``r = (int)(x + (x >= 0 ? 0.5f : -0.5f))``
   used by the MXU conv kernels (``src/mars/mxu_conv.c:222-229,246-248``).

2. ``PLUS_HALF_TRUNC`` — add 0.5 then truncate toward zero:
   ``r = (int)(x + 0.5f)``
   used by the scalar conv reference (``src/mars/mars_runtime.c:498``) and
   all int8 elementwise ops: sigmoid/mul/add/batchnorm
   (``src/mars/mars_runtime.c:764,831,898,1147``).
   Note this is *not* floor for negative x: C's int cast truncates toward
   zero, so e.g. -1.2 -> -0.7 -> 0.

All math is done in float32 exactly as the C code does (int32 sums are
converted to f32, which rounds for |sum| > 2^24 — we reproduce that too by
going through ``astype(float32)``).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np


class RoundMode(enum.Enum):
    HALF_AWAY = "half_away"          # mxu_conv.c conv epilogue
    PLUS_HALF_TRUNC = "plus_half"    # elementwise / scalar-reference rule


def round_to_int(x: jax.Array, mode: RoundMode) -> jax.Array:
    """f32 -> int32 with one of the reference rounding rules."""
    x = x.astype(jnp.float32)
    if mode == RoundMode.HALF_AWAY:
        shifted = x + jnp.where(x >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    else:
        shifted = x + jnp.float32(0.5)
    return jnp.trunc(shifted).astype(jnp.int32)


def clamp_i8(x: jax.Array) -> jax.Array:
    return jnp.clip(x, -128, 127).astype(jnp.int8)


def requantize(
    acc_i32: jax.Array,
    combined_scale,
    mode: RoundMode = RoundMode.HALF_AWAY,
) -> jax.Array:
    """int32 accumulator -> int8, reference conv epilogue.

    ``combined_scale = in_scale * w_scale / out_scale``
    (``src/mars/mxu_conv.c:153``). The multiply is done in f32 on an f32
    copy of the accumulator, exactly as C does ``sum * combined_scale``.
    ``combined_scale`` may be a per-output-channel f32 vector (broadcast
    over the last axis) — the per-channel quantization extension.
    """
    if isinstance(combined_scale, (int, float)):
        cs = jnp.float32(combined_scale)
    else:
        cs = jnp.asarray(combined_scale, jnp.float32)
    scaled = acc_i32.astype(jnp.float32) * cs
    return clamp_i8(round_to_int(scaled, mode))


def quantize(
    x: jax.Array, scale: float, mode: RoundMode = RoundMode.PLUS_HALF_TRUNC
) -> jax.Array:
    """f32 -> int8 with the elementwise rule ``(int)(x/scale + 0.5)``."""
    q = round_to_int(x.astype(jnp.float32) / jnp.float32(scale), mode)
    return clamp_i8(q)


def dequantize(q: jax.Array, scale: float) -> jax.Array:
    """int8 -> f32: ``q * scale`` (zero_point is 0 throughout the reference)."""
    return q.astype(jnp.float32) * jnp.float32(scale)


def combined_scale(in_scale: float, w_scale: float, out_scale: float) -> float:
    """f32 replica of ``(in_scale * w_scale) / out_scale`` computed in C floats."""
    return float(
        np.float32(np.float32(in_scale) * np.float32(w_scale))
        / np.float32(out_scale)
    )
