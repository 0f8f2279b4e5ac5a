"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/TAT_TPU_TESTS runs). Bit-parity vs the XLA reference ops."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thingino_accel_tpu.ops import reference as R
from thingino_accel_tpu.ops.quant import RoundMode


@pytest.fixture(autouse=True)
def _interpret_mode():
    if os.environ.get("TAT_TPU_TESTS") == "1":
        yield   # hardware run: compiled Mosaic path
        return
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_matmul_requant_exact(rng):
    from thingino_accel_tpu.ops.pallas_kernels import matmul_int8_requant
    m, k, n = 64, 96, 130
    x = jnp.asarray(rng.integers(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (k, n), dtype=np.int8))
    b = jnp.asarray(rng.integers(-3000, 3000, (n,), dtype=np.int32))
    cs = 0.00037
    got = np.asarray(matmul_int8_requant(x, w, b, cs,
                                         block_m=32, block_n=128,
                                         block_k=64))
    acc = (np.asarray(x, np.int64) @ np.asarray(w, np.int64)
           + np.asarray(b, np.int64))
    scaled = np.float32(acc.astype(np.int32).astype(np.float32)
                        * np.float32(cs))
    ref = np.clip(np.trunc(scaled + np.where(scaled >= 0, np.float32(0.5),
                                             np.float32(-0.5))),
                  -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, ref)


def test_conv1x1_matches_reference(rng):
    from thingino_accel_tpu.ops import pallas_kernels as PK
    x = jnp.asarray(rng.integers(-128, 128, (1, 8, 8, 32), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (1, 1, 32, 16), dtype=np.int8))
    b = jnp.asarray(rng.integers(-500, 500, (16,), dtype=np.int32))
    args = (x, w, b, (8, 8), (1, 1), (1, 1), ((0, 0), (0, 0)),
            0.05, 0.01, 0.04)
    got = np.asarray(PK.conv2d_int8(*args))
    ref = np.asarray(R.conv2d_int8(*args))
    np.testing.assert_array_equal(got, ref)


def test_conv3x3_matches_reference(rng):
    from thingino_accel_tpu.ops import pallas_kernels as PK
    x = jnp.asarray(rng.integers(-128, 128, (1, 10, 10, 8), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (3, 3, 8, 16), dtype=np.int8))
    b = jnp.asarray(rng.integers(-500, 500, (16,), dtype=np.int32))
    args = (x, w, b, (10, 10), (1, 1), (1, 1), ((1, 1), (1, 1)),
            0.1, 0.02, 0.08)
    got = np.asarray(PK.conv2d_int8(*args))
    ref = np.asarray(R.conv2d_int8(*args))
    np.testing.assert_array_equal(got, ref)


def test_conv_strided_relu(rng):
    from thingino_accel_tpu.ops import pallas_kernels as PK
    x = jnp.asarray(rng.integers(-128, 128, (2, 9, 9, 4), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (3, 3, 4, 8), dtype=np.int8))
    args = (x, w, None, (4, 4), (2, 2), (1, 1), ((0, 0), (0, 0)),
            0.1, 0.02, 0.08)
    got = np.asarray(PK.conv2d_int8(*args, relu=True))
    ref = np.asarray(R.conv2d_int8(*args, relu=True))
    np.testing.assert_array_equal(got, ref)


def test_backend_dispatch(rng):
    from thingino_accel_tpu.ops import conv as conv_mod
    x = jnp.asarray(rng.integers(-128, 128, (1, 6, 6, 8), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (1, 1, 8, 8), dtype=np.int8))
    args = (x, w, None, (6, 6), (1, 1), (1, 1), ((0, 0), (0, 0)),
            0.1, 0.01, 0.1)
    a = np.asarray(conv_mod.conv2d_int8(*args, backend="xla"))
    b = np.asarray(conv_mod.conv2d_int8(*args, backend="pallas"))
    np.testing.assert_array_equal(a, b)


def test_halo_kernel_matrix(rng):
    """Halo-tile conv across kernel/stride variants, bit-exact vs XLA.

    Stride-2 cases run in interpret mode only: the legacy halo kernel's
    strided taps need strided VMEM slices, which compiled Mosaic lacks
    (docs/KERNELS.md) — the serving tier's W-phase-folded kernel
    (ops/fused_kernels.py) is the hardware path for strided convs."""
    from thingino_accel_tpu.ops import pallas_kernels as PK
    on_hw = os.environ.get("TAT_TPU_TESTS") == "1"
    for (n, h, w, c, o, k, s) in [(1, 16, 16, 8, 16, 3, 1),
                                  (2, 17, 15, 4, 8, 3, 2),
                                  (1, 12, 12, 8, 8, 5, 1),
                                  (1, 9, 9, 16, 8, 1, 2)]:
        if on_hw and s > 1:
            continue
        x = jnp.asarray(rng.integers(-128, 128, (n, h, w, c), dtype=np.int8))
        wt = jnp.asarray(rng.integers(-128, 128, (k, k, c, o), dtype=np.int8))
        b = jnp.asarray(rng.integers(-500, 500, (o,), dtype=np.int32))
        pad = (k - 1) // 2
        oh = (h + 2 * pad - k) // s + 1
        ow = (w + 2 * pad - k) // s + 1
        got = np.asarray(PK.conv2d_int8_halo(
            x, wt, b, (oh, ow), (s, s), ((pad, pad), (pad, pad)),
            0.05, 0.01, 0.04, tile_h=4))
        ref = np.asarray(R.conv2d_int8(
            x, wt, b, (oh, ow), (s, s), (1, 1), ((pad, pad), (pad, pad)),
            0.05, 0.01, 0.04))
        np.testing.assert_array_equal(got, ref)
