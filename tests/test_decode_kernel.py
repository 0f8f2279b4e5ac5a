"""Parity tests for the Pallas head-decode kernel (interpret mode on
CPU; TPU compiled path measured by bench TAT_DECODE=pallas)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thingino_accel_tpu.models import yolo
from thingino_accel_tpu.ops.decode_kernel import (
    decode_and_parse_pallas, decode_level_pallas, _pick_rows)


@pytest.fixture(autouse=True)
def _interpret_mode():
    if os.environ.get("TAT_TPU_TESTS") == "1":
        yield
        return
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _heads(rng, b, dtype, nc=80):
    shapes = [(b, 8, 8, 3 * (5 + nc)), (b, 4, 4, 3 * (5 + nc)),
              (b, 2, 2, 3 * (5 + nc))]
    if dtype == np.int8:
        return [jnp.asarray(rng.integers(-128, 128, s, dtype=np.int8))
                for s in shapes]
    return [jnp.asarray(rng.normal(0, 2, s).astype(np.float32))
            for s in shapes]


ANCH = yolo.YOLOV5_ANCHORS
STRIDES = (8, 16, 32)


def test_pick_rows():
    assert _pick_rows(128 * 6400) == 1024
    assert _pick_rows(128) == 128
    assert _pick_rows(400) is None     # b=1 smallest level: fallback


def test_int8_parity_with_scales(rng):
    heads = _heads(rng, b=2, dtype=np.int8)
    scales = [0.043, 0.037, 0.051]
    ref = yolo.decode_and_parse(heads, scales=scales)
    got = decode_and_parse_pallas(heads, ANCH, STRIDES, scales=scales)
    # identical op sequence -> near-bit-exact floats, exact classes
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


def test_f32_parity(rng):
    heads = _heads(rng, b=2, dtype=np.float32)
    ref = yolo.decode_and_parse(heads)
    got = decode_and_parse_pallas(heads, ANCH, STRIDES)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))


def test_argmax_is_first_occurrence(rng):
    # duplicate max logits: class index must match jnp.argmax (first)
    nc = 80
    feat = np.zeros((1, 8, 8, 3 * (5 + nc)), np.int8)
    feat[..., 5 + 7] = 100      # anchor 0: classes 7 and 19 tie
    feat[..., 5 + 19] = 100
    heads = [jnp.asarray(feat)]
    got = decode_level_pallas(heads[0], np.asarray(ANCH[0]), 8,
                              scale=0.05)
    assert got is not None
    ref = yolo.decode_and_parse(heads, anchors=ANCH[0:1],
                                strides=(8,), scales=[0.05])
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    assert np.asarray(got[2]).reshape(1, 64, 3)[0, 0, 0] == 7


def test_padded_head_falls_back():
    # ch != A*(5+NC): kernel declines, wrapper uses the XLA decode
    nc = 80
    feat = jnp.zeros((1, 4, 4, 3 * 128), jnp.int8)
    assert decode_level_pallas(feat, np.asarray(ANCH[0]), 8) is None
