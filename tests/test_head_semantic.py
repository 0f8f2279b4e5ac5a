"""semantic_detect_heads: anchor-minor head channels + slice decode.

The permutation only renames output channels of the detect convs
(weight-row reorder at import); decode_and_parse_semantic maps them
back. Detections must be BIT-identical to the packed path — including
the argmax first-maximum tie-break, pinned here with deliberately
duplicated logits.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from thingino_accel_tpu.ir.passes import semantic_detect_heads
from thingino_accel_tpu.models import yolo, zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _detections(heads, fn, scales=None):
    b, c, k = fn([jnp.asarray(h) for h in heads], scales=scales)
    return np.asarray(b), np.asarray(c), np.asarray(k)


def test_semantic_heads_bit_identical(rng):
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64), w_scale=0.0005)
    x = rng.integers(-128, 128, (2, 64, 64, 3), dtype=np.int8)

    g0 = zoo.build_yolov5("n", cfg)
    e0 = Engine(g0, EngineOptions(precision="fast", quantize_outputs=False))
    g1 = zoo.build_yolov5("n", cfg)
    assert semantic_detect_heads(g1) == 3
    e1 = Engine(g1, EngineOptions(precision="fast", quantize_outputs=False))

    h0 = [e0.run_np(x)[k] for k in e0.graph.outputs]
    h1 = [e1.run_np(x)[k] for k in e1.graph.outputs]
    # channel permutation only: packed[j*85+s] == semantic[s*3+j]
    for a, b in zip(h0, h1):
        perm = np.arange(255).reshape(3, 85).T.reshape(-1)
        np.testing.assert_array_equal(a[..., perm], b)

    d0 = _detections(h0, yolo.decode_and_parse)
    d1 = _detections(h1, yolo.decode_and_parse_semantic)
    for u, v in zip(d0, d1):
        np.testing.assert_array_equal(u, v)


def test_semantic_decode_argmax_tiebreak():
    # duplicate maxima across classes: both decodes must pick the FIRST
    b, h, w, a, nc = 1, 4, 4, 3, 80
    rng = np.random.default_rng(0)
    packed = rng.normal(size=(b, h, w, a * (5 + nc))).astype(np.float32)
    pk = packed.reshape(b, h, w, a, 5 + nc)
    pk[..., 5 + 7] = 9.0
    pk[..., 5 + 41] = 9.0          # tie with class 7 -> must pick 7
    packed = pk.reshape(b, h, w, a * (5 + nc))
    perm = np.arange(a * (5 + nc)).reshape(a, 5 + nc).T.reshape(-1)
    sem = packed[..., perm]
    d0 = _detections([packed], yolo.decode_and_parse)
    d1 = _detections([sem], yolo.decode_and_parse_semantic)
    assert (d0[2] == 7).all()
    for u, v in zip(d0, d1):
        np.testing.assert_array_equal(u, v)


def test_semantic_skips_ineligible():
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    mid = g.nodes[len(g.nodes) // 2].outputs[0]
    g2 = g.with_outputs([mid])
    assert semantic_detect_heads(g2) == 0


def test_semantic_int8_scaled_heads(rng):
    """int8 quantized-output heads with per-head scales: raw-dtype
    compare chain must match _best_class's packed-int16 trick."""
    b, h, w, a, nc = 1, 8, 8, 3, 80
    packed = rng.integers(-128, 128, (b, h, w, a * (5 + nc)),
                          dtype=np.int8)
    perm = np.arange(a * (5 + nc)).reshape(a, 5 + nc).T.reshape(-1)
    sem = packed[..., perm]
    d0 = _detections([packed], yolo.decode_and_parse, scales=[0.05])
    d1 = _detections([sem], yolo.decode_and_parse_semantic, scales=[0.05])
    for u, v in zip(d0, d1):
        np.testing.assert_array_equal(u, v)


def test_semantic_class_reduce_variants_agree(rng):
    b, h, w, a, nc = 2, 8, 8, 3, 80
    packed = rng.integers(-128, 128, (b, h, w, a * (5 + nc)),
                          dtype=np.int8)
    perm = np.arange(a * (5 + nc)).reshape(a, 5 + nc).T.reshape(-1)
    sem = packed[..., perm]
    d0 = _detections([packed], yolo.decode_and_parse, scales=[0.05])
    for mode in ("reshape", "chain"):
        d1 = _detections(
            [sem],
            lambda f, scales=None, m=mode: yolo.decode_and_parse_semantic(
                f, scales=scales, class_reduce=m),
            scales=[0.05])
        for u, v in zip(d0, d1):
            np.testing.assert_array_equal(u, v)
