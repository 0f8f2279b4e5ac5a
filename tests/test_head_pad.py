"""pad_detect_heads: lane-aligning the detect-conv channel groups.

Pads each per-anchor group 85 -> 128 with ZERO weight rows so the
decode's (A, block) reshape splits the channel dim at a lane-tile
boundary (deleting the full-head relayout copies XLA otherwise inserts
— 10.6 us/frame measured on yolov5n@640 b128 v5e, docs/KERNELS.md).
Zero rows make the real channels BIT-identical, which is what these
tests pin (unlike split_detect_heads' reassociation-free slicing, the
pad doesn't even reorder the accumulation).
"""

import numpy as np
import pytest

from thingino_accel_tpu.ir.passes import pad_detect_heads
from thingino_accel_tpu.models import yolo, zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _heads(eng, x):
    out = eng.run_np(x)
    return [out[k] for k in eng.graph.outputs]


def test_pad_bit_identical_and_decode_parity(rng):
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64), w_scale=0.0005)
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)

    g0 = zoo.build_yolov5("n", cfg)
    e0 = Engine(g0, EngineOptions(precision="fast",
                                  quantize_outputs=False))
    g1 = zoo.build_yolov5("n", cfg)
    assert pad_detect_heads(g1) == 3
    e1 = Engine(g1, EngineOptions(precision="fast",
                                  quantize_outputs=False))

    h0, h1 = _heads(e0, x), _heads(e1, x)
    for a, b in zip(h0, h1):
        assert b.shape[-1] == 384
        real = b.reshape(b.shape[:3] + (3, 128))[..., :85]
        np.testing.assert_array_equal(
            a, real.reshape(a.shape[:3] + (255,)))
        # pad channels are exactly zero (zero weights, zero bias)
        np.testing.assert_array_equal(
            b.reshape(b.shape[:3] + (3, 128))[..., 85:], 0.0)

    import jax.numpy as jnp
    d0 = yolo.decode_and_parse([jnp.asarray(v) for v in h0])
    d1 = yolo.decode_and_parse([jnp.asarray(v) for v in h1])
    for u, v in zip(d0, d1):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_pad_skips_ineligible(rng):
    # consumer present / non-1x1 / non-multiple channels -> untouched
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    # rewire outputs to a backbone tensor (has consumers)
    mid = g.nodes[len(g.nodes) // 2].outputs[0]
    g2 = g.with_outputs([mid])
    assert pad_detect_heads(g2) == 0


def test_pad_composes_with_fpn_split(rng, monkeypatch):
    """pad + the default-on fpn-split together: still bit-identical
    real channels (the rewrites touch disjoint graph regions)."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64), w_scale=0.0005)
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.setenv("TAT_FPN_SPLIT", "1")
    g0 = zoo.build_yolov5("n", cfg)
    e0 = Engine(g0, EngineOptions(precision="fast",
                                  quantize_outputs=False))
    g1 = zoo.build_yolov5("n", cfg)
    assert pad_detect_heads(g1) == 3
    e1 = Engine(g1, EngineOptions(precision="fast",
                                  quantize_outputs=False))
    h0, h1 = _heads(e0, x), _heads(e1, x)
    for a, b in zip(h0, h1):
        real = b.reshape(b.shape[:3] + (3, 128))[..., :85]
        np.testing.assert_array_equal(
            a, real.reshape(a.shape[:3] + (255,)))


def test_topk_postprocess_consumes_padded_heads(rng):
    """detect_postprocess_topk derives the per-anchor block from the
    channel count (like decode_and_parse): padded 128-wide head groups
    produce the same detections as the plain 85-wide ones."""
    import jax.numpy as jnp
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64), w_scale=0.0005)
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    g0 = zoo.build_yolov5("n", cfg)
    e0 = Engine(g0, EngineOptions(precision="fast",
                                  quantize_outputs=False))
    g1 = zoo.build_yolov5("n", cfg)
    assert pad_detect_heads(g1) == 3
    e1 = Engine(g1, EngineOptions(precision="fast",
                                  quantize_outputs=False))
    h0 = [jnp.asarray(v) for v in _heads(e0, x)]
    h1 = [jnp.asarray(v) for v in _heads(e1, x)]
    d0 = yolo.detect_postprocess_topk(h0, conf_thresh=0.0)
    d1 = yolo.detect_postprocess_topk(h1, conf_thresh=0.0)
    for fld in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(d0, fld)), np.asarray(getattr(d1, fld)))
