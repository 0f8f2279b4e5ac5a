"""fold_stage2_downsample: deep s2d fold of the stage-2 downsample.

After stem_space_to_depth, the stem conv is rewritten to emit its
output in 2x2 space-to-depth layout and the following 3x3 s2
downsample becomes a 2x2 s1 conv at 4x the contraction width
(ir/passes.fold_stage2_downsample). The rewrite computes the SAME
products — exact-tier outputs are bit-identical (int32 accumulation is
order-insensitive); the fast tier differs only by accumulation order
(bf16/f32 reassociation, the fpn-split bound class).

Measured (v5e b128, examples/fold_probe.py row B): the isolated folded
downsample runs 1.14x the plain one (36.7 -> 32.3 us/frame).
"""

import numpy as np
import pytest

from thingino_accel_tpu.ir.passes import (fold_stage2_downsample,
                                          stem_space_to_depth)
from thingino_accel_tpu.models import yolo, zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _build(fold: bool, tier: str, size: str = "n"):
    g = zoo.build_yolov5(size, zoo.ZooConfig(dtype="int8", in_hw=(64, 64),
                                             w_scale=0.0005))
    assert stem_space_to_depth(g)
    if fold:
        assert fold_stage2_downsample(g)
    return Engine(g, EngineOptions(precision=tier,
                                   quantize_outputs=False))


def test_exact_tier_bit_identical(rng):
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    xf = yolo.space_to_depth_frames(x)
    a = _build(False, "exact").run_np(xf)
    b = _build(True, "exact").run_np(xf)
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_fast_tier_reassociation_bound(rng):
    x = rng.integers(-128, 128, (2, 64, 64, 3), dtype=np.int8)
    xf = yolo.space_to_depth_frames(x)
    a = _build(False, "fast").run_np(xf)
    b = _build(True, "fast").run_np(xf)
    for k in a:
        d = np.abs(a[k].astype(np.float32) - b[k].astype(np.float32))
        assert d.max() < 1e-2, (k, d.max())


def test_requires_matching_pattern(rng):
    # without the stem s2d rewrite the first conv is stride 2 -> no
    # stride-1 conv consumes a graph input -> pass is a no-op
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    assert not fold_stage2_downsample(g)


def test_shapes_and_attrs_after_fold():
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    assert stem_space_to_depth(g)
    stem = next(n for n in g.nodes if n.op == "CONV2D")
    pre_out = g.tensors[stem.outputs[0]].shape
    assert fold_stage2_downsample(g)
    # stem: odd-K s1 -> even-K s2, output folded
    assert stem.attrs["kernel"] == (4, 4)
    assert stem.attrs["stride"] == (2, 2)
    t = g.tensors[stem.outputs[0]]
    assert t.shape == (pre_out[0], pre_out[1] // 2, pre_out[2] // 2,
                       4 * pre_out[3])
    # downsample: 3x3 s2 -> 2x2 s1 with asymmetric pad
    down = [n for n in g.nodes if n.op == "CONV2D"][1]
    assert down.attrs["kernel"] == (2, 2)
    assert down.attrs["stride"] == (1, 1)
    assert down.attrs["explicit_pad"] == (1, 0, 1, 0)


def test_same_padded_downsample_is_skipped():
    # SAME on an even input resolves to pt=0 (bottom-heavy pad,
    # ops/reference.py:_conv_pads) while the rewrite assumes the 3x3
    # window starts one pixel above/left -> folding would shift every
    # value by one pixel. The pass must skip it.
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    assert stem_space_to_depth(g)
    down = [n for n in g.nodes if n.op == "CONV2D"][1]
    assert down.attrs["kernel"] == (3, 3) and down.attrs["stride"] == (2, 2)
    down.attrs["padding"] = "SAME"
    down.attrs.pop("explicit_pad", None)
    assert not fold_stage2_downsample(g)


def test_escaping_chain_tensor_blocks_fold():
    # if the stem output (or a SiLU-chain tensor) is ALSO a graph
    # output, folding would relayout data an external consumer sees
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    assert stem_space_to_depth(g)
    stem = next(n for n in g.nodes if n.op == "CONV2D")
    g.outputs = list(g.outputs) + [stem.outputs[0]]
    assert not fold_stage2_downsample(g)
