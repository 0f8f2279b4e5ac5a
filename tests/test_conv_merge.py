"""ir/passes.merge_sibling_convs: sibling convs over the same input
merged into one wider conv + SPLIT (fast tier, TAT_CONV_MERGE).

The rewrite is mathematically exact — each output channel's dot
product is over the same products — so small graphs agree bit for
bit; on large shapes XLA may pick a different conv tiling for the
wider N and reassociate the K accumulation (measured <= 2 int8 quanta
on the real calibrated yolov5n). (Reference counterpart: none — the
reference dispatches each conv layer record independently,
``src/mars/mars_runtime.c``; this is a pure TPU MXU-lane-utilization
rewrite.)"""

import numpy as np
import pytest

from thingino_accel_tpu.ir import passes
from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _sibling_graph(act="SILU", bias_second=True, hw=(32, 32)):
    """x -> conv3x3 -> (cv1 1x1, cv2 1x1) siblings -> concat."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=hw, w_scale=0.0005)
    b = zoo.GraphBuilder("siblings", cfg)
    x = b.input("input", (1, hw[0], hw[1], 8))
    t = b.conv(x, 16, 3, 1, act=act)
    cv1 = b.conv(t, 12, 1, 1, act=act)
    cv2 = b.conv(t, 12, 1, 1, act=act)
    cat = b.concat([cv1, cv2])
    y = b.conv(cat, 16, 1, 1, act=act)
    return b.finish([y])


def test_structural_merge_counts():
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    gd = passes.dequantize_graph(g)
    n_convs = sum(1 for n in gd.nodes if n.op == "CONV2D")
    n = passes.merge_sibling_convs(gd)
    assert n >= 8            # every C3's cv1/cv2 pair shares its input
    gd.validate()
    assert sum(1 for nd in gd.nodes if nd.op == "CONV2D") == n_convs - n
    assert sum(1 for nd in gd.nodes if nd.op == "SPLIT") >= n


def test_int8_graph_not_merged():
    """Float-only: exact int8 graphs keep per-tensor output scales."""
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    assert passes.merge_sibling_convs(g) == 0


@pytest.mark.parametrize("act", ["RELU", "SILU", "NONE"])
def test_merge_bit_exact(rng, act, monkeypatch):
    g = _sibling_graph(act)
    x = rng.integers(-128, 128, (1, 32, 32, 8), dtype=np.int8)
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    merged = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        np.testing.assert_array_equal(base[k], merged[k])


def test_merge_parity_yolov5(rng, monkeypatch):
    """Whole yolov5n graph: merged fast tier within the tiling
    reassociation bound (<= 2 quanta, few ties flipped)."""
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64),
                                            w_scale=0.0005))
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    merged = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - merged[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())
        assert (d > 0).mean() < 0.1


def test_merge_composes_with_fpn_split(rng, monkeypatch):
    """merge + split together on yolov5n: still within the FPN split's
    2-quanta reassociation bound (the merge itself adds nothing)."""
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64),
                                            w_scale=0.0005))
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    monkeypatch.setenv("TAT_FPN_SPLIT", "")  # explicit off (default is now "1")
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    monkeypatch.setenv("TAT_FPN_SPLIT", "1")
    both = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - both[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())


def test_merge_split_nanodet(rng, monkeypatch):
    """Second architecture (depthwise + LEAKY_RELU PAN): merge+split
    within the reassociation bound; depthwise convs untouched."""
    g = zoo.build_nanodet(zoo.ZooConfig(dtype="int8", in_hw=(64, 64),
                                        w_scale=0.0005))
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    monkeypatch.setenv("TAT_FPN_SPLIT", "")  # explicit off (default is now "1")
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    monkeypatch.setenv("TAT_FPN_SPLIT", "1")
    both = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - both[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())


def test_mixed_bias_siblings(rng, monkeypatch):
    """A biasless sibling merges with a biased one (zero-filled rows)."""
    g = _sibling_graph("NONE")
    # drop the bias input from cv2
    convs = [n for n in g.nodes if n.op == "CONV2D"]
    cv2 = convs[2]
    assert len(cv2.inputs) == 3
    g.tensors[cv2.inputs[2]].data[:] = 0
    cv2.inputs = cv2.inputs[:2]
    x = rng.integers(-128, 128, (1, 32, 32, 8), dtype=np.int8)
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    merged = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        np.testing.assert_array_equal(base[k], merged[k])


def test_bench_combo_s2d_merge_split(rng, monkeypatch):
    """The bench pipeline's full pass stack (s2d stem ingest + merge +
    FPN split) on yolov5n: detections within the reassociation bound
    of the plain fast tier."""
    from thingino_accel_tpu.ir.passes import stem_space_to_depth
    from thingino_accel_tpu.models import yolo

    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64), w_scale=0.0005)
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    monkeypatch.setenv("TAT_FPN_SPLIT", "")  # explicit off (default is now "1")
    base = Engine(zoo.build_yolov5("n", cfg),
                  EngineOptions(precision="fast")).run_np(x)
    g = zoo.build_yolov5("n", cfg)
    assert stem_space_to_depth(g)
    combo = Engine(g, EngineOptions(precision="fast", conv_merge=True,
                                    fpn_split="1")
                   ).run_np(yolo.space_to_depth_frames(x))
    for k in base:
        d = np.abs(base[k].astype(np.int32) - combo[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())
        assert (d > 0).mean() < 0.1
