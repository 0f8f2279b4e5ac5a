"""ir/passes.split_concat_convs: 1x1 convs over channel concats split
into per-part dots (fast tier, TAT_FPN_SPLIT), with upsampled parts
computed at low resolution (``conv1x1(up(x)) == up(conv1x1(x))``).

Reference semantics anchor: the concat executor the rewrite bypasses
(``src/mars/mars_runtime.c:963-1000``)."""

import os

import numpy as np
import pytest

from thingino_accel_tpu.ir import passes
from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _fpn_graph(act="SILU", hw=(32, 32)):
    """x -> conv s2 -> up -> concat(up, skip) -> 1x1 conv (the FPN node).

    w_scale keeps dequantized activations O(1-10): with the default
    0.01 the random zoo weights blow the float activations up to 1e3+
    and bf16 rounding of the split partial sums dominates the
    comparison (real calibrated models sit at O(1) — measured <= 2
    quanta on yolov5n_cal_int8.mars)."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=hw, w_scale=0.0005)
    b = zoo.GraphBuilder("fpn", cfg)
    x = b.input("input", (1, hw[0], hw[1], 8))
    skip = b.conv(x, 16, 3, 1, act=act)
    lo = b.conv(skip, 16, 3, 2, act=act)
    up = b.upsample(lo, 2)
    cat = b.concat([up, skip])
    y = b.conv(cat, 24, 1, 1, act=act)
    return b.finish([y])


def test_structural_rewrite_counts():
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    gd = passes.dequantize_graph(g)
    n_up = passes.split_concat_convs(gd, mode="upsample")
    assert n_up == 4          # 2 FPN concats x (cv1, cv2) of the C3
    gd.validate()
    ops = {n.op for n in gd.nodes}
    assert "ADD" in ops
    g2 = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    gd2 = passes.dequantize_graph(g2)
    n_all = passes.split_concat_convs(gd2, mode="all")
    assert n_all > n_up
    gd2.validate()


def test_int8_graph_not_rewritten():
    """The pass is float-only: an exact int8 graph must be untouched
    (splitting would reorder the single-requant dataflow)."""
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    assert passes.split_concat_convs(g, mode="all") == 0


@pytest.mark.parametrize("act", ["RELU", "SILU", "NONE", "LEAKY_RELU"])
def test_fast_tier_numeric_parity(rng, act, monkeypatch):
    """Split vs unsplit fast tier: within one int8 quantum (the split
    reassociates the f32 channel accumulation; ties may flip)."""
    g = _fpn_graph(act)
    x = rng.integers(-128, 128, (1, 32, 32, 8), dtype=np.int8)
    monkeypatch.setenv("TAT_FPN_SPLIT", "")  # explicit off (default is now "wide")
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_FPN_SPLIT", "1")
    split = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - split[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())
        assert (d > 0).mean() < 0.05


def test_all_mode_numeric_yolov5(rng, monkeypatch):
    """mode='all' (every 1x1-over-concat, incl. SPPF and PAN concats)
    on the whole yolov5n zoo graph: within the reassociation bound."""
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64),
                                            w_scale=0.0005))
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.setenv("TAT_FPN_SPLIT", "")  # explicit off (default is now "wide")
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_FPN_SPLIT", "all")
    split = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - split[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())
        assert (d > 0).mean() < 0.1


def test_upsample_commutation_exact(rng):
    """conv1x1(up(x)) == up(conv1x1(x)) holds exactly (identical
    products and sums per output position): with a concat whose skip
    part has ZERO weights, split and unsplit fast-tier outputs agree
    bit for bit."""
    g = _fpn_graph("NONE")
    # zero out the skip part's weight columns (skip channels are the
    # last 16 of the concat)
    wname = [n for n in g.nodes if n.op == "CONV2D"][-1].inputs[1]
    g.tensors[wname].data[:, 16:] = 0
    x = rng.integers(-64, 64, (1, 32, 32, 8), dtype=np.int8)
    os.environ["TAT_FPN_SPLIT"] = ""  # explicit off (default is now "wide")
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    os.environ["TAT_FPN_SPLIT"] = "1"
    try:
        split = Engine(g, EngineOptions(precision="fast")).run_np(x)
    finally:
        del os.environ["TAT_FPN_SPLIT"]
    for k in base:
        np.testing.assert_array_equal(base[k], split[k])


def test_wide_mode_structural_and_numeric(rng, monkeypatch):
    """mode='wide' = the upsample splits PLUS concats whose every part
    is >= 128 channels (lane-aligned: no MXU padding waste, unlike the
    narrow C3 halves that made mode='all' measure -4.7% on v5e).
    Structurally between 'upsample' and 'all' on v5s shapes; numerics
    within the reassociation bound."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64))
    counts = {}
    for mode in ("upsample", "wide", "all"):
        gd = passes.dequantize_graph(zoo.build_yolov5("s", cfg))
        counts[mode] = passes.split_concat_convs(gd, mode=mode)
        gd.validate()
    assert counts["upsample"] < counts["wide"] <= counts["all"], counts

    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64),
                                            w_scale=0.0005))
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.setenv("TAT_FPN_SPLIT", "")
    base = Engine(g, EngineOptions(precision="fast")).run_np(x)
    monkeypatch.setenv("TAT_FPN_SPLIT", "wide")
    split = Engine(g, EngineOptions(precision="fast")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - split[k].astype(np.int32))
        assert d.max() <= 2, (k, d.max())
