"""Executor-level serving-tier tests (interpret mode on CPU).

The serving tier (``precision="serving"``, fused pallas kernels +
folded layouts + the XLA bf16-exact stem stage) must:
- match the exact int8 tier BIT FOR BIT on linear/RELU graphs (the
  tier contract in runtime/engine.py);
- stay within quantization noise of the exact tier on SiLU graphs
  (SiLU runs on the f32 pre-activation — one fewer requantization).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions
from thingino_accel_tpu.runtime.executor import _plan_folds
from thingino_accel_tpu.ir.passes import fuse_act_into_conv


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


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _stem_graph(act: str, hw=(64, 64)):
    """stem-shaped chain: 6x6/2 3->8, 3x3/2 8->16, 1x1 16->32."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=hw)
    b = zoo.GraphBuilder("stemchain", cfg)
    x = b.input("input", (1, hw[0], hw[1], 3))
    y = b.conv(x, 8, 6, 2, act=act)
    y = b.conv(y, 16, 3, 2, act=act)
    y = b.conv(y, 32, 1, 1, act=act)
    return b.finish([y])


def test_stage_plan_yolov5s():
    g = zoo.build_yolov5("s", zoo.ZooConfig(dtype="int8",
                                            in_hw=(640, 640)))
    g = fuse_act_into_conv(g)
    plan = _plan_folds(list(g.nodes), g.tensors, g.outputs)
    stem_convs = [n for n in g.nodes if n.op == "CONV2D"
                  and n.outputs[0] in plan.stem_stage]
    assert len(stem_convs) >= 2
    # first conv (RGB input) chains qbf16 into the second
    first = stem_convs[0].outputs[0]
    assert plan.stem_emit[first] == "qbf16"
    # the stage exit emits folded int8 by default; with
    # TAT_QBF16_EXIT=1 it stays bf16 (qbf16x) and still seeds the
    # downstream fold chain (mechanism kept; default off — measured
    # net-negative, docs/KERNELS.md)
    exits = [o for o in plan.stem_emit if plan.stem_emit[o] == "int8"]
    assert exits, plan.stem_emit
    os.environ["TAT_QBF16_EXIT"] = "1"
    try:
        plan2 = _plan_folds(list(g.nodes), g.tensors, g.outputs)
    finally:
        del os.environ["TAT_QBF16_EXIT"]
    exits2 = [o for o, e in plan2.stem_emit.items() if e == "qbf16x"]
    assert exits2 and all(plan2.f(o) > 1 for o in exits2)


@pytest.mark.parametrize("act", ["RELU", "NONE"])
def test_serving_bit_exact_linear(rng, act):
    g = _stem_graph(act)
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    exact = Engine(g, EngineOptions(precision="exact"))
    serving = Engine(g, EngineOptions(precision="serving"))
    oe = exact.run_np(x)
    os_ = serving.run_np(x)
    for k in oe:
        np.testing.assert_array_equal(oe[k], os_[k])


def test_serving_silu_stem_close_to_exact(rng):
    """Shallow SiLU chain: serving (f32 SiLU in the epilogue) tracks
    exact (requantized sigmoid+mul) within small quant noise. Deep
    cascades diverge by design — the tiers' SiLU semantics differ and
    exact's doubly-quantized sigmoid loses precision (ACCURACY.md shows
    serving lands CLOSER to the f32 oracle than exact does)."""
    g = _stem_graph("SILU")
    x = rng.integers(-64, 64, (1, 64, 64, 3), dtype=np.int8)
    exact = Engine(g, EngineOptions(precision="exact"))
    serving = Engine(g, EngineOptions(precision="serving"))
    oe = exact.run_np(x)
    os_ = serving.run_np(x)
    for k in oe:
        d = np.abs(oe[k].astype(np.int32) - os_[k].astype(np.int32))
        assert d.mean() < 3.0, (k, d.mean(), d.max())


def test_stem_stage_bitwise_equals_legacy_path(rng):
    """The qbf16 stem stage must be a pure optimization: full yolov5n
    serving output is bit-identical with the stage disabled.

    Both sides run the default exp-exact SiLU."""
    from thingino_accel_tpu.runtime import executor as EX

    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    x = rng.integers(-64, 64, (1, 64, 64, 3), dtype=np.int8)
    with_stage = Engine(g, EngineOptions(precision="serving")).run_np(x)
    orig = EX._plan_folds

    def no_stage(nodes, tensors, *a, **kw):
        p = orig(nodes, tensors, *a, **kw)
        p.stem_stage = set()
        p.stem_emit = {}
        return p

    EX._plan_folds = no_stage
    try:
        legacy = Engine(g, EngineOptions(precision="serving")).run_np(x)
    finally:
        EX._plan_folds = orig
    for k in with_stage:
        np.testing.assert_array_equal(with_stage[k], legacy[k])


@pytest.mark.parametrize("act", ["RELU", "SILU"])
def test_stem_nogrow_bitwise_equals_grown(rng, act, monkeypatch):
    """``TAT_STEM_NOGROW=1`` limits the XLA stem stage to the cin<16
    seed convs; the conv it would grow into (3x3 s2) runs on the folded
    pallas path instead. Must be a pure scheduling choice: bit-identical
    to the grown stage on both RELU (kernel epilogue) and SiLU (f32
    pre-activation epilogue) chains, and bit-exact vs the exact tier on
    the linear/RELU contract."""
    g = _stem_graph(act)
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    monkeypatch.delenv("TAT_STEM_NOGROW", raising=False)
    grown = Engine(g, EngineOptions(precision="serving")).run_np(x)
    monkeypatch.setenv("TAT_STEM_NOGROW", "1")
    nogrow = Engine(g, EngineOptions(precision="serving")).run_np(x)
    for k in grown:
        np.testing.assert_array_equal(grown[k], nogrow[k])
    if act == "RELU":
        exact = Engine(g, EngineOptions(precision="exact")).run_np(x)
        for k in exact:
            np.testing.assert_array_equal(exact[k], nogrow[k])


def test_stem_nogrow_plan_yolov5s(monkeypatch):
    """Under the knob the yolov5s stage is exactly the stem conv,
    emitting folded int8 (f=4 on the 32-channel output); the grown
    plan's second stage conv leaves the stage."""
    g = zoo.build_yolov5("s", zoo.ZooConfig(dtype="int8",
                                            in_hw=(640, 640)))
    g = fuse_act_into_conv(g)
    monkeypatch.setenv("TAT_STEM_NOGROW", "1")
    plan = _plan_folds(list(g.nodes), g.tensors, g.outputs)
    assert len(plan.stem_stage) == 1
    (out,) = plan.stem_stage
    assert plan.stem_emit[out] == "int8" and plan.f(out) == 4


def test_sppf_with_residual_consumer(rng):
    """A 1x1 conv over an SPPF concat that ALSO carries a fused
    residual: the SPPF fast path declines (residual set), the virtual
    concat must materialize the skipped pools on demand."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("sppfres", cfg)
    # 32-ch input & 128-ch pyramid -> fold-1 layouts (the real SPPF
    # runs at C>=256; thin stems fold and are not SPPF-shaped)
    x = b.input("input", (1, 16, 16, 32))
    y0 = b.conv(x, 128, 3, 1, act="RELU")
    m1 = b.maxpool(y0, 5, 1)
    m2 = b.maxpool(m1, 5, 1)
    m3 = b.maxpool(m2, 5, 1)
    cat = b.concat([y0, m1, m2, m3])
    r = b.conv(y0, 128, 1, 1, act="RELU")
    z = b.conv(cat, 128, 1, 1, act="RELU")
    out = b.add(z, r)
    g = b.finish([out])

    xin = rng.integers(-64, 64, (1, 16, 16, 32), dtype=np.int8)
    oe = Engine(g, EngineOptions(precision="exact")).run_np(xin)
    os_ = Engine(g, EngineOptions(precision="serving")).run_np(xin)
    for k in oe:
        d = np.abs(oe[k].astype(np.int32) - os_[k].astype(np.int32))
        assert d.max() <= 1, (k, d.max())


def test_sppf_plain_matches_exact(rng):
    """SPPF pattern (pools + concat + 1x1, RELU) through the fused
    kernel == exact tier (linear contract)."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("sppf", cfg)
    x = b.input("input", (1, 16, 16, 32))
    y0 = b.conv(x, 128, 3, 1, act="RELU")
    m1 = b.maxpool(y0, 5, 1)
    m2 = b.maxpool(m1, 5, 1)
    m3 = b.maxpool(m2, 5, 1)
    cat = b.concat([y0, m1, m2, m3])
    z = b.conv(cat, 128, 1, 1, act="RELU")
    g = b.finish([z])

    from thingino_accel_tpu.runtime.executor import _plan_folds
    plan = _plan_folds(list(g.nodes), g.tensors, g.outputs)
    assert plan.sppf, "SPPF pattern should be detected"

    xin = rng.integers(-64, 64, (1, 16, 16, 32), dtype=np.int8)
    oe = Engine(g, EngineOptions(precision="exact")).run_np(xin)
    os_ = Engine(g, EngineOptions(precision="serving")).run_np(xin)
    for k in oe:
        np.testing.assert_array_equal(oe[k], os_[k])


def test_res_fuse_skipped_when_conv_out_is_graph_output(rng):
    """A conv output that is both the single ADD input AND a graph
    output must stay materialized (code-review regression: the fusion
    used to store only the ADD's name -> KeyError at output
    collection)."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("resout", cfg)
    x = b.input("input", (1, 16, 16, 32))
    z = b.conv(x, 32, 3, 1, act="RELU")
    r = b.conv(x, 32, 1, 1, act="RELU")
    s = b.add(z, r)
    g = b.finish([z, s])   # conv output exposed alongside the sum

    xin = rng.integers(-64, 64, (1, 16, 16, 32), dtype=np.int8)
    oe = Engine(g, EngineOptions(precision="exact")).run_np(xin)
    os_ = Engine(g, EngineOptions(precision="serving")).run_np(xin)
    for k in oe:
        d = np.abs(oe[k].astype(np.int32) - os_[k].astype(np.int32))
        assert d.max() <= 1, (k, d.max())


def test_random_relu_graphs_serving_close_to_exact(rng):
    """Property hardening: random small RELU-only graphs (convs of all
    shapes, adds, concats, maxpools, upsamples) through the serving
    tier stay within one quantum of exact — fused residual adds are the
    only sanctioned divergence on linear graphs."""
    for seed in range(4):
        r = np.random.default_rng(seed)
        cfg = zoo.ZooConfig(dtype="int8", in_hw=(32, 32), seed=seed)
        b = zoo.GraphBuilder(f"rand{seed}", cfg)
        cin = int(r.choice([3, 16, 32]))
        x = b.input("input", (1, 32, 32, cin))
        vals = [b.conv(x, int(r.choice([16, 32, 64])),
                       int(r.choice([1, 3, 6])), int(r.choice([1, 2])),
                       act="RELU")]
        for _ in range(5):
            op = r.choice(["conv", "add", "concat", "pool", "up"])
            src = vals[-1]
            shp = b.graph.tensors[src].shape
            if op == "conv":
                vals.append(b.conv(src, int(r.choice([16, 32, 64])),
                                   int(r.choice([1, 3])),
                                   int(r.choice([1, 2])), act="RELU"))
            elif op == "add":
                other = b.conv(src, shp[3], 1, 1, act="RELU")
                vals.append(b.add(src, other))
            elif op == "concat":
                other = b.conv(src, int(r.choice([16, 32])), 1, 1,
                               act="RELU")
                cat = b.concat([src, other])
                vals.append(b.conv(cat, 32, 1, 1, act="RELU"))
            elif op == "pool" and shp[1] >= 4:
                vals.append(b.maxpool(src, 3, 1))
            elif op == "up" and shp[1] <= 32:
                vals.append(b.upsample(src))
        g = b.finish([vals[-1]])

        xin = r.integers(-64, 64, (1, 32, 32, cin), dtype=np.int8)
        oe = Engine(g, EngineOptions(precision="exact")).run_np(xin)
        os_ = Engine(g, EngineOptions(precision="serving")).run_np(xin)
        for k in oe:
            d = np.abs(oe[k].astype(np.int32) - os_[k].astype(np.int32))
            assert d.max() <= 1, (seed, k, d.max(), d.mean())


def _bneck_graph(act: str, c: int = 32, hw: int = 16, shortcut=True,
                 extra_consumer=False):
    """x -> conv16(3x3/1) -> [1x1 -> 3x3 (+x)] C3-style bottleneck."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(hw, hw))
    b = zoo.GraphBuilder("bneck", cfg)
    x0 = b.input("input", (1, hw, hw, 16))
    x = b.conv(x0, c, 3, 1, act=act)
    m = b.conv(x, c // 2, 1, 1, act=act)
    y = b.conv(m, c, 3, 1, act=act)
    outs = []
    if extra_consumer:
        outs.append(b.conv(m, 16, 1, 1, act=act))
    if shortcut:
        y = b.add(x, y)
    return b.finish([y] + outs)


@pytest.mark.parametrize("act,shortcut", [
    ("RELU", True), ("RELU", False),
])
def test_bottleneck_fusion_matches_exact(rng, act, shortcut):
    """The fused 1x1->3x3 bottleneck pair stays within one quantum of
    the exact tier on linear graphs."""
    g = _bneck_graph(act, shortcut=shortcut)
    g2 = fuse_act_into_conv(g)
    plan = _plan_folds(list(g2.nodes), g2.tensors, g2.outputs)
    assert plan.bneck, "bottleneck pair not planned"
    x = rng.integers(-100, 100, (1, 16, 16, 16), dtype=np.int8)
    oe = Engine(g, EngineOptions(precision="exact")).run_np(x)
    os_ = Engine(g, EngineOptions(precision="serving")).run_np(x)
    tol = 1
    for k in oe:
        d = np.abs(oe[k].astype(np.int32) - os_[k].astype(np.int32))
        assert d.max() <= tol, (act, k, d.max())


def test_bottleneck_fusion_bitwise_equals_pairwise(rng):
    """The fused pair must be BIT-IDENTICAL to the pairwise serving
    path (same two quantizations, same epilogue math) — SiLU included."""
    from thingino_accel_tpu.runtime import executor as EX
    g = _bneck_graph("SILU", shortcut=True)
    x = rng.integers(-100, 100, (1, 16, 16, 16), dtype=np.int8)
    got = Engine(g, EngineOptions(precision="serving")).run_np(x)
    orig = EX._plan_folds

    def no_bneck(nodes, tensors, outs):
        p = orig(nodes, tensors, outs)
        p.bneck = {}
        return p

    EX._plan_folds = no_bneck
    try:
        ref = Engine(g, EngineOptions(precision="serving")).run_np(x)
    finally:
        EX._plan_folds = orig
    for k in ref:
        np.testing.assert_array_equal(got[k], ref[k])


def test_bottleneck_not_fused_with_extra_consumer(rng):
    """An intermediate with a second consumer must NOT be deferred."""
    g = _bneck_graph("RELU", extra_consumer=True)
    g2 = fuse_act_into_conv(g)
    plan = _plan_folds(list(g2.nodes), g2.tensors, g2.outputs)
    assert not plan.bneck
    x = rng.integers(-100, 100, (1, 16, 16, 16), dtype=np.int8)
    oe = Engine(g, EngineOptions(precision="exact")).run_np(x)
    os_ = Engine(g, EngineOptions(precision="serving")).run_np(x)
    for k in oe:
        d = np.abs(oe[k].astype(np.int32) - os_[k].astype(np.int32))
        assert d.max() <= 1, (k, d.max())


def test_bottleneck_fused_on_yolov5s_plan():
    g = zoo.build_yolov5("s", zoo.ZooConfig(dtype="int8",
                                            in_hw=(640, 640)))
    g = fuse_act_into_conv(g)
    plan = _plan_folds(list(g.nodes), g.tensors, g.outputs)
    # yolov5s has 8 backbone (shortcut) + 5 head (plain) bottlenecks
    assert len(plan.bneck) >= 8, len(plan.bneck)


def test_fast_silu_within_one_quantum_of_exact_silu(rng, monkeypatch):
    """Per LAYER, the rational fast-sigmoid epilogue stays within one
    int8 quantum of the exp-exact path (|silu err| < 6e-3 is far under
    half a quantum at zoo scales — only exact rounding boundaries can
    flip). Through a cascade the single-quantum flips compound, so the
    deep bound is on the mean."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("silu1", cfg)
    x0 = b.input("input", (1, 16, 16, 16))
    y = b.conv(x0, 32, 3, 1, act="SILU")
    g1 = b.finish([y])
    x = rng.integers(-100, 100, (1, 16, 16, 16), dtype=np.int8)
    monkeypatch.setenv("TAT_FAST_SILU", "1")
    fast = Engine(g1, EngineOptions(precision="serving")).run_np(x)
    monkeypatch.delenv("TAT_FAST_SILU")
    exact = Engine(g1, EngineOptions(precision="serving")).run_np(x)
    for k in fast:
        d = np.abs(fast[k].astype(np.int32) - exact[k].astype(np.int32))
        assert d.max() <= 1, (k, d.max(), (d > 0).mean())

    # cascade (conv -> 1x1 -> 3x3 + residual): flips compound but stay
    # rare and small
    g2 = _bneck_graph("SILU", shortcut=True)
    monkeypatch.setenv("TAT_FAST_SILU", "1")
    fast2 = Engine(g2, EngineOptions(precision="serving")).run_np(x)
    monkeypatch.delenv("TAT_FAST_SILU")
    exact2 = Engine(g2, EngineOptions(precision="serving")).run_np(x)
    for k in fast2:
        d = np.abs(fast2[k].astype(np.int32) - exact2[k].astype(np.int32))
        assert d.mean() < 0.1 and d.max() <= 4, (k, d.max(), d.mean())


def test_leaky_relu_serving_bit_exact(rng):
    """LEAKY_RELU convs: serving == exact BIT FOR BIT. The reference
    applies alpha on the already-requantized int8 value (C trunc,
    mars_runtime.c:1078-1082); the serving epilogue must do the same —
    applying alpha on the f32 pre-activation diverged by up to
    alpha*128/out_scale quanta on saturated negatives, which compounds
    into garbage on leaky-everywhere nets (the round-3 nanodet bug)."""
    g = zoo.build_nanodet(zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    x = rng.integers(-100, 100, (1, 64, 64, 3), dtype=np.int8)
    oe = Engine(g, EngineOptions(precision="exact")).run_np(x)
    os_ = Engine(g, EngineOptions(precision="serving")).run_np(x)
    for k in oe:
        np.testing.assert_array_equal(oe[k], os_[k])


def test_serving_bf16_compute_bitwise_equals_int8(rng, monkeypatch):
    """TAT_SERVING_COMPUTE=bf16 (int8 I/O, bf16 MXU, f32 accumulation)
    is bit-identical to the int8-compute serving tier on graphs whose
    convs satisfy K*K*C <= 1024 (exact f32 accumulation range) — the
    compute dtype must be a pure perf knob there."""
    g = _stem_graph("SILU")
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    base = Engine(g, EngineOptions(precision="serving")).run_np(x)
    monkeypatch.setenv("TAT_SERVING_COMPUTE", "bf16")
    got = Engine(g, EngineOptions(precision="serving")).run_np(x)
    for k in base:
        np.testing.assert_array_equal(base[k], got[k])


def test_serving_bf16_compute_yolov5n_close(rng, monkeypatch):
    """Full yolov5n plan (bottleneck/SPPF/concat fusions active) under
    bf16 compute: wide convs exceed the exact-accumulation bound, so
    allow quantum-level drift only."""
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8",
                                            in_hw=(160, 160)))
    x = rng.integers(-128, 128, (1, 160, 160, 3), dtype=np.int8)
    base = Engine(g, EngineOptions(precision="serving")).run_np(x)
    monkeypatch.setenv("TAT_SERVING_COMPUTE", "bf16")
    got = Engine(g, EngineOptions(precision="serving")).run_np(x)
    for k in base:
        d = np.abs(base[k].astype(np.int32) - got[k].astype(np.int32))
        assert d.max() <= 1, (k, d.max(), (d > 0).mean())
