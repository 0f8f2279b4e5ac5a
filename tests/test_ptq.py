"""PTQ pipeline tests: f32 zoo graph -> calibrate -> int8 graph -> exact
engine, with accuracy sanity vs the f32 original, and a full
ONNX -> PTQ -> .mars round trip (the scripts/quantize_onnx.py +
mars-compiler pipeline, in-framework)."""

import numpy as np
import pytest

from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.runtime import Engine
from thingino_accel_tpu.training import ptq


def _calib_batches(g, n=3, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield {g.inputs[0]: rng.normal(
            scale=0.5, size=g.tensors[g.inputs[0]].shape).astype(np.float32)}


def test_ptq_tiny_accuracy():
    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(32, 32)),
                       in_hw=(32, 32))
    gq = ptq.quantize_model(g, _calib_batches(g))
    assert gq.tensors[gq.outputs[0]].dtype == np.int8

    eng_f = Engine(g)
    eng_q = Engine(gq)
    rng = np.random.default_rng(7)
    x = rng.normal(scale=0.5, size=(1, 32, 32, 3)).astype(np.float32)
    ref = list(eng_f.run_np(x).values())[0]
    qi = list(eng_q.run_np(
        np.clip(np.round(x / gq.tensors[gq.inputs[0]].quant.scale),
                -128, 127).astype(np.int8)).values())[0]
    out_scale = gq.tensors[gq.outputs[0]].quant.scale
    deq = qi.astype(np.float32) * out_scale
    # quantization error bounded: correlation high, error ~ few quanta
    err = np.abs(deq - ref)
    rel = err.mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 0.1, f"relative PTQ error too high: {rel}"
    cc = np.corrcoef(deq.reshape(-1), ref.reshape(-1))[0, 1]
    assert cc > 0.99


def test_ptq_scales_sane():
    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(32, 32)),
                       in_hw=(32, 32))
    stats = ptq.calibrate(g, _calib_batches(g))
    assert all(v > 0 for v in stats.absmax.values())
    gq = ptq.quantize_graph(g, stats)
    for name, t in gq.tensors.items():
        if not t.is_const:
            assert t.quant.scale > 0


def test_ptq_mars_roundtrip():
    """int8 graph from PTQ serializes to .mars and reloads bit-equal."""
    from thingino_accel_tpu.formats.mars import read_mars
    from thingino_accel_tpu.formats.mars_export import export_mars
    from thingino_accel_tpu.ir.graph import from_mars

    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(32, 32)),
                       in_hw=(32, 32))
    gq = ptq.quantize_model(g, _calib_batches(g))
    blob = export_mars(gq)
    g2 = from_mars(read_mars(blob))

    eng1, eng2 = Engine(gq), Engine(g2)
    x = np.random.default_rng(1).integers(
        -100, 100, (1, 32, 32, 3), dtype=np.int8)
    a = list(eng1.run_np(x).values())[0]
    b = list(eng2.run_np(x).values())[0]
    np.testing.assert_array_equal(a, b.reshape(a.shape))
