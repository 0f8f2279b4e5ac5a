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


def test_ptq_fc_per_channel():
    """FC weights are [K, O]: per-channel scales must be per OUTPUT
    channel (last axis), and the exact engine must apply them in the FC
    requantize epilogue (not the mean scale)."""
    from thingino_accel_tpu.formats import onnx_proto as OP
    from thingino_accel_tpu.formats import onnx_writer as W
    from thingino_accel_tpu.formats.onnx import import_onnx

    rng = np.random.default_rng(3)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    # strongly non-uniform per-output-channel magnitudes
    fw = (rng.normal(size=(6, 8 * 4 * 4)) *
          np.geomspace(0.01, 10.0, 6)[:, None]).astype(np.float32)
    fb = rng.normal(size=(6,)).astype(np.float32)
    m = W.build_model(
        nodes=[
            ("Conv", ["x", "w"], ["c"],
             dict(kernel_shape=(3, 3), pads=(1, 1, 1, 1))),
            ("Relu", ["c"], ["r"], None),
            ("Flatten", ["r"], ["f"], dict(axis=1)),
            ("Gemm", ["f", "fw", "fb"], ["y"], dict(transB=1)),
        ],
        inputs={"x": ((1, 3, 4, 4), OP.TP_FLOAT)},
        outputs={"y": ((1, 6), OP.TP_FLOAT)},
        initializers={"w": w, "fw": fw, "fb": fb},
    )
    g = import_onnx(m, float32=True)
    gq = ptq.quantize_model(g, _calib_batches(g))   # raised ValueError before

    # weight scales per OUTPUT channel: [O] = 6
    fc_w = next(t for n, t in gq.tensors.items()
                if t.is_const and t.channel_scales is not None
                and t.data.ndim == 2)
    assert fc_w.channel_scales.shape == (6,)

    # int8 engine tracks the f32 engine through the FC
    eng_f, eng_q = Engine(g), Engine(gq)
    x = np.random.default_rng(5).normal(
        scale=0.5, size=(1, 4, 4, 3)).astype(np.float32)
    ref = list(eng_f.run_np(x).values())[0]
    in_s = gq.tensors[gq.inputs[0]].quant.scale
    qi = list(eng_q.run_np(
        np.clip(np.round(x / in_s), -128, 127).astype(np.int8)).values())[0]
    deq = qi.astype(np.float32) * gq.tensors[gq.outputs[0]].quant.scale
    cc = np.corrcoef(deq.reshape(-1), ref.reshape(-1))[0, 1]
    assert cc > 0.98, f"per-channel FC PTQ accuracy too low: cc={cc}"


def _quant_mse(x, clip):
    s = clip / 127.0
    q = np.clip(np.round(x / s), -128, 127) * s
    return float(np.mean((q - x) ** 2))


def test_mse_scale_minimizes_quant_error():
    """The chosen clip is the grid argmin of quantization MSE (in
    particular never worse than plain absmax), and ~absmax on uniform
    data where no clipping helps."""
    rng = np.random.default_rng(0)
    heavy = np.abs(np.concatenate([
        rng.normal(0, 0.5, 60000).astype(np.float32), [8.0]]))
    clip = ptq._mse_scale(heavy, float(heavy.max()))
    assert clip < float(heavy.max())            # some clipping wins
    got = _quant_mse(heavy, clip)
    assert got <= _quant_mse(heavy, float(heavy.max())) + 1e-12
    for frac in np.linspace(0.15, 1.0, 40):
        assert got <= _quant_mse(heavy, frac * float(heavy.max())) \
            + 1e-9, frac

    flat = np.abs(rng.uniform(-1, 1, 60000).astype(np.float32))
    clip2 = ptq._mse_scale(flat, float(flat.max()))
    assert clip2 > 0.85 * flat.max(), (clip2, flat.max())


def test_calibrate_mse_method_end_to_end():
    from thingino_accel_tpu.models import zoo

    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(16, 16)))
    rng = np.random.default_rng(1)
    batches = [{g.inputs[0]: rng.normal(0, 1, (1, 16, 16, 3))
                .astype(np.float32)} for _ in range(2)]
    stats = ptq.calibrate(g, iter(batches), method="mse")
    assert stats.absmax          # every activation got a scale
    gq = ptq.quantize_graph(g, stats)
    gq.validate()
    assert all(np.dtype(t.dtype) == np.int8
               for n, t in gq.tensors.items()
               if not t.is_const and n in gq.tensors)


def test_cli_quantize_roundtrip(tmp_path):
    """`cli quantize` : f32 .mars -> calibrated int8 .mars that loads
    and runs on the exact tier (the scripts/quantize_onnx.py role)."""
    from conftest import reference_model
    from thingino_accel_tpu.cli import main as cli_main
    from thingino_accel_tpu.runtime import Engine

    out = str(tmp_path / "tiny_q.mars")
    rc = cli_main(["quantize", "-i", reference_model("tiny_160_f32.mars"),
                   "-o", out, "--batches", "2"])
    assert rc == 0
    eng = Engine.from_mars(out)
    x = np.random.default_rng(0).integers(
        -128, 128, (1, 160, 160, 3), dtype=np.int8)
    (v,) = eng.run_np(x).values()
    assert v.dtype == np.int8 and v.shape == (1, 154, 154, 64)
