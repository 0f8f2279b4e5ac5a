"""ONNX importer tests: writer->importer round trips with torch as the
semantics oracle, plus the real reference-exported ONNX files."""

import os

import numpy as np
import pytest
import torch

from thingino_accel_tpu.formats import onnx_proto as OP
from thingino_accel_tpu.formats import onnx_writer as W
from thingino_accel_tpu.formats.onnx import import_onnx
from thingino_accel_tpu.runtime import Engine

MGK_DIR = "/root/reference/mgk-decompiler"


def run_engine(g, feed):
    eng = Engine(g)
    return eng.run_np(**feed)


def test_conv_relu_vs_torch(rng, highest_precision):
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    m = W.build_model(
        nodes=[
            ("Conv", ["x", "w", "b"], ["c"],
             dict(kernel_shape=(3, 3), strides=(2, 2), pads=(1, 1, 1, 1))),
            ("Relu", ["c"], ["y"], None),
        ],
        inputs={"x": ((1, 3, 16, 16), OP.TP_FLOAT)},
        outputs={"y": ((1, 8, 8, 8), OP.TP_FLOAT)},
        initializers={"w": w, "b": b},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    got = list(run_engine(g, {"x": np.transpose(x, (0, 2, 3, 1))}).values())[0]
    ref = torch.relu(torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=2, padding=1)).numpy()
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-4, atol=1e-5)


def test_batchnorm_fold_vs_torch(rng, highest_precision):
    c = 6
    w = rng.normal(size=(c, 3, 1, 1)).astype(np.float32)
    gamma = rng.uniform(0.5, 2, c).astype(np.float32)
    beta = rng.normal(size=c).astype(np.float32)
    mean = rng.normal(size=c).astype(np.float32)
    var = rng.uniform(0.5, 2, c).astype(np.float32)
    m = W.build_model(
        nodes=[
            ("Conv", ["x", "w"], ["c"], dict(kernel_shape=(1, 1))),
            ("BatchNormalization",
             ["c", "gamma", "beta", "mean", "var"], ["y"],
             dict(epsilon=1e-5)),
        ],
        inputs={"x": ((1, 3, 4, 4), OP.TP_FLOAT)},
        outputs={"y": ((1, c, 4, 4), OP.TP_FLOAT)},
        initializers={"w": w, "gamma": gamma, "beta": beta,
                      "mean": mean, "var": var},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(1, 3, 4, 4)).astype(np.float32)
    got = list(run_engine(g, {"x": np.transpose(x, (0, 2, 3, 1))}).values())[0]
    with torch.no_grad():
        bn = torch.nn.BatchNorm2d(c, eps=1e-5).eval()
        bn.weight.copy_(torch.tensor(gamma))
        bn.bias.copy_(torch.tensor(beta))
        bn.running_mean.copy_(torch.tensor(mean))
        bn.running_var.copy_(torch.tensor(var))
        ref = bn(torch.nn.functional.conv2d(
            torch.tensor(x), torch.tensor(w))).numpy()
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-3, atol=1e-4)


def test_gru_vs_torch(rng, highest_precision):
    t_len, b_sz, c, h = 5, 2, 4, 3
    w = rng.normal(size=(1, 3 * h, c)).astype(np.float32)
    r = rng.normal(size=(1, 3 * h, h)).astype(np.float32)
    bias = rng.normal(size=(1, 6 * h)).astype(np.float32)
    m = W.build_model(
        nodes=[("GRU", ["x", "w", "r", "b"], ["y", "yh"],
                dict(hidden_size=h, linear_before_reset=1))],
        inputs={"x": ((t_len, b_sz, c), OP.TP_FLOAT)},
        outputs={"y": ((t_len, 1, b_sz, h), OP.TP_FLOAT),
                 "yh": ((1, b_sz, h), OP.TP_FLOAT)},
        initializers={"w": w, "r": r, "b": bias},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(t_len, b_sz, c)).astype(np.float32)
    out = run_engine(g, {"x": x})
    got_y = out["y"]

    # torch GRU: gates (r,z,n); ONNX order (z,r,h) -> remap
    gru = torch.nn.GRU(c, h)
    wz, wr, wh = w[0, :h], w[0, h:2 * h], w[0, 2 * h:]
    rz, rr, rh = r[0, :h], r[0, h:2 * h], r[0, 2 * h:]
    wbz, wbr, wbh = bias[0, :h], bias[0, h:2 * h], bias[0, 2 * h:3 * h]
    rbz, rbr, rbh = (bias[0, 3 * h:4 * h], bias[0, 4 * h:5 * h],
                     bias[0, 5 * h:])
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.tensor(np.concatenate([wr, wz, wh])))
        gru.weight_hh_l0.copy_(torch.tensor(np.concatenate([rr, rz, rh])))
        gru.bias_ih_l0.copy_(torch.tensor(np.concatenate([wbr, wbz, wbh])))
        gru.bias_hh_l0.copy_(torch.tensor(np.concatenate([rbr, rbz, rbh])))
        ref, ref_h = gru(torch.tensor(x))
    np.testing.assert_allclose(got_y[:, 0], ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(out["yh"][0], ref_h.numpy()[0], rtol=1e-4,
                               atol=1e-5)


def test_conv1d_and_transpose_vs_torch(rng, highest_precision):
    c_in, c_out, ln = 4, 6, 10
    w = rng.normal(size=(c_out, c_in, 2)).astype(np.float32)
    wt = rng.normal(size=(c_out, c_in, 2)).astype(np.float32)  # CT: [I,O,K]
    m = W.build_model(
        nodes=[
            ("Conv", ["x", "w"], ["c"],
             dict(kernel_shape=(2,), strides=(2,), pads=(0, 0))),
            ("ConvTranspose", ["c", "wt"], ["y"],
             dict(kernel_shape=(2,), strides=(2,), pads=(0, 0))),
        ],
        inputs={"x": ((1, c_in, ln), OP.TP_FLOAT)},
        outputs={"y": ((1, c_in, ln), OP.TP_FLOAT)},
        initializers={"w": w, "wt": wt},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(1, c_in, ln)).astype(np.float32)
    got = list(run_engine(g, {"x": x}).values())[0]
    with torch.no_grad():
        mid = torch.nn.functional.conv1d(torch.tensor(x), torch.tensor(w),
                                         stride=2)
        ref = torch.nn.functional.conv_transpose1d(
            mid, torch.tensor(wt), stride=2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_split_slice_pow(rng):
    m = W.build_model(
        nodes=[
            ("Split", ["x"], ["a", "b"], dict(axis=1, split=(2, 2))),
            ("Pow", ["a", "two"], ["p"], None),
            ("Mul", ["p", "b"], ["y"], None),
        ],
        inputs={"x": ((1, 4, 4, 4), OP.TP_FLOAT)},
        outputs={"y": ((1, 2, 4, 4), OP.TP_FLOAT)},
        initializers={"two": np.asarray(2.0, np.float32)},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    got = list(run_engine(g, {"x": np.transpose(x, (0, 2, 3, 1))}).values())[0]
    a, b = x[:, :2], x[:, 2:]
    ref = np.transpose(a ** 2 * b, (0, 2, 3, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_flatten_gemm_vs_torch(rng, highest_precision):
    """Rank-changing Flatten over an NHWC buffer must preserve ONNX's
    NCHW element order (the Gemm weights index it that way)."""
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    fw = rng.normal(size=(10, 8 * 4 * 4)).astype(np.float32)
    fb = rng.normal(size=(10,)).astype(np.float32)
    m = W.build_model(
        nodes=[
            ("Conv", ["x", "w"], ["c"],
             dict(kernel_shape=(3, 3), strides=(1, 1), pads=(1, 1, 1, 1))),
            ("Relu", ["c"], ["r"], None),
            ("Flatten", ["r"], ["f"], dict(axis=1)),
            ("Gemm", ["f", "fw", "fb"], ["y"], dict(transB=1)),
        ],
        inputs={"x": ((2, 3, 4, 4), OP.TP_FLOAT)},
        outputs={"y": ((2, 10), OP.TP_FLOAT)},
        initializers={"w": w, "fw": fw, "fb": fb},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    got = list(run_engine(g, {"x": np.transpose(x, (0, 2, 3, 1))}).values())[0]
    ref = (torch.relu(torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), padding=1)).flatten(1)
        @ torch.tensor(fw).T + torch.tensor(fb)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_reshape_4d_to_4d_vs_numpy(rng):
    """Reshape 4-D -> 4-D follows NCHW element order end to end."""
    m = W.build_model(
        nodes=[
            ("Relu", ["x"], ["r"], None),
            ("Reshape", ["r", "shape"], ["y"], None),
        ],
        inputs={"x": ((1, 4, 6, 2), OP.TP_FLOAT)},
        outputs={"y": ((1, 8, 3, 2), OP.TP_FLOAT)},
        initializers={"shape": np.asarray([1, 8, 3, 2], np.int64)},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(1, 4, 6, 2)).astype(np.float32)
    got = list(run_engine(g, {"x": np.transpose(x, (0, 2, 3, 1))}).values())[0]
    ref = np.maximum(x, 0).reshape(1, 8, 3, 2)
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.exists(MGK_DIR), reason="reference absent")
def test_reference_aec_onnx_runs():
    g = import_onnx(os.path.join(MGK_DIR, "aec_model_with_weights.onnx"),
                    float32=True)
    assert any(n.op == "GRU" for n in g.nodes)
    assert any(n.op == "CONV1D" for n in g.nodes)
    rng = np.random.default_rng(0)
    feed = {i: rng.normal(size=g.tensors[i].shape).astype(np.float32)
            for i in g.inputs}
    out = run_engine(g, feed)
    (v,) = out.values()
    assert v.shape == (1, 256, 2)
    assert np.isfinite(v).all()
    assert 0.0 <= v.min() and v.max() <= 1.0   # sigmoid mask


@pytest.mark.skipif(not os.path.exists(MGK_DIR), reason="reference absent")
def test_reference_yolo_onnx_runs():
    g = import_onnx(os.path.join(MGK_DIR, "yolov5s_t41.onnx"), float32=True)
    assert sum(1 for n in g.nodes if n.op == "CONV2D") > 50
    rng = np.random.default_rng(0)
    feed = {i: rng.normal(size=g.tensors[i].shape).astype(np.float32)
            for i in g.inputs}
    out = run_engine(g, feed)
    for v in out.values():
        assert np.isfinite(v).all()


@pytest.mark.skipif(not os.path.exists(MGK_DIR), reason="reference absent")
def test_cli_compile_onnx_to_mars(tmp_path):
    """The mars-compiler CLI flow: onnx -> .mars -> engine run."""
    from thingino_accel_tpu import cli
    out = str(tmp_path / "y.mars")
    rc = cli.main(["compile", "-i",
                   os.path.join(MGK_DIR, "yolov5s_t41.onnx"),
                   "-o", out, "--float32"])
    assert rc == 0 and os.path.exists(out)
    from thingino_accel_tpu.runtime import Engine
    eng = Engine.from_mars(out)
    x = np.zeros(eng.input_info().shape, np.float32)
    o = eng.run_np(x)
    assert all(np.isfinite(v).all() for v in o.values())


def test_clip_int8_quantized_bounds():
    """CLIP with ONNX real bounds on an int8 tensor clamps the
    QUANTIZED bounds (round(v/scale), the RELU6 rule) — raw real
    bounds on int8 codes would clip at bound*scale instead of bound."""
    import numpy as np
    from thingino_accel_tpu.ir.graph import Graph, Node, TensorInfo, QuantInfo
    from thingino_accel_tpu.runtime import Engine

    sc = 0.05
    t_in = TensorInfo("x", (1, 2, 2, 4), np.dtype(np.int8),
                      quant=QuantInfo(scale=sc))
    t_out = TensorInfo("y", (1, 2, 2, 4), np.dtype(np.int8),
                       quant=QuantInfo(scale=sc))
    g = Graph(nodes=[Node(op="CLIP", inputs=["x"], outputs=["y"],
                          attrs={"min": -1.0, "max": 1.0})],
              tensors={"x": t_in, "y": t_out},
              inputs=["x"], outputs=["y"], name="clip")
    x = np.arange(-64, -48, dtype=np.int8).reshape(1, 2, 2, 4)
    out = Engine(g).run_np(x)["y"]
    assert out.min() == -20                      # round(-1.0 / 0.05)
    x2 = np.arange(48, 64, dtype=np.int8).reshape(1, 2, 2, 4)
    out2 = Engine(g).run_np(x2)["y"]
    assert out2.max() == 20


def test_reshape_zero_copies_positional_dim():
    """Reshape 0-dims copy the input dim at the SAME position (ONNX
    allowzero=0), not in_shape[0]."""
    m = W.build_model(
        nodes=[("Reshape", ["x", "shape"], ["y"], None)],
        inputs={"x": ((2, 6, 4), OP.TP_FLOAT)},
        outputs={"y": ((2, 6, 4), OP.TP_FLOAT)},
        initializers={"shape": np.array([0, 0, -1], np.int64)},
    )
    g = import_onnx(m, float32=True)
    assert g.tensors[g.outputs[0]].shape == (2, 6, 4)
    x = np.arange(48, dtype=np.float32).reshape(2, 6, 4)
    out = list(run_engine(g, {"x": x}).values())[0]
    np.testing.assert_array_equal(out, x)


def test_slice_reverse_step():
    """Negative-step Slice (the exported tensor flip): starts=-1,
    ends=INT_MIN-ish, steps=-1 must reverse the full axis."""
    m = W.build_model(
        nodes=[("Slice", ["x", "st", "en", "ax", "sp"], ["y"], None)],
        inputs={"x": ((2, 8), OP.TP_FLOAT)},
        outputs={"y": ((2, 8), OP.TP_FLOAT)},
        initializers={"st": np.array([-1], np.int64),
                      "en": np.array([-(2 ** 31)], np.int64),
                      "ax": np.array([1], np.int64),
                      "sp": np.array([-1], np.int64)},
    )
    g = import_onnx(m, float32=True)
    assert g.tensors[g.outputs[0]].shape == (2, 8)
    x = np.arange(16, dtype=np.float32).reshape(2, 8)
    out = list(run_engine(g, {"x": x}).values())[0]
    np.testing.assert_array_equal(out, x[:, ::-1])


def test_unsqueeze_multiple_negative_axes():
    """Unsqueeze axes are relative to the OUTPUT rank: (d0, d1) with
    axes [-1, -2] -> (d0, d1, 1, 1)."""
    m = W.build_model(
        nodes=[("Unsqueeze", ["x", "ax"], ["y"], None)],
        inputs={"x": ((2, 3), OP.TP_FLOAT)},
        outputs={"y": ((2, 3, 1, 1), OP.TP_FLOAT)},
        initializers={"ax": np.array([-1, -2], np.int64)},
    )
    g = import_onnx(m, float32=True)
    # ONNX (2, 3, 1, 1); 4-D activations are stored NHWC -> (2, 1, 1, 3)
    assert g.tensors[g.outputs[0]].shape == (2, 1, 1, 3)
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = list(run_engine(g, {"x": x}).values())[0]
    ref = x.reshape(2, 3, 1, 1)            # ONNX result, NCHW order
    np.testing.assert_array_equal(out, ref.transpose(0, 2, 3, 1))


def test_matmul_3d_batch_dims(rng):
    """MatMul([N, T, C] @ [C, O]) keeps the leading dims: the FC
    executor flattens rows, so the importer brackets with reshapes."""
    w = rng.normal(size=(8, 4)).astype(np.float32)
    m = W.build_model(
        nodes=[("MatMul", ["x", "w"], ["y"], None)],
        inputs={"x": ((2, 5, 8), OP.TP_FLOAT)},
        outputs={"y": ((2, 5, 4), OP.TP_FLOAT)},
        initializers={"w": w},
    )
    g = import_onnx(m, float32=True)
    assert g.tensors[g.outputs[0]].shape == (2, 5, 4)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    out = list(run_engine(g, {"x": x}).values())[0]
    np.testing.assert_allclose(out, x @ w, rtol=1e-5, atol=1e-6)


def test_gemm_alpha_beta_folded(rng):
    """Gemm alpha/beta fold into the consts instead of being ignored."""
    w = rng.normal(size=(4, 8)).astype(np.float32)   # transB layout
    b = rng.normal(size=(4,)).astype(np.float32)
    m = W.build_model(
        nodes=[("Gemm", ["x", "w", "b"], ["y"],
                dict(alpha=2.0, beta=0.5, transB=1))],
        inputs={"x": ((2, 8), OP.TP_FLOAT)},
        outputs={"y": ((2, 4), OP.TP_FLOAT)},
        initializers={"w": w, "b": b},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(2, 8)).astype(np.float32)
    out = list(run_engine(g, {"x": x}).values())[0]
    np.testing.assert_allclose(out, 2.0 * (x @ w.T) + 0.5 * b,
                               rtol=1e-5, atol=1e-6)


def test_resize_downsample_rejected():
    """Downsampling Resize must raise, not emit a zero-sized tensor."""
    m = W.build_model(
        nodes=[("Resize", ["x", "", "", "sz"], ["y"],
                dict(mode=b"nearest"))],
        inputs={"x": ((1, 3, 8, 8), OP.TP_FLOAT)},
        outputs={"y": ((1, 3, 4, 4), OP.TP_FLOAT)},
        initializers={"sz": np.array([1, 3, 4, 4], np.int64)},
    )
    with pytest.raises(ValueError, match="integer upscale"):
        import_onnx(m, float32=True)


def test_dq_const_zero_point(rng):
    """DequantizeLinear of a const with zero_point != 0 computes
    (c - zp) * scale in float32 mode (asymmetric uint8 weights)."""
    c = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    m = W.build_model(
        nodes=[("DequantizeLinear", ["c", "sc", "zp"], ["w"], None),
               ("MatMul", ["x", "w"], ["y"], None)],
        inputs={"x": ((2, 4), OP.TP_FLOAT)},
        outputs={"y": ((2, 3), OP.TP_FLOAT)},
        initializers={"c": c, "sc": np.float32(0.1),
                      "zp": np.uint8(128)},
    )
    g = import_onnx(m, float32=True)
    x = rng.normal(size=(2, 4)).astype(np.float32)
    out = list(run_engine(g, {"x": x}).values())[0]
    ref = x @ ((c.astype(np.float32) - 128.0) * 0.1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_cli_export_onnx_roundtrip(tmp_path):
    """.mars -> ONNX -> import -> engine matches the exact int8 tier
    in the dequantized domain (quantization noise only)."""
    from conftest import reference_model
    from thingino_accel_tpu.cli import main as cli_main
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.formats import onnx as O
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.runtime import Engine

    src = reference_model("tiny_160_int8.mars")
    out = str(tmp_path / "tiny.onnx")
    assert cli_main(["export-onnx", "-i", src, "-o", out]) == 0

    g0 = from_mars(M.read_mars(src))
    e0 = Engine(g0)
    e1 = Engine(O.import_onnx(out, float32=True))
    x = np.random.default_rng(0).integers(
        -128, 128, (1, 160, 160, 3), dtype=np.int8)
    in_s = g0.tensors[g0.inputs[0]].quant.scale
    out_s = g0.tensors[g0.outputs[0]].quant.scale
    y1 = next(iter(e1.run_np(x.astype(np.float32) * in_s).values()))
    y0 = next(iter(e0.run_np(x).values())).astype(np.float32) * out_s
    rel = (np.sqrt(np.mean((y0 - y1) ** 2))
           / max(np.sqrt(np.mean(y1 ** 2)), 1e-9))
    assert rel < 0.05
