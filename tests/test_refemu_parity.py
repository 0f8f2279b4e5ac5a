"""Two-implementation bit-parity: the TPU engine vs the reference-runtime
emulator on well-formed generated models (the SURVEY §4 carry-over: every
kernel paired with a scalar reference and compared).

The bundled model files all trip reference inconsistencies (packed
weights misindexed, fp16 biases misread — docs/DIVERGENCES.md), so
parity is pinned on models written by our own serializer with clean
descriptors: NHWC features, OHWI int8 weights, int32 bias, real scales —
exactly what conv2d_int8_nhwc_mxu expects.
"""

import numpy as np
import pytest

from thingino_accel_tpu.formats import mars as M
from thingino_accel_tpu.runtime import Engine, EngineOptions
from thingino_accel_tpu.testing.refemu import RefEmulator


def make_conv_model(rng, in_hw=(12, 14), in_c=5, out_c=7, k=3,
                    stride=1, pad=M.Padding.SAME, act=M.Activation.NONE,
                    scales=(0.05, 0.002, 0.04)):
    h, w = in_hw
    if pad == M.Padding.SAME:
        oh, ow = -(-h // stride), -(-w // stride)
    else:
        oh, ow = (h - k) // stride + 1, (w - k) // stride + 1
    in_s, w_s, out_s = scales
    weights = rng.integers(-128, 128, (out_c, k, k, in_c), dtype=np.int8)
    bias = rng.integers(-2000, 2000, (out_c,), dtype=np.int32)
    tensors = [
        M.MarsTensor(0, "input", M.DType.INT8, M.Format.NHWC,
                     (1, h, w, in_c), scale=in_s),
        M.MarsTensor(1, "w", M.DType.INT8, M.Format.OHWI,
                     (out_c, k, k, in_c), scale=w_s),
        M.MarsTensor(2, "b", M.DType.INT32, M.Format.D1, (out_c,)),
        M.MarsTensor(3, "out", M.DType.INT8, M.Format.NHWC,
                     (1, oh, ow, out_c), scale=out_s),
    ]
    layers = [M.MarsLayer(0, M.LayerType.CONV2D, (0,), (3,),
                          M.ConvParams(kernel_h=k, kernel_w=k,
                                       stride_h=stride, stride_w=stride,
                                       padding=pad, activation=act,
                                       weight_tensor_id=1,
                                       bias_tensor_id=2))]
    return M.build_mars(tensors, layers, [0], [3],
                        {1: weights, 2: bias})


def run_both(model, x):
    emu = RefEmulator(model)
    emu.set_input(x)
    emu.run()
    ref = emu.get_output()

    eng = Engine.from_mars(model)
    got = list(eng.run_np(x[None] if x.ndim == 3 else x).values())[0]
    return ref, got.reshape(ref.shape)


@pytest.mark.parametrize("stride,pad,act", [
    (1, M.Padding.SAME, M.Activation.NONE),
    (1, M.Padding.SAME, M.Activation.RELU),
    (2, M.Padding.VALID, M.Activation.NONE),
    (2, M.Padding.SAME, M.Activation.RELU),
])
def test_conv_bit_parity(rng, stride, pad, act):
    model = make_conv_model(rng, stride=stride, pad=pad, act=act)
    x = rng.integers(-128, 128, (12, 14, 5), dtype=np.int8)
    ref, got = run_both(model, x)
    np.testing.assert_array_equal(got, ref)


def test_conv_relu_maxpool_pipeline_parity(rng):
    """The mars_inference_test.c pipeline shape: conv3x3 -> relu -> pool."""
    h, w, in_c, out_c = 12, 12, 4, 6
    weights = rng.integers(-128, 128, (out_c, 3, 3, in_c), dtype=np.int8)
    bias = rng.integers(-500, 500, (out_c,), dtype=np.int32)
    tensors = [
        M.MarsTensor(0, "in", M.DType.INT8, M.Format.NHWC,
                     (1, h, w, in_c), scale=0.1),
        M.MarsTensor(1, "w", M.DType.INT8, M.Format.OHWI,
                     (out_c, 3, 3, in_c), scale=0.01),
        M.MarsTensor(2, "b", M.DType.INT32, M.Format.D1, (out_c,)),
        M.MarsTensor(3, "c1", M.DType.INT8, M.Format.NHWC,
                     (1, h, w, out_c), scale=0.2),
        M.MarsTensor(4, "r1", M.DType.INT8, M.Format.NHWC,
                     (1, h, w, out_c), scale=0.2),
        M.MarsTensor(5, "out", M.DType.INT8, M.Format.NHWC,
                     (1, h // 2, w // 2, out_c), scale=0.2),
    ]
    layers = [
        M.MarsLayer(0, M.LayerType.CONV2D, (0,), (3,),
                    M.ConvParams(kernel_h=3, kernel_w=3,
                                 padding=M.Padding.SAME,
                                 weight_tensor_id=1, bias_tensor_id=2)),
        M.MarsLayer(1, M.LayerType.RELU, (3,), (4,), M.ActParams()),
        M.MarsLayer(2, M.LayerType.MAXPOOL, (4,), (5,),
                    M.PoolParams(kernel_h=2, kernel_w=2,
                                 stride_h=2, stride_w=2)),
    ]
    model = M.build_mars(tensors, layers, [0], [5], {1: weights, 2: bias})
    x = rng.integers(-128, 128, (h, w, in_c), dtype=np.int8)
    ref, got = run_both(model, x)
    np.testing.assert_array_equal(got, ref)


def test_elementwise_chain_parity(rng):
    """sigmoid -> mul (the SiLU pattern) in compat (unfused) mode matches
    the emulator bit-for-bit except <=1 quantum on exp disagreements."""
    n = 1, 6, 6, 4
    tensors = [
        M.MarsTensor(0, "in", M.DType.INT8, M.Format.NHWC, n, scale=0.08),
        M.MarsTensor(1, "sig", M.DType.INT8, M.Format.NHWC, n,
                     scale=1 / 256),
        M.MarsTensor(2, "out", M.DType.INT8, M.Format.NHWC, n, scale=0.05),
    ]
    layers = [
        M.MarsLayer(0, M.LayerType.SIGMOID, (0,), (1,), M.ActParams()),
        M.MarsLayer(1, M.LayerType.MUL, (0, 1), (2,), M.ActParams()),
    ]
    model = M.build_mars(tensors, layers, [0], [2], {})
    x = rng.integers(-128, 128, n[1:], dtype=np.int8)

    emu = RefEmulator(model)
    emu.set_input(x)
    emu.run()
    ref = emu.get_output()

    eng = Engine.from_mars(model, EngineOptions(mode="compat"))
    got = list(eng.run_np(x[None]).values())[0].reshape(ref.shape)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.995


def test_f32_conv_parity(rng):
    """f32 conv: engine matches the C summation within float tolerance."""
    h, w, in_c, out_c = 8, 8, 3, 4
    weights = rng.normal(size=(out_c, in_c, 3, 3)).astype(np.float32)
    bias = rng.normal(size=(out_c,)).astype(np.float32)
    tensors = [
        M.MarsTensor(0, "in", M.DType.FLOAT32, M.Format.NCHW,
                     (1, in_c, h, w)),
        M.MarsTensor(1, "w", M.DType.FLOAT32, M.Format.OIHW,
                     (out_c, in_c, 3, 3)),
        M.MarsTensor(2, "b", M.DType.FLOAT32, M.Format.D1, (out_c,)),
        M.MarsTensor(3, "out", M.DType.FLOAT32, M.Format.NCHW,
                     (1, out_c, h - 2, w - 2)),
    ]
    layers = [M.MarsLayer(0, M.LayerType.CONV2D, (0,), (3,),
                          M.ConvParams(kernel_h=3, kernel_w=3,
                                       padding=M.Padding.VALID,
                                       weight_tensor_id=1,
                                       bias_tensor_id=2))]
    model = M.build_mars(tensors, layers, [0], [3], {1: weights, 2: bias})

    emu = RefEmulator(model)
    emu.set_input(np.zeros((in_c, h, w), np.float32))
    x = rng.normal(size=(1, in_c, h, w)).astype(np.float32)
    emu.set_input(x[0])
    emu.run()
    ref = emu.get_output()    # NCHW

    eng = Engine.from_mars(model)
    got = list(eng.run_np(np.transpose(x, (0, 2, 3, 1))).values())[0]
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2))[0],
                               ref.reshape(out_c, h - 2, w - 2),
                               rtol=1e-4, atol=1e-4)


def test_stale_buffer_semantics_documented(rng):
    """The emulator reproduces the reference's pass-through-layer
    behavior: a SOFTMAX 'executes' but its output tensor just aliases a
    stale work buffer (mars_runtime.c:1211-1213 + round-robin planner)."""
    n = (1, 4, 4, 2)
    tensors = [
        M.MarsTensor(0, "in", M.DType.INT8, M.Format.NHWC, n, scale=1.0),
        M.MarsTensor(1, "mid", M.DType.INT8, M.Format.NHWC, n, scale=1.0),
        M.MarsTensor(2, "out", M.DType.INT8, M.Format.NHWC, n, scale=1.0),
    ]
    layers = [
        M.MarsLayer(0, M.LayerType.RELU, (0,), (1,), M.ActParams()),
        M.MarsLayer(1, M.LayerType.SOFTMAX, (1,), (2,), M.ActParams()),
    ]
    model = M.build_mars(tensors, layers, [0], [2], {})
    emu = RefEmulator(model, num_buffers=3)
    x = rng.integers(-128, 128, n[1:], dtype=np.int8)
    emu.set_input(x)
    emu.run()
    out = emu.get_output()
    # tensor 'out' aliases buffer 2, never written -> zeros (stale init)
    np.testing.assert_array_equal(out, np.zeros(n, np.int8))
