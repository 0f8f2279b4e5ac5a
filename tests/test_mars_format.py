"""`.mars` format round-trip + bundled-model parsing tests.

Mirrors the role of tools/mars_gen_test.py: struct sizes 76/124/112 and
byte-exact serialization.
"""

import numpy as np
import pytest

from conftest import reference_model
from thingino_accel_tpu.formats import mars as M
from thingino_accel_tpu.formats.packing import (
    pack_nmhwsoib2, unpack_nmhwsoib2, pack_ndhwc32, unpack_ndhwc32,
    nmhwsoib2_size,
)


def _simple_model(rng) -> M.MarsModel:
    w = rng.integers(-128, 128, (16, 3, 3, 3), dtype=np.int8)  # OIHW
    b = rng.integers(-1000, 1000, (16,), dtype=np.int32)
    tensors = [
        M.MarsTensor(0, "input", M.DType.INT8, M.Format.NHWC,
                     (1, 32, 32, 3), scale=0.5),
        M.MarsTensor(1, "w", M.DType.INT8, M.Format.OIHW, (16, 3, 3, 3),
                     scale=0.01),
        M.MarsTensor(2, "b", M.DType.INT32, M.Format.D1, (16,)),
        M.MarsTensor(3, "output", M.DType.INT8, M.Format.NHWC,
                     (1, 32, 32, 16), scale=0.25),
    ]
    layers = [
        M.MarsLayer(0, M.LayerType.CONV2D, (0,), (3,),
                    M.ConvParams(kernel_h=3, kernel_w=3, padding=M.Padding.SAME,
                                 activation=M.Activation.RELU,
                                 weight_tensor_id=1, bias_tensor_id=2)),
    ]
    return M.build_mars(tensors, layers, [0], [3], {1: w, 2: b})


def test_struct_sizes():
    assert M.HEADER_SIZE == 76
    assert M.TENSOR_SIZE == 124
    assert M.LAYER_SIZE == 112


def test_roundtrip(rng):
    model = _simple_model(rng)
    blob = M.write_mars(model)
    back = M.read_mars(blob)
    assert len(back.tensors) == 4 and len(back.layers) == 1
    assert back.input_ids == (0,) and back.output_ids == (3,)
    t = back.tensor(1)
    assert t.shape == (16, 3, 3, 3) and t.dtype == M.DType.INT8
    assert t.scale == pytest.approx(0.01)
    w0 = np.frombuffer(model.weight_bytes(model.tensor(1)).tobytes(), np.int8)
    w1 = np.frombuffer(back.weight_bytes(t).tobytes(), np.int8)
    np.testing.assert_array_equal(w0, w1)
    p = back.layers[0].params
    assert isinstance(p, M.ConvParams)
    assert p.kernel_h == 3 and p.activation == M.Activation.RELU
    assert p.weight_tensor_id == 1 and p.bias_tensor_id == 2
    # serialize again: byte-identical
    assert M.write_mars(back) == blob


def test_layer_param_kinds(rng):
    pool = M.MarsLayer(0, M.LayerType.MAXPOOL, (0,), (1,),
                       M.PoolParams(kernel_h=2, kernel_w=2))
    up = M.MarsLayer(1, M.LayerType.UPSAMPLE, (1,), (2,),
                     M.UpsampleParams(scale_h=2, scale_w=2, mode=0))
    cat = M.MarsLayer(2, M.LayerType.CONCAT, (2, 0), (3,),
                      M.ConcatParams(axis=1, num_inputs=2))
    for layer, cls in [(pool, M.PoolParams), (up, M.UpsampleParams),
                       (cat, M.ConcatParams)]:
        raw = layer.pack()
        back = M.MarsLayer.unpack(raw)
        assert isinstance(back.params, cls)
        assert back.type == layer.type


@pytest.mark.parametrize("name,layers,tensors", [
    ("test_model.mars", 1, 4),
    ("test_simple.mars", 3, 6),
    ("tiny_160_f32.mars", 5, 12),
    ("tiny_160_int8.mars", 5, 12),
    ("yolov5n.mars", 230, 378),
    ("yolov5n_int8.mars", 230, 378),
    ("yolov5nu.mars", 252, 420),
])
def test_parse_bundled(name, layers, tensors):
    m = M.read_mars(reference_model(name))
    assert len(m.layers) == layers
    assert len(m.tensors) == tensors
    # weight blob exists and descriptors are inside it
    for t in m.tensors:
        if t.is_weight:
            assert t.data_offset + t.data_size <= m.weights.size


def test_nmhwsoib2_roundtrip(rng):
    for (o, i, kh, kw) in [(16, 3, 6, 6), (32, 16, 3, 3), (64, 64, 1, 1),
                           (33, 40, 3, 3)]:
        w = rng.integers(-128, 128, (o, i, kh, kw), dtype=np.int8)
        packed = pack_nmhwsoib2(w)
        assert packed.size == nmhwsoib2_size(o, i, kh, kw)
        back = unpack_nmhwsoib2(packed, o, i, kh, kw)
        np.testing.assert_array_equal(w, back)


def test_ndhwc32_roundtrip(rng):
    x = rng.integers(-128, 128, (2, 40, 8, 9), dtype=np.int8)  # NCHW
    packed = pack_ndhwc32(x)
    back = unpack_ndhwc32(packed, 2, 40, 8, 9)
    np.testing.assert_array_equal(x, back)


def test_nmhwsoib2_matches_bundled_sizes():
    """Bundled int8 models' weight descriptors obey the packed-size rule."""
    m = M.read_mars(reference_model("yolov5n_int8.mars"))
    for layer in m.layers:
        if layer.type != M.LayerType.CONV2D:
            continue
        wt = m.get_tensor(layer.params.weight_tensor_id)
        if wt is None or wt.format != M.Format.NMHWSOIB2:
            continue
        o, i, kh, kw = wt.shape
        assert wt.data_size == nmhwsoib2_size(o, i, kh, kw)


# ---------------------------------------------------------------------------
# Robustness: corrupted / truncated files fail with controlled errors
# (the reference loader's validation role, mars_runtime.c:137-201; its
# on-device analog for bad OEM data is SURVEY §5's defensive hardening)
# ---------------------------------------------------------------------------


def test_read_mars_truncations_raise_valueerror():
    data = open(reference_model("tiny_160_int8.mars"), "rb").read()
    # cut points: inside the header, the descriptor tables, the blob
    for cut in (0, 8, M.HEADER_SIZE - 1, M.HEADER_SIZE + 3,
                M.HEADER_SIZE + M.TENSOR_SIZE + 5, len(data) // 2,
                len(data) - 1):
        with pytest.raises(ValueError):
            M.read_mars(data[:cut])


def test_read_mars_fuzz_byte_flips_never_crash(rng):
    """300 seeded single-byte corruptions: read_mars either parses a
    model or raises ValueError — never hangs, never escapes another
    exception type, never allocates off a corrupted count field."""
    data = bytearray(open(reference_model("tiny_160_int8.mars"), "rb").read())
    # bias half the flips into the header + descriptor tables where the
    # structural fields live
    n_struct = M.HEADER_SIZE + 40 * M.TENSOR_SIZE
    for _ in range(300):
        pos = int(rng.integers(0, n_struct if rng.random() < 0.5
                               else len(data)))
        old = data[pos]
        data[pos] = int(rng.integers(0, 256))
        try:
            M.read_mars(bytes(data))
        except ValueError:
            pass
        finally:
            data[pos] = old


def test_read_mars_corrupt_counts_bounded():
    """Huge tensor/layer counts or a wild weight offset must be caught
    by the up-front bounds checks, not by looping to the end."""
    data = bytearray(open(reference_model("tiny_160_int8.mars"), "rb").read())
    import struct as S
    for off in (12, 16):        # n_layers, n_tensors
        bad = bytearray(data)
        S.pack_into("<I", bad, off, 0x7FFFFFFF)
        with pytest.raises(ValueError, match="truncated"):
            M.read_mars(bytes(bad))
    bad = bytearray(data)
    S.pack_into("<QQ", bad, 28, 2**40, 2**40)   # weights offset/size
    with pytest.raises(ValueError, match="out of bounds"):
        M.read_mars(bytes(bad))
