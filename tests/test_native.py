"""Native C++ library tests: build, codec parity with the Python
implementations, JPEG decode round-trip, NMS parity."""

import io
import os

import numpy as np
import pytest

from thingino_accel_tpu import native
from thingino_accel_tpu.formats import packing


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no compiler?)")
    return native.load()


def test_nmhwsoib2_matches_python(lib, rng):
    for (o, i, kh, kw) in [(16, 3, 6, 6), (33, 40, 3, 3), (64, 64, 1, 1)]:
        w = rng.integers(-128, 128, (o, i, kh, kw), dtype=np.int8)
        packed_py = packing.pack_nmhwsoib2(w)
        packed_c = native.pack_nmhwsoib2(w)
        np.testing.assert_array_equal(packed_py, packed_c)
        back_c = native.unpack_nmhwsoib2(packed_c, o, i, kh, kw)
        np.testing.assert_array_equal(back_c, w)


def test_quantize_matches(lib, rng):
    u8 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.quantize_i8(u8), (u8.astype(np.int32) - 128).astype(np.int8))


def test_jpeg_roundtrip(lib):
    from PIL import Image
    # smooth gradient (JPEG-friendly) for the fidelity check
    y = np.linspace(0, 255, 48, dtype=np.uint8)[:, None, None]
    x = np.linspace(0, 255, 64, dtype=np.uint8)[None, :, None]
    img = np.broadcast_to((y // 2 + x // 2), (48, 64, 3)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    decoded = native.decode_jpeg(buf.getvalue())
    assert decoded.shape == (48, 64, 3)
    assert np.abs(decoded.astype(int) - img.astype(int)).mean() < 3
    # bit-identical with PIL's libjpeg path
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(decoded, ref)


def test_letterbox_native_vs_device(lib):
    img = np.full((480, 640, 3), 200, np.uint8)
    out = native.letterbox(img, (640, 640))
    assert out.shape == (640, 640, 3)
    assert (out[:80] == 114).all() and (out[-80:] == 114).all()
    assert (np.abs(out[80:560].astype(int) - 200) <= 1).all()


def test_nms_matches_device(lib, rng):
    n = 150
    boxes = np.stack([
        rng.uniform(50, 590, n), rng.uniform(50, 590, n),
        rng.uniform(10, 120, n), rng.uniform(10, 120, n)], 1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, 5, n).astype(np.int32)
    keep = native.nms(boxes, scores, classes, 0.25, 0.45, max_out=200)

    import jax.numpy as jnp
    from thingino_accel_tpu.models import yolo
    dets = yolo.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(classes), 0.25, 0.45, max_dets=200)
    dev = sorted(round(float(s), 5)
                 for s, v in zip(np.asarray(dets.scores),
                                 np.asarray(dets.valid)) if v)
    nat = sorted(round(float(scores[i]), 5) for i in keep)
    assert nat == dev


def test_c_abi_engine_shim():
    """The C-ABI engine (libtat_engine.so, reference surface:
    include/nna_model.h:45-116) loads a committed .mars fixture and runs
    inference through host buffers — driven here via ctypes, exactly as
    a C host would call it."""
    import ctypes

    lib_path = os.path.join(os.path.dirname(__file__), "..", "csrc",
                            "libtat_engine.so")
    if not os.path.exists(lib_path):
        pytest.skip("libtat_engine.so not built (run make -C csrc)")
    lib = ctypes.CDLL(lib_path)
    lib.tat_model_load.restype = ctypes.c_void_p
    lib.tat_model_load.argtypes = [ctypes.c_char_p]
    lib.tat_model_get_input.restype = ctypes.c_void_p
    lib.tat_model_get_input.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.tat_model_get_output.restype = ctypes.c_void_p
    lib.tat_model_get_output.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.tat_tensor_data.restype = ctypes.c_void_p
    lib.tat_tensor_data.argtypes = [ctypes.c_void_p]
    lib.tat_tensor_bytes.restype = ctypes.c_int64
    lib.tat_tensor_bytes.argtypes = [ctypes.c_void_p]
    lib.tat_tensor_ndim.restype = ctypes.c_int
    lib.tat_tensor_ndim.argtypes = [ctypes.c_void_p]
    lib.tat_tensor_dtype.restype = ctypes.c_char_p
    lib.tat_tensor_dtype.argtypes = [ctypes.c_void_p]
    lib.tat_model_run.argtypes = [ctypes.c_void_p]
    lib.tat_model_unload.argtypes = [ctypes.c_void_p]
    lib.tat_last_error.restype = ctypes.c_char_p
    lib.tat_model_num_inputs.argtypes = [ctypes.c_void_p]
    lib.tat_model_num_inputs.restype = ctypes.c_int
    lib.tat_model_num_outputs.argtypes = [ctypes.c_void_p]
    lib.tat_model_num_outputs.restype = ctypes.c_int

    fixture = os.path.join(os.path.dirname(__file__), "..", "models",
                           "fixtures", "test_conv.mars")
    model = lib.tat_model_load(fixture.encode())
    assert model, lib.tat_last_error().decode()
    assert lib.tat_model_num_inputs(model) == 1
    assert lib.tat_model_num_outputs(model) >= 1

    tin = lib.tat_model_get_input(model, 0)
    n_in = lib.tat_tensor_bytes(tin)
    assert lib.tat_tensor_dtype(tin) == b"int8"
    rng = np.random.default_rng(0)
    payload = rng.integers(-128, 128, n_in, dtype=np.int8).tobytes()
    ctypes.memmove(lib.tat_tensor_data(tin), payload, n_in)

    rc = lib.tat_model_run(model)
    assert rc == 0, lib.tat_last_error().decode()

    tout = lib.tat_model_get_output(model, 0)
    n_out = lib.tat_tensor_bytes(tout)
    out = np.frombuffer(ctypes.string_at(lib.tat_tensor_data(tout), n_out),
                        np.int8)
    assert out.size == n_out and np.any(out != 0)

    # cross-check against the Python engine on the same payload
    from thingino_accel_tpu.runtime import Engine
    eng = Engine.from_mars(fixture)
    x = np.frombuffer(payload, np.int8).reshape(
        eng.graph.tensors[eng.graph.inputs[0]].shape)
    ref = list(eng.run_np(x).values())[0].reshape(-1)
    np.testing.assert_array_equal(out, ref)

    lib.tat_model_unload(model)


def test_native_space_to_depth_matches_numpy():
    """C++ s2d ingest reorder == the numpy reference (both the
    phase-major channel order stem_space_to_depth's weights expect)."""
    from thingino_accel_tpu import native
    from thingino_accel_tpu.models.yolo import space_to_depth_frames
    x = np.random.default_rng(3).integers(
        0, 256, (12, 16, 3), dtype=np.uint8)
    got = native.space_to_depth_u8(x)        # native or numpy fallback
    want = space_to_depth_frames(x[None])[0]
    np.testing.assert_array_equal(got, want)
    assert got.shape == (6, 8, 12)
