"""C-API-shim tests: the call sequences of the reference examples
(examples/test_init.c, test_model_load.c, mars_test.c) through the
Python shim."""

import numpy as np
import pytest

from conftest import reference_model
from thingino_accel_tpu import api


def test_init_sequence():
    """test_init.c flow: init -> hw info -> deinit."""
    assert api.nna_init() == api.NNA_SUCCESS
    info = api.nna_get_hw_info()
    assert info.num_devices >= 1
    assert info.platform
    assert api.nna_lock() == api.NNA_SUCCESS
    assert api.nna_unlock() == api.NNA_SUCCESS
    assert api.nna_deinit() == api.NNA_SUCCESS


def test_mars_load_run_flow():
    """mars_test.c flow: load -> summary -> fill input -> run -> output."""
    err, model = api.mars_load_file(reference_model("tiny_160_int8.mars"))
    assert err == api.MARS_OK
    assert api.mars_get_num_inputs(model) == 1
    assert api.mars_get_num_outputs(model) == 1
    inp = api.mars_get_input(model, 0)
    assert inp is not None and inp.dtype == np.int8
    inp.set_data(np.random.default_rng(0).integers(
        -128, 128, inp.shape, dtype=np.int8))
    assert api.mars_run(model) == api.MARS_OK
    out = api.mars_get_output(model, 0)
    assert out is not None
    assert out.data.shape == out.shape
    api.mars_free(model)


def test_mars_error_codes(tmp_path):
    bad = tmp_path / "bad.mars"
    bad.write_bytes(b"XXXX" + b"\x00" * 100)
    err, model = api.mars_load_file(str(bad))
    assert err == api.MARS_ERR_INVALID_MAGIC and model is None
    err, model = api.mars_load_file(str(tmp_path / "missing.mars"))
    assert err == api.MARS_ERR_INVALID_FILE
    assert api.mars_get_error_string(api.MARS_ERR_INVALID_MAGIC) == \
        "Invalid magic number"
    assert api.mars_get_error_string(-99) == "Unknown error"


def test_nna_model_api():
    """test_model_load.c flow via the generic nna_model_* surface."""
    model = api.nna_model_load(reference_model("tiny_160_f32.mars"))
    assert model is not None
    info = api.nna_model_get_info(model)
    assert info.num_layers == 5
    t = api.nna_model_get_input(model, 0)
    assert t is not None
    by_name = api.nna_model_get_input_by_name(model, t.name)
    assert by_name is t
    assert api.nna_model_get_output(model, 99) is None
    t.set_data(np.zeros(t.shape, np.float32))
    assert api.nna_model_run(model) == 0
    api.nna_model_unload(model)


def test_tensor_set_data_validates():
    t = api.Tensor("x", (1, 4, 4, 3), np.int8)
    with pytest.raises(ValueError):
        t.set_data(np.zeros((2, 4, 4, 3), np.int8))


def test_basenet_facade():
    """basenet.cpp:20-60 call sequence through the facade."""
    net = api.BaseNet()
    assert net.run() == -1  # no model yet
    assert net.load_model(reference_model("tiny_160_int8.mars")) == 0
    t = net.get_input(0)
    assert t is not None
    t.set_data(np.zeros(t.shape, np.int8))
    assert net.run() == 0
    out = net.get_output(0)
    assert out is not None and out.data.shape == out.shape
    assert net.get_forward_memory_size() > 0
    assert net.get_input_by_name(t.name) is t


def test_aip_shims():
    """AIP pipe shims (include/aip.h:118-135 call shapes)."""
    import jax.numpy as jnp
    from thingino_accel_tpu import api

    ctx = api.aip_init()
    img = jnp.asarray((np.arange(2 * 8 * 8 * 3) % 256)
                      .astype(np.uint8).reshape(2, 8, 8, 3))
    out = api.aip_resize(ctx, img, 16, 16)
    assert out.shape == (2, 16, 16, 3) and out.dtype == img.dtype
    warped = api.aip_perspective(ctx, img, np.eye(3), 8, 8)
    np.testing.assert_array_equal(np.asarray(warped), np.asarray(img))
    x = jnp.asarray(np.random.default_rng(0)
                    .normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(3, 3, 4, 8)).astype(np.float32))
    y = api.aip_conv2d(ctx, x, w, stride=1, pad=1)
    assert y.shape == (1, 8, 8, 8)
    assert api.aip_f_wait(ctx) == 0
    api.aip_cleanup(ctx)
