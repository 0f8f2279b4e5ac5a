"""Utils tests: checkpoint save/restore, timing harness, config registry."""

import numpy as np
import jax
import jax.numpy as jnp

from thingino_accel_tpu.runtime import checkpoint
from thingino_accel_tpu.utils import config, timing


def test_checkpoint_roundtrip(tmp_path):
    params = {
        "conv": {"w": np.random.default_rng(0).normal(
            size=(3, 3, 4, 8)).astype(np.float32),
            "b": np.zeros((8,), np.float32)},
        "scale": np.float32(0.5),
    }
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, params, extra={"note": "test"}, step=7)
    restored, meta = checkpoint.load(path, like=params)
    assert meta["step"] == 7
    assert meta["extra"]["note"] == "test"
    np.testing.assert_array_equal(
        np.asarray(restored["conv"]["w"]), params["conv"]["w"])
    np.testing.assert_array_equal(
        np.asarray(restored["scale"]), params["scale"])


def test_checkpoint_training_state(tmp_path):
    import optax
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime.executor import prepare_params

    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(16, 16)),
                       in_hw=(16, 16))
    params = {k: jnp.asarray(v) for k, v in prepare_params(g).items()}
    opt = optax.adam(1e-3)
    state = opt.init(params)
    path = str(tmp_path / "train")
    checkpoint.save(path, {"params": params, "opt": state}, step=3)
    restored, meta = checkpoint.load(path, like={"params": params,
                                                 "opt": state})
    assert meta["step"] == 3
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(restored["params"][k]), np.asarray(params[k]))


def test_timing_harness():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((128, 128))
    dt = timing.time_fn(f, x, iters=3, warmup=1)
    assert dt > 0
    dt2 = timing.time_fn_chained(f, x, iters=3)
    assert dt2 > 0
    assert timing.throughput(8, 0.01) == 800.0


def test_compiled_stats():
    stats = timing.compiled_stats(
        lambda a, b: a @ b, jnp.ones((64, 64)), jnp.ones((64, 64)))
    assert isinstance(stats, dict)


def test_config_registry(monkeypatch):
    assert config.get("TAT_CONV_BACKEND") == "xla"
    monkeypatch.setenv("TAT_CONV_BACKEND", "pallas")
    assert config.get("TAT_CONV_BACKEND") == "pallas"
    monkeypatch.setenv("TAT_BENCH_ITERS", "25")
    assert config.get("TAT_BENCH_ITERS") == 25
    monkeypatch.setenv("TAT_BENCH_ITERS", "junk")
    assert config.get("TAT_BENCH_ITERS") == 10  # falls back to default
    assert "TAT_CONV_BACKEND" in config.describe()
