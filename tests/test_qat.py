"""QAT: activation fake-quant observers + STE through the executor.

The training-side closure of the reference's offline PTQ pipeline
(``scripts/quantize_onnx.py``): fake-quant observers inserted as an IR
pass, trained with straight-through gradients, deployed through the
exact integer tier. End-to-end demo: ``examples/qat_finetune.py``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions
from thingino_accel_tpu.training import ptq, qat


def _tiny_graph(seed=7, outliers=True):
    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(16, 16)))
    if outliers:
        rng = np.random.default_rng(seed)
        for n in g.nodes:
            if n.op == "CONV2D":
                w = g.tensors[n.inputs[1]].data
                mask = rng.random(w.shape) < 0.02
                g.tensors[n.inputs[1]].data = np.where(
                    mask, w * 20.0, w).astype(w.dtype)
    return g


def test_fake_quant_op_value_and_ste_gradient():
    """Executor FAKE_QUANT == int8 round-trip forward, identity grad."""
    from thingino_accel_tpu.ir.graph import Graph, Node, TensorInfo

    s = 0.037
    t_in = TensorInfo(name="x", shape=(1, 2, 2, 3),
                      dtype=np.dtype(np.float32))
    t_out = TensorInfo(name="y", shape=(1, 2, 2, 3),
                       dtype=np.dtype(np.float32))
    g = Graph(nodes=[Node(op="FAKE_QUANT", inputs=["x"], outputs=["y"],
                          attrs=dict(scale=s), name="fq")],
              tensors={"x": t_in, "y": t_out},
              inputs=["x"], outputs=["y"], name="fq_test")
    eng = Engine(g, EngineOptions())
    x = np.linspace(-5.1, 5.3, 12).astype(np.float32).reshape(1, 2, 2, 3)
    y = eng.run_np(x)["y"]
    want = np.clip(np.round(x / s), -128, 127) * s
    np.testing.assert_allclose(y, want, rtol=0, atol=1e-6)

    body, params = eng._fn, eng.params
    gr = jax.grad(lambda v: jnp.sum(body(params, {"x": v})["y"] * 3.0))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gr), 3.0, rtol=0, atol=1e-6)


def test_insert_activation_fake_quant_structure():
    g = _tiny_graph()
    data = [{g.inputs[0]: np.random.default_rng(0).normal(
        size=(1, 16, 16, 3)).astype(np.float32)}]
    stats = ptq.calibrate(g, data)
    qg = qat.insert_activation_fake_quant(g, stats)
    fq = [n for n in qg.nodes if n.op == "FAKE_QUANT"]
    # one observer per float activation: input + every layer output
    n_acts = 1 + sum(len(n.outputs) for n in g.nodes)
    assert len(fq) == n_acts
    # outputs remapped to observed tensors; scales are the calib scales
    assert all(o.endswith("__fq") for o in qg.outputs)
    for n in fq:
        assert n.attrs["scale"] == pytest.approx(
            stats.scale(n.inputs[0]), rel=1e-6)
    # observed forward tracks the f32 forward in RMS (pointwise peaks
    # legitimately diverge where percentile calibration clips the
    # outlier-driven activation tails)
    e0, e1 = Engine(g, EngineOptions()), Engine(qg, EngineOptions())
    x = data[0][g.inputs[0]]
    y0 = next(iter(e0.run_np(x).values()))
    y1 = next(iter(e1.run_np(x).values()))
    rel = (np.sqrt(np.mean((y0 - y1) ** 2))
           / max(np.sqrt(np.mean(y0 ** 2)), 1e-9))
    assert 0 < rel < 0.5


def test_qat_training_reduces_quantized_loss():
    """One epoch of per-channel STE training on the observed graph
    lowers the epoch-mean distillation loss on heavy-tailed weights."""
    g = _tiny_graph()
    in_name = g.inputs[0]
    eng = Engine(g, EngineOptions())
    rng = np.random.default_rng(1)
    data = [rng.normal(scale=1.2, size=(2, 16, 16, 3)).astype(np.float32)
            for _ in range(2)]
    teacher = [eng._fn(eng.params, {in_name: jnp.asarray(x)})
               for x in data]

    stats = ptq.calibrate(g, [{in_name: x} for x in data])
    qg = qat.insert_activation_fake_quant(g, stats)
    engq = Engine(qg, EngineOptions())
    opt = optax.adam(2e-4)
    step = jax.jit(qat.make_train_step(engq._fn, opt, qat=True,
                                       channel_axis=-1))
    params = {k: jnp.asarray(v) for k, v in eng.params.items()}
    opt_state = opt.init(params)
    losses = []
    for i in range(60):
        x = data[i % 2]
        tgt = {o: t for o, t in zip(
            qg.outputs, [teacher[i % 2][k] for k in g.outputs])}
        params, opt_state, l = step(params, opt_state,
                                    {in_name: jnp.asarray(x)}, tgt)
        losses.append(float(l))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_weight_scale_per_channel():
    w = jnp.asarray(np.random.default_rng(0).normal(
        size=(3, 3, 8, 16)).astype(np.float32))
    s = qat.weight_scale(w, axis=-1)
    assert s.shape == (1, 1, 1, 16)
    am = np.abs(np.asarray(w)).max(axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(s).ravel(), am / 127.0,
                               rtol=1e-6)
