#!/usr/bin/env python3
"""QAT fine-tune -> int8 export -> exact integer tier, end to end.

Closes the training loop the reference leaves outside the framework
(its int8 models come from an offline torch script,
``scripts/quantize_onnx.py`` -> QDQ ONNX -> mars-compiler):

  1. build an f32 graph (the tiny_160 three-conv stack, small input)
  2. distillation targets = the f32 model's own outputs on the data
  3. QAT: fine-tune the SAME weights with per-channel fake-quant in the
     forward pass (STE) so the quantized forward matches the f32 one —
     at step 0 the loss IS the model's weight-quantization error, and
     training migrates weights toward the int8 grid
  4. checkpoint mid-run and RESUME from disk (runtime/checkpoint.py),
     verifying the restored state continues identically
  5. write trained weights back into the IR graph, PTQ-calibrate
     activations, quantize (per-channel), export `.mars`, reload, and
     run on the bit-exact integer engine
  6. report the integer engine's output error vs the f32 teacher, for
     the QAT weights vs plain PTQ of the original weights

Runs on CPU in ~a minute; the same train_step jits over a device mesh
unchanged (tests/test_parallel.py trains it dp/tp-sharded).
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def l2(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.sqrt(np.mean((a - b) ** 2)))


def int8_engine_error(graph, stats, data, teacher, quantize_graph):
    """Quantize `graph` with `stats`, round-trip through .mars, run the
    exact integer tier, return mean output RMSE vs the f32 teacher."""
    import jax.numpy as jnp
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.formats.mars_export import export_mars
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    q = quantize_graph(graph, stats)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "qat.mars")
        export_mars(q, path)
        g2 = from_mars(M.read_mars(path))
    eng = Engine(g2, EngineOptions(precision="exact"))
    in_name = eng.graph.inputs[0]
    in_scale = eng.graph.tensors[in_name].quant.scale
    errs = []
    for x, t in zip(data, teacher):
        xi = np.clip(np.round(x / in_scale), -128, 127).astype(np.int8)
        out = eng.run_np(xi)
        for o, ref in zip(eng.graph.outputs, t):
            s = eng.graph.tensors[o].quant.scale
            errs.append(l2(out[o].astype(np.float32) * s, ref))
    return float(np.mean(errs))


def main() -> int:
    # hermetic CPU (the ambient TPU tunnel is wasted on a toy model)
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax
    if os.environ.get("TAT_QAT_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.runtime import checkpoint
    from thingino_accel_tpu.training import ptq, qat

    steps = int(os.environ.get("TAT_QAT_STEPS", "300"))
    rng = np.random.default_rng(0)

    print("[1] f32 graph (heavy-tailed weights) + teacher outputs")
    graph = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(32, 32)))
    # make the model genuinely hard to quantize: 1% weight outliers at
    # 20x magnitude coarsen their channels' int8 grid (the well-behaved
    # random zoo weights sit AT the quantization noise floor, where QAT
    # has nothing to recover — cf. ACCURACY.md's calibration finding)
    outr = np.random.default_rng(7)
    for n in graph.nodes:
        if n.op == "CONV2D":
            w = graph.tensors[n.inputs[1]].data
            mask = outr.random(w.shape) < 0.01
            graph.tensors[n.inputs[1]].data = np.where(
                mask, w * 20.0, w).astype(w.dtype)
    eng = Engine(graph, EngineOptions())
    in_name = graph.inputs[0]
    forward, params0 = eng._fn, dict(eng.params)
    data = [rng.normal(scale=1.2, size=(2, 32, 32, 3)).astype(np.float32)
            for _ in range(4)]
    teacher = []
    for x in data:
        outs = forward(params0, {in_name: jnp.asarray(x)})
        teacher.append([np.asarray(outs[o], np.float32)
                        for o in graph.outputs])

    print("[2] QAT fine-tune (activation observers + per-channel "
          "weight fake-quant, STE)")
    calib = [{in_name: x} for x in data]
    stats0 = ptq.calibrate(graph, calib)
    qat_graph = qat.insert_activation_fake_quant(graph, stats0)
    eng_q = Engine(qat_graph, EngineOptions())
    forward_q = eng_q._fn
    opt = optax.adam(optax.cosine_decay_schedule(2e-4, steps))
    train_step = jax.jit(qat.make_train_step(
        forward_q, opt, qat=True, channel_axis=-1))
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    opt_state = opt.init(params)
    losses = []
    ckpt_dir = tempfile.mkdtemp(prefix="tat_qat_")
    ckpt = os.path.join(ckpt_dir, "ck")
    for i in range(steps):
        x = data[i % len(data)]
        tgt = {o: jnp.asarray(t) for o, t in
               zip(qat_graph.outputs, teacher[i % len(data)])}
        params, opt_state, l = train_step(
            params, opt_state, {in_name: jnp.asarray(x)}, tgt)
        losses.append(float(l))
        if i == steps // 2:
            checkpoint.save(ckpt, params, extra={"step": i}, step=i)
            # simulate a restart: restore and continue from disk
            params, meta = checkpoint.load(ckpt, like=params)
            params = {k: jnp.asarray(v) for k, v in params.items()}
            print(f"    checkpoint saved+restored at step {meta['step']}"
                  f" (loss {losses[-1]:.5f})")
    # per-step losses cycle over the data batches, which differ in
    # difficulty — compare epoch means, not first step vs last step
    ep = len(data)
    l_first, l_last = float(np.mean(losses[:ep])), float(np.mean(losses[-ep:]))
    print(f"    epoch-mean loss {l_first:.5f} -> {l_last:.5f} "
          f"({l_first / max(l_last, 1e-12):.2f}x)")

    print("[3] trained weights -> IR graph -> PTQ -> .mars -> exact tier")
    conv_w = {n.inputs[1] for n in graph.nodes
              if n.op == "CONV2D" and len(n.inputs) > 1}

    def write_back(graph, trained):
        import copy
        g = copy.deepcopy(graph)
        for k, v in trained.items():
            t = g.tensors.get(k)
            if t is None or t.data is None:
                continue
            a = np.asarray(v, np.float32)
            if k in conv_w and a.ndim == 4:
                a = np.transpose(a, (3, 2, 0, 1))   # executor HWIO -> IR OIHW
            t.data = a.astype(t.data.dtype) \
                if np.issubdtype(t.data.dtype, np.floating) else a
        return g

    g_qat = write_back(graph, {k: np.asarray(v) for k, v in params.items()})
    err_qat = int8_engine_error(
        g_qat, ptq.calibrate(g_qat, calib), data, teacher,
        ptq.quantize_graph)
    err_ptq = int8_engine_error(
        graph, ptq.calibrate(graph, calib), data, teacher,
        ptq.quantize_graph)
    print(f"    integer-engine RMSE vs f32 teacher: "
          f"PTQ-only {err_ptq:.5f} vs QAT {err_qat:.5f} "
          f"({(1 - err_qat / max(err_ptq, 1e-12)) * 100:+.1f}%)")

    ok = l_last < l_first and err_qat < err_ptq
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
