#!/usr/bin/env python3
"""Distillation-QAT on the REAL yolov5n weights -> exact-tier parity.

ACCURACY.md's weakest row is the exact int8 tier's detection parity,
and the round-3 investigation pinned it to the quantization noise floor
of the bundled weights — exactly the error QAT trains away: fine-tune
the f32 weights with per-channel fake-quant in the forward pass (STE)
against the f32 model's OWN outputs (label-free distillation), then
PTQ + export and compare exact-tier detections.

Data: letterboxed augments of the reference's validation image using
the CALIBRATION seed (disjoint from the accuracy report's eval seed).

Env: TAT_QAT_STEPS (default 200), TAT_QAT_LR (2e-6 — adam moves every
weight ~lr per step; the bundled weights sit at ~1e-2 scale, so bigger
rates diverge), TAT_QAT_FRAMES (8)
Outputs: /tmp/yolov5n_qat_int8.mars (TAT_QAT_OUT to override) + a
parity comparison printout.

MEASURED RESULT (2026-08-18, CPU, 200 steps, 8 calib frames, 12 eval
frames / 26 oracle boxes): distillation loss drops 8.4x (weight-only
fake-quant) and 5.6x (with activation observers), but exact-tier
detection parity does NOT improve (6/26 PTQ vs 4/26 and 1/26 QAT):
static activation observers calibrated before training drift from the
post-training activation ranges, and the parity metric at 26 boxes is
threshold-dominated. Recorded as the real-model confirmation of the
round-3 conclusion that these weights sit at the quantization noise
floor — QAT is not the lever for this model; the shipped calibrated
model stays models/yolov5n_cal_int8.mars.

Runs on CPU in ~10 min; TAT_QAT_TPU=1 uses the ambient device.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_IMG = "/root/reference/mgk-decompiler/test_detection.jpg"
REF_MARS = "/root/reference/models/yolov5n.mars"


def main() -> int:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    import jax
    if os.environ.get("TAT_QAT_TPU") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from examples.accuracy_report import (
        _augments, _detections, _filter_conf, _letterbox_np, match_stats,
    )
    from thingino_accel_tpu.formats.mars import read_mars
    from thingino_accel_tpu.formats.mars_export import export_mars
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.models import yolo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.training import ptq, qat
    from PIL import Image

    steps = int(os.environ.get("TAT_QAT_STEPS", "200"))
    lr = float(os.environ.get("TAT_QAT_LR", "2e-6"))
    n_frames = int(os.environ.get("TAT_QAT_FRAMES", "8"))

    print("[1] real f32 yolov5n -> teacher outputs on calib augments")
    g = from_mars(read_mars(REF_MARS))
    det_outs = yolo.find_detect_outputs(g)
    g = g.with_outputs(det_outs)
    in_name = g.inputs[0]
    eng = Engine(g)
    forward, params0 = eng._fn, dict(eng.params)

    img = np.asarray(Image.open(REF_IMG).convert("RGB"), np.uint8)
    frames = [img] + _augments(img, n_frames - 1, seed=100, mosaics=True)
    data = [_letterbox_np(a).astype(np.float32)[None] / 255.0
            for a in frames]
    teacher = []
    for x in data:
        outs = forward(params0, {in_name: jnp.asarray(x)})
        teacher.append({o: jnp.asarray(np.asarray(outs[o], np.float32))
                        for o in g.outputs})

    print(f"[2] QAT distillation: {steps} steps, lr {lr:g}, "
          f"{len(data)} frames (per-channel weight fake-quant + "
          "activation observers, STE)")
    # activation fake-quant at PTQ-calibrated scales: the loss must
    # model the ACTIVATION quantization the exact tier deploys —
    # weight-only QAT reduced teacher RMSE 8x here with NO parity
    # movement (activation error dominates; ACCURACY.md round 3)
    stats0 = ptq.calibrate(g, ({in_name: x} for x in data))
    g_obs = qat.insert_activation_fake_quant(g, stats0)
    eng_obs = Engine(g_obs)
    forward_q = eng_obs._fn
    opt = optax.adam(optax.cosine_decay_schedule(lr, steps))
    train_step = jax.jit(qat.make_train_step(
        forward_q, opt, qat=True, channel_axis=-1))
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    opt_state = opt.init(params)
    losses = []
    # the observer pass renames the head outputs (__fq); re-key the
    # teacher targets in output order
    teacher_q = [{oq: t[o] for oq, o in zip(g_obs.outputs, g.outputs)}
                 for t in teacher]
    for i in range(steps):
        x = data[i % len(data)]
        params, opt_state, l = train_step(
            params, opt_state, {in_name: jnp.asarray(x)},
            teacher_q[i % len(data)])
        losses.append(float(l))
        if i % 25 == 0 or i == steps - 1:
            print(f"    step {i:4d} loss {losses[-1]:.6f}")
    ep = len(data)
    l_first = float(np.mean(losses[:ep]))
    l_last = float(np.mean(losses[-ep:]))
    print(f"    epoch-mean loss {l_first:.6f} -> {l_last:.6f}")

    print("[3] write back -> PTQ -> export models/yolov5n_qat_int8.mars")
    conv_w = {n.inputs[1] for n in g.nodes
              if n.op in ("CONV2D", "DEPTHWISE_CONV2D")
              and len(n.inputs) > 1}
    import copy
    g_qat = copy.deepcopy(g)
    for k, v in params.items():
        t = g_qat.tensors.get(k)
        if t is None or t.data is None or not t.data.size:
            continue
        a = np.asarray(v, np.float32)
        if k in conv_w and a.ndim == 4:
            a = np.transpose(a, (3, 2, 0, 1))     # executor HWIO -> IR OIHW
        t.data = a.astype(t.data.dtype) \
            if np.issubdtype(t.data.dtype, np.floating) else a

    calib = ({in_name: x} for x in data)
    gq_qat = ptq.quantize_model(g_qat, calib)
    out_path = os.environ.get(
        "TAT_QAT_OUT", "/tmp/yolov5n_qat_int8.mars")
    with open(out_path, "wb") as f:
        f.write(export_mars(gq_qat))
    print(f"    wrote {out_path}")

    print("[4] exact-tier detection parity vs the f32 oracle "
          "(eval seed, disjoint)")
    evals = [img] + _augments(img, 11, seed=7, mosaics=True)
    gq_ptq = ptq.quantize_model(g, ({in_name: x} for x in data))

    def parity(graph_q):
        eq = Engine(graph_q, EngineOptions(precision="exact"))
        scales = [graph_q.tensors[o].quant.scale for o in det_outs]
        in_s = graph_q.tensors[graph_q.inputs[0]].quant.scale
        acc = np.zeros(5)
        oracle_n = 0
        for a in evals:
            lb = _letterbox_np(a)
            xf = jnp.asarray(lb.astype(np.float32)[None] / 255.0)
            xq = jnp.asarray(np.clip(np.round(
                lb.astype(np.float32) / 255.0 / in_s),
                -128, 127).astype(np.int8)[None])
            oracle = _filter_conf(
                _detections(eng, g, det_outs, xf, scales=None,
                            conf=0.05), 0.10)
            got = _filter_conf(
                _detections(eq, graph_q, det_outs, xq, scales=scales,
                            conf=0.05), 0.10)
            oracle_n += len(oracle[0])
            acc += np.asarray(match_stats(oracle, got), np.float64)
        return acc, oracle_n

    acc_ptq, on = parity(gq_ptq)
    acc_qat, _ = parity(gq_qat)
    r_ptq = acc_ptq[0] / max(1, on)
    r_qat = acc_qat[0] / max(1, on)
    print(f"    oracle boxes {on}")
    print(f"    PTQ-only exact tier: matched {int(acc_ptq[0])} "
          f"(rate {r_ptq:.3f}), extra {int(acc_ptq[2])}")
    print(f"    QAT      exact tier: matched {int(acc_qat[0])} "
          f"(rate {r_qat:.3f}), extra {int(acc_qat[2])}")
    ok = l_last < l_first and r_qat >= r_ptq
    print("PASS" if ok else "NO-GAIN (recorded either way)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
