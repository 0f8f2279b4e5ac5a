"""pjit'd forward / train-step builders over a ('dp','tp') mesh.

All sharding is declarative: in_shardings on params (tp over conv output
channels) and batch (dp), GSPMD propagates through the traced graph and
inserts the ICI collectives. No hand-written communication — the TPU
replacement for what a multi-chip extension of the reference would have
needed NCCL/MPI for (it had none; SURVEY §2.7).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thingino_accel_tpu.parallel.mesh import (
    batch_sharding, param_sharding_rules,
)


def _shard_engine_params(engine, mesh: Mesh):
    """(sharding rules, device_put params) for an engine — rules only
    read shapes, so no host copy of the weights is needed."""
    rules = param_sharding_rules(engine.params, mesh)
    sharded = {
        k: jax.device_put(v, rules[k]) for k, v in engine.params.items()}
    return rules, sharded


def make_sharded_forward(engine, mesh: Mesh):
    """jit the engine's graph body with dp-batch + tp-channel shardings.

    Returns ``(fn, sharded_params)``; call ``fn(sharded_params, inputs)``
    with inputs whose leading batch dim is divisible by mesh 'dp'.
    """
    rules, sharded_params = _shard_engine_params(engine, mesh)
    xsh = batch_sharding(mesh)
    # unwrap the engine's own jit so the sharded jit traces the raw
    # body (avoids jit-of-jit and the inner jit's donation semantics)
    body = getattr(engine._fn, "__wrapped__", engine._fn)

    in_names = list(engine.graph.inputs)
    fn = jax.jit(
        body,
        in_shardings=(rules, {n: xsh for n in in_names}),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    return fn, sharded_params


def make_sharded_train_step(
    graph,
    mesh: Mesh,
    optimizer: Optional[optax.GradientTransformation] = None,
    qat: bool = True,
    compute_dtype=jnp.bfloat16,
):
    """Build a pjit'd QAT train step over an f32 IR graph.

    Shardings: params tp over output channels (dp-replicated, so GSPMD
    psums grads over dp automatically), batch dp, optimizer state follows
    params. Returns ``(train_step, params, opt_state)`` ready to call with
    dp-divisible batches.
    """
    from thingino_accel_tpu.runtime.executor import (
        ExecOptions, build_executor, prepare_params,
    )
    from thingino_accel_tpu.training.qat import make_train_step

    optimizer = optimizer or optax.adam(1e-4)
    opts = ExecOptions(mode="full", compute_dtype=compute_dtype)
    body = build_executor(graph, opts)
    np_params = prepare_params(graph)
    float_params = {
        k: (v.astype(np.float32)
            if np.issubdtype(v.dtype, np.floating) else v)
        for k, v in np_params.items()}

    rules = param_sharding_rules(float_params, mesh)
    params = {k: jax.device_put(jnp.asarray(v), rules[k])
              for k, v in float_params.items()}
    opt_state = optimizer.init(params)

    step = make_train_step(body, optimizer, qat=qat)
    xsh = batch_sharding(mesh)
    in_names = list(graph.inputs)
    out_names = list(graph.outputs)

    train_step = jax.jit(
        step,
        in_shardings=(
            rules, None,
            {n: xsh for n in in_names},
            {n: xsh for n in out_names},
        ),
        donate_argnums=(0, 1),
    )
    return train_step, params, opt_state


def make_sharded_detector(engine, mesh: Mesh, *,
                          max_dets: int = 100,
                          conf_thresh: float = 0.25,
                          iou_thresh: float = 0.45):
    """Full e2e detection pipeline (letterbox -> quantize -> backbone ->
    decode -> NMS) dp-sharded over the mesh: multi-chip batched serving
    (BASELINE config 5 beyond one chip). Every frame's postprocess runs
    on the chip that computed its backbone — no cross-chip traffic
    besides the initial batch scatter.

    Returns ``(fn, sharded_params)``; ``fn(sharded_params, frames_u8)``
    takes [B, H, W, 3] uint8 (B divisible by mesh 'dp') and returns
    fixed-shape Detections arrays sharded over dp.
    """
    from thingino_accel_tpu.models import yolo

    rules, sharded_params = _shard_engine_params(engine, mesh)
    xsh = batch_sharding(mesh)
    body = engine._fn

    in_name = engine.graph.inputs[0]
    out_names = list(engine.graph.outputs)
    in_t = engine.graph.tensors[in_name]
    in_hw = (in_t.shape[1], in_t.shape[2])
    # per-head dequant scale (None for float heads — mixed graphs after
    # partial dequantization keep int8 only on some outputs)
    scales = [
        engine.graph.tensors[o].quant.scale
        if np.issubdtype(engine.graph.tensors[o].dtype, np.signedinteger)
        else None
        for o in out_names]
    if all(s is None for s in scales):
        scales = None
    # anchor decode shape follows the head channels: ch = 3*(5+nc)
    head_ch = engine.graph.tensors[out_names[0]].shape[3]
    num_classes = head_ch // 3 - 5
    assert head_ch == 3 * (5 + num_classes), (
        f"head channels {head_ch} are not 3*(5+nc) — "
        "make_sharded_detector expects yolov5-anchor heads")

    from jax.experimental.shard_map import shard_map

    def _postprocess(*heads):
        # runs PER DEVICE on the local batch shard: the NMS while_loop
        # condition and the top_k pool selection stay chip-local.
        # Under plain GSPMD these partition badly — the vmapped top_k
        # all-gathers the batch dim and the while_loop's scalar `any
        # (changed)` condition all-reduces every iteration (observed
        # in the compiled HLO; tests/test_parallel.py asserts the
        # shard_map version compiles collective-free).
        boxes, conf, cls = yolo.decode_and_parse(
            list(heads), scales=scales, num_classes=num_classes)
        dets = yolo.nms_batched(boxes, conf, cls, max_dets=max_dets,
                                conf_thresh=conf_thresh,
                                iou_thresh=iou_thresh)
        return dets.boxes, dets.scores, dets.classes, dets.valid

    post = shard_map(
        _postprocess, mesh=mesh,
        in_specs=tuple(P("dp") for _ in out_names),
        out_specs=P("dp"), check_rep=False)

    def pipeline(params, frames_u8):
        lb = yolo.letterbox_uint8(frames_u8, in_hw)
        x = yolo.quantize_input_int8(lb)
        feats = body(params, {in_name: x})
        heads = [jax.lax.with_sharding_constraint(
            feats[k], NamedSharding(mesh, P("dp")))
            for k in out_names]
        return post(*heads)

    fn = jax.jit(
        pipeline,
        in_shardings=(rules, xsh),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    return fn, sharded_params
