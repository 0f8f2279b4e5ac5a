"""Quantization-aware training.

The reference is inference-only; its int8 models come from offline
post-training quantization (``scripts/quantize_onnx.py`` -> QDQ ONNX ->
mars-compiler). QAT closes that loop inside the framework: train f32
weights with fake-quantization in the forward pass (straight-through
estimator), then export true int8 weights + scales for the integer engine.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def fake_quant(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 fake-quantization with a straight-through estimator.

    forward: clamp(round(x/scale), -128, 127) * scale ; backward: identity
    (the standard STE, expressed with stop_gradient — no custom_vjp
    needed).
    """
    q = jnp.clip(jnp.round(x / scale), -128, 127) * scale
    return x + jax.lax.stop_gradient(q - x)


def weight_scale(w: jax.Array, axis: Optional[int] = None) -> jax.Array:
    """Symmetric scale = absmax/127. ``axis=None`` is per-tensor (what
    the reference compiler computes for non-QDQ weights,
    mars-compiler/src/main.rs process_conv); an int axis keeps that
    axis and reduces the rest — per-output-channel scales, matching
    what ``training.ptq.quantize_graph`` deploys on the exact tier
    (output channels sit LAST in the executor's HWIO layout, so
    ``axis=-1`` there)."""
    if axis is None:
        return jnp.maximum(jnp.max(jnp.abs(w)) / 127.0, 1e-8)
    axis = axis % w.ndim
    red = tuple(i for i in range(w.ndim) if i != axis)
    am = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    return jnp.maximum(am / 127.0, 1e-8)


def fake_quant_params(
    params: Dict[str, jax.Array], quantize: bool,
    channel_axis: Optional[int] = None,
) -> Dict[str, jax.Array]:
    """Fake-quantize float conv weights (4-D HWIO / 3-D depthwise).
    ``channel_axis`` selects per-channel scales (see weight_scale)."""
    if not quantize:
        return params
    out = {}
    for k, v in params.items():
        # v.size guard: real imported graphs can carry zero-size
        # materialized-dangling constants (ir.graph._materialize_dangling)
        # — absmax over an empty array has no identity
        if v.ndim >= 3 and v.size and jnp.issubdtype(v.dtype,
                                                     jnp.floating):
            out[k] = fake_quant(v, weight_scale(v, channel_axis))
        else:
            out[k] = v
    return out


def head_l2_loss(outputs: Dict[str, jax.Array],
                 targets: Dict[str, jax.Array]) -> jax.Array:
    """Simple dense regression loss over graph outputs (detection-head
    distillation / feature matching)."""
    loss = 0.0
    for k, v in outputs.items():
        loss = loss + jnp.mean(
            jnp.square(v.astype(jnp.float32)
                       - targets[k].astype(jnp.float32)))
    return loss / max(len(outputs), 1)


def make_train_step(
    forward: Callable[[Dict[str, jax.Array], Dict[str, jax.Array]],
                      Dict[str, jax.Array]],
    optimizer: optax.GradientTransformation,
    qat: bool = True,
    loss_fn: Callable = head_l2_loss,
    channel_axis: Optional[int] = None,
):
    """Build ``train_step(params, opt_state, inputs, targets)``.

    ``forward`` is the engine's traced graph body (f32 mode) — the same
    function served for inference, now differentiated. Works under jit
    and under pjit/sharding (grads psum over 'dp' happens automatically
    via GSPMD when params are replicated on dp). ``channel_axis=-1``
    trains against per-output-channel fake-quant (the scheme
    ``ptq.quantize_graph`` deploys).
    """

    def loss(params, inputs, targets):
        outs = forward(fake_quant_params(params, qat, channel_axis),
                       inputs)
        return loss_fn(outs, targets)

    def train_step(params, opt_state, inputs, targets):
        l, grads = jax.value_and_grad(loss)(params, inputs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return train_step


def insert_activation_fake_quant(graph, stats) -> "Graph":
    """Insert STE fake-quant observers on every float activation.

    Weight-only fake-quant trains at the weight-noise floor and cannot
    see the dominant deployed error term: ACTIVATION quantization. This
    pass rewrites an f32 IR graph so every non-const float tensor
    (inputs, every layer output) passes through a ``FAKE_QUANT`` node —
    int8 round-trip forward, identity backward (the executor implements
    the STE) — at the scale calibration chose (``ptq.CalibStats``), the
    same scales :func:`training.ptq.quantize_graph` deploys. The result
    is differentiable end to end and models the exact tier's dataflow;
    this is the torch-QAT observer-insertion step, done as an IR pass.

    Returns a NEW graph; scales are frozen at calibration values (the
    standard fine-tune recipe).
    """
    import copy

    from thingino_accel_tpu.ir.graph import Graph as G, Node, TensorInfo

    g = copy.deepcopy(graph)
    remap: Dict[str, str] = {}
    new_nodes: List[Node] = []

    def observe(name: str) -> None:
        t = g.tensors[name]
        if t.is_const or not np.issubdtype(np.dtype(t.dtype), np.floating):
            return
        s = stats.scale(name, default=0.0)
        if not s or s <= 0:
            return
        fq = f"{name}__fq"
        g.tensors[fq] = TensorInfo(name=fq, shape=t.shape, dtype=t.dtype)
        new_nodes.append(Node(op="FAKE_QUANT", inputs=[name],
                              outputs=[fq], attrs=dict(scale=float(s)),
                              name=f"fq_{name}"))
        remap[name] = fq

    for name in g.inputs:
        observe(name)
    for node in g.nodes:
        new_nodes.append(Node(
            op=node.op, inputs=[remap.get(i, i) for i in node.inputs],
            outputs=list(node.outputs), attrs=dict(node.attrs),
            name=node.name))
        for o in node.outputs:
            observe(o)
    out = G(nodes=new_nodes, tensors=g.tensors, inputs=list(g.inputs),
            outputs=[remap.get(o, o) for o in g.outputs],
            name=f"{g.name}_qat")
    out.validate()
    return out


def export_int8(
    params: Dict[str, jax.Array]
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Convert trained f32 conv weights to int8 + per-tensor scales
    (the PTQ step after QAT convergence)."""
    out, scales = {}, {}
    for k, v in params.items():
        a = np.asarray(v)
        if a.ndim >= 3 and np.issubdtype(a.dtype, np.floating):
            s = float(max(np.abs(a).max() / 127.0, 1e-8))
            out[k] = np.clip(np.round(a / s), -128, 127).astype(np.int8)
            scales[k] = s
        else:
            out[k] = a
    return out, scales
