"""Quantization-aware training.

The reference is inference-only; its int8 models come from offline
post-training quantization (``scripts/quantize_onnx.py`` -> QDQ ONNX ->
mars-compiler). QAT closes that loop inside the framework: train f32
weights with fake-quantization in the forward pass (straight-through
estimator), then export true int8 weights + scales for the integer engine.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

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


def weight_scale(w: jax.Array) -> jax.Array:
    """Per-tensor symmetric scale = absmax/127 (what the reference
    compiler computes for non-QDQ weights, mars-compiler/src/main.rs
    process_conv)."""
    return jnp.maximum(jnp.max(jnp.abs(w)) / 127.0, 1e-8)


def fake_quant_params(
    params: Dict[str, jax.Array], quantize: bool
) -> Dict[str, jax.Array]:
    """Fake-quantize float conv weights (4-D HWIO / 3-D depthwise)."""
    if not quantize:
        return params
    out = {}
    for k, v in params.items():
        if v.ndim >= 3 and jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = fake_quant(v, weight_scale(v))
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
):
    """Build ``train_step(params, opt_state, inputs, targets)``.

    ``forward`` is the engine's traced graph body (f32 mode) — the same
    function served for inference, now differentiated. Works under jit
    and under pjit/sharding (grads psum over 'dp' happens automatically
    via GSPMD when params are replicated on dp).
    """

    def loss(params, inputs, targets):
        outs = forward(fake_quant_params(params, qat), inputs)
        return loss_fn(outs, targets)

    def train_step(params, opt_state, inputs, targets):
        l, grads = jax.value_and_grad(loss)(params, inputs, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return train_step


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
