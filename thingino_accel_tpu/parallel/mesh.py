"""Mesh construction and sharding rules for the engine's param/activation
layout (NHWC activations, HWIO conv weights).

Design (scaling-book recipe): pick a mesh, annotate shardings, let XLA
insert collectives.

- ``dp`` axis: batch dimension of activations — pure data parallel, no
  collectives in inference, one psum for grads in training.
- ``tp`` axis: output-channel dimension of conv weights (HWIO's O) and
  everything per-channel (bias). With activations replicated over tp,
  each device computes a channel slice of every conv; XLA inserts
  all-gathers only where a spatial op mixes channels (concat) — for CNN
  graphs this collapses to cheap layout ops riding ICI.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices=None,
) -> Mesh:
    """Create a ('dp','tp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_sharding_rules(
    params: Dict[str, np.ndarray], mesh: Mesh
) -> Dict[str, NamedSharding]:
    """Sharding for the engine param dict.

    HWIO conv weights shard O over 'tp' when divisible; 1-D per-channel
    tensors (bias, bn scale) likewise; everything else replicated.
    """
    tp = mesh.shape["tp"]
    out = {}
    for name, arr in params.items():
        spec = P()
        if tp > 1:
            if arr.ndim == 4 and arr.shape[3] % tp == 0:
                spec = P(None, None, None, "tp")   # HWIO: shard O
            elif arr.ndim == 3 and arr.shape[2] % tp == 0:
                spec = P(None, None, "tp")         # depthwise [KH,KW,C]
            elif arr.ndim == 1 and arr.shape[0] % tp == 0:
                spec = P("tp")
        out[name] = NamedSharding(mesh, spec)
    return out


def shard_params(params: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Place engine params on the mesh according to the rules."""
    rules = param_sharding_rules(
        {k: np.asarray(v) for k, v in params.items()}, mesh)
    return {k: jax.device_put(v, rules[k]) for k, v in params.items()}


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: batch over 'dp', replicated over 'tp'."""
    return NamedSharding(mesh, P("dp"))
