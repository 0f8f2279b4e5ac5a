"""Post-training quantization: f32 graph + calibration data -> int8 graph.

The reference's quantization pipeline is offline and external:
``scripts/quantize_onnx.py`` runs onnxruntime static QDQ quantization
with an image-folder calibration reader, then the compiler extracts the
QDQ scales (``mars-compiler/src/main.rs:137-217``). Here the whole loop
is in-framework: run the f32 engine over calibration batches, observe
per-tensor activation ranges, pick symmetric int8 scales, quantize
weights, and rewrite the IR to an int8 graph the exact integer engine
executes. The output round-trips through `.mars` (mars_export).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from thingino_accel_tpu.ir.graph import Graph, Node, QuantInfo, TensorInfo


@dataclasses.dataclass
class CalibStats:
    """Per-tensor absolute-max observer (symmetric quantization, matching
    the reference compiler's weight rule absmax/127)."""

    absmax: Dict[str, float]

    def scale(self, name: str, default: float = 1.0) -> float:
        am = self.absmax.get(name, 0.0)
        if am <= 0:
            return default
        return float(np.float32(am / 127.0))


def _mse_scale(sample: np.ndarray, absmax: float,
               n_grid: int = 40) -> float:
    """Quantization-MSE-optimal symmetric scale: search absmax
    fractions for the clip point minimizing E[(x - Q(x))^2]. The
    standard improvement over absmax/percentile observers — heavy-
    tailed activations (SiLU) waste most of the int8 range on
    outliers otherwise."""
    if absmax <= 0 or sample.size == 0:
        return 0.0
    cands = absmax * np.linspace(0.15, 1.0, n_grid, dtype=np.float32)
    scales = cands / 127.0                      # [K]
    q = np.clip(np.round(sample[None, :] / scales[:, None]),
                -128, 127) * scales[:, None]    # [K, N]
    mse = np.mean((q - sample[None, :]) ** 2, axis=1)
    return float(cands[int(np.argmin(mse))])


def calibrate(
    graph: Graph,
    batches: Iterable[Dict[str, np.ndarray]],
    percentile: Optional[float] = 99.99,
    method: str = "percentile",     # "percentile" | "mse"
    mse_samples: int = 65536,
) -> CalibStats:
    """Run the f32 graph over calibration batches, recording activation
    ranges for every tensor. ``method="percentile"`` clips at a high
    percentile of |x| (robust to outliers); ``method="mse"`` picks the
    per-tensor clip point minimizing quantization MSE on a value
    subsample (better for heavy-tailed SiLU activations — the fix for
    the exact tier's weak detection parity, ACCURACY.md)."""
    from thingino_accel_tpu.runtime.executor import (
        ExecOptions, build_executor, prepare_params,
    )
    # instrument: make every produced activation a graph output (the
    # tensors dict may carry dead entries after graph surgery)
    produced = set(graph.inputs)
    for node in graph.nodes:
        produced.update(node.outputs)
    all_acts = [n for n, t in graph.tensors.items()
                if not t.is_const and n in produced]
    probe = Graph(nodes=graph.nodes, tensors=graph.tensors,
                  inputs=graph.inputs, outputs=all_acts, name=graph.name)
    body = build_executor(probe, ExecOptions(mode="full",
                                             compute_dtype=jnp.float32,
                                             fuse_silu=False))
    params = {k: jnp.asarray(v) for k, v in prepare_params(graph).items()}
    fn = jax.jit(body)

    absmax: Dict[str, float] = {}
    raw_max: Dict[str, float] = {}
    samples: Dict[str, List[np.ndarray]] = {}
    rng = np.random.default_rng(0)
    for batch in batches:
        feed = {k: jnp.asarray(v, jnp.float32) for k, v in batch.items()}
        outs = fn(params, feed)
        for name, v in outs.items():
            a = np.abs(np.asarray(v, np.float32)).ravel()
            raw_max[name] = max(raw_max.get(name, 0.0),
                                float(a.max()) if a.size else 0.0)
            if method == "mse":
                k = min(a.size, max(1024, mse_samples // 8))
                # with-replacement draw: rng.choice(n, replace=False)
                # materializes an O(n) int64 permutation per tensor per
                # batch (~400MB for a 50M-element activation) just to
                # keep k samples; replacement is statistically
                # equivalent here (k << n)
                idx = rng.integers(0, a.size, size=k) \
                    if a.size > k else slice(None)
                samples.setdefault(name, []).append(a[idx])
            elif percentile is not None and a.size > 1000:
                m = float(np.percentile(a, percentile))
                absmax[name] = max(absmax.get(name, 0.0), m)
            else:
                absmax[name] = raw_max[name]
    if method == "mse":
        for name, chunks in samples.items():
            s = np.concatenate(chunks)
            if s.size > mse_samples:
                s = rng.choice(s, size=mse_samples, replace=False)
            best = _mse_scale(s, raw_max[name])
            absmax[name] = best if best > 0 else raw_max[name]
    return CalibStats(absmax=absmax)


def quantize_graph(
    graph: Graph,
    stats: CalibStats,
    weight_percentile: Optional[float] = None,
) -> Graph:
    """Rewrite an f32 IR graph as int8: weights absmax/127 per tensor,
    activations from calibration stats, biases to int32 accumulator
    units. The result runs on the exact integer engine and exports to
    `.mars` with well-formed descriptors."""
    tensors: Dict[str, TensorInfo] = {}
    conv_nodes = [n for n in graph.nodes
                  if n.op in ("CONV2D", "DEPTHWISE_CONV2D", "FC")]
    conv_w = {n.inputs[1]: n for n in conv_nodes if len(n.inputs) > 1}
    conv_b = {n.inputs[2]: n for n in conv_nodes if len(n.inputs) > 2}

    w_scales: Dict[str, np.ndarray] = {}
    for name, t in graph.tensors.items():
        nt = TensorInfo(name=t.name, shape=t.shape, dtype=t.dtype,
                        quant=t.quant, data=t.data,
                        source_format=t.source_format,
                        channel_scales=t.channel_scales)
        if t.is_const and name in conv_w and np.issubdtype(
                np.asarray(t.data).dtype, np.floating):
            # per-output-channel symmetric scales — the accuracy-critical
            # improvement over the reference compiler's per-tensor
            # absmax/127 rule. Output channels sit on axis 0 for conv
            # weights (OIHW/OHWI) but on the LAST axis for FC ([K, O]).
            data = np.asarray(t.data, np.float32)
            ch_axis = data.ndim - 1 if conv_w[name].op == "FC" else 0
            axes = tuple(i for i in range(data.ndim) if i != ch_axis)
            am = np.abs(data).max(axis=axes)
            sc = np.maximum(am / 127.0, 1e-8).astype(np.float32)
            bshape = tuple(-1 if i == ch_axis else 1
                           for i in range(data.ndim))
            nt.data = np.clip(np.round(data / sc.reshape(bshape)),
                              -128, 127).astype(np.int8)
            nt.dtype = nt.data.dtype
            nt.quant = QuantInfo(scale=float(sc.mean()))
            nt.channel_scales = sc
            w_scales[name] = sc
        tensors[name] = nt

    # biases after weight scales are known
    for name, node in conv_b.items():
        t = tensors.get(name)
        if t is None or t.data is None or not np.issubdtype(
                np.asarray(t.data).dtype, np.floating):
            continue
        x_name, w_name = node.inputs[0], node.inputs[1]
        xs = stats.scale(x_name)
        if w_name in w_scales:
            ws = np.asarray(w_scales[w_name], np.float32)
        else:
            # weight was already int8 (skipped above): use its EXISTING
            # scales — a 1.0 fallback would quantize the bias ~100x off
            wt = graph.tensors[w_name]
            ws = (np.asarray(wt.channel_scales, np.float32)
                  if wt.channel_scales is not None
                  else np.float32(wt.quant.scale or 1.0))
        denom = np.maximum(np.float32(xs) * ws, 1e-20)
        t.data = np.clip(np.round(np.asarray(t.data, np.float64) / denom),
                         np.iinfo(np.int32).min, np.iinfo(np.int32).max
                         ).astype(np.int32)
        t.dtype = t.data.dtype

    # activations -> int8 with calibrated scales
    for name, t in tensors.items():
        if t.is_const:
            continue
        if np.issubdtype(np.dtype(t.dtype), np.floating):
            t.dtype = np.dtype(np.int8)
            t.quant = QuantInfo(scale=stats.scale(name))

    g = Graph(nodes=[Node(op=n.op, inputs=list(n.inputs),
                          outputs=list(n.outputs), attrs=dict(n.attrs),
                          name=n.name) for n in graph.nodes],
              tensors=tensors, inputs=list(graph.inputs),
              outputs=list(graph.outputs), name=f"{graph.name}_int8")
    g.validate()
    return g


def quantize_model(
    graph: Graph,
    batches: Iterable[Dict[str, np.ndarray]],
    percentile: Optional[float] = 99.99,
    method: str = "percentile",
) -> Graph:
    """One-call PTQ: calibrate + quantize."""
    stats = calibrate(graph, batches, percentile, method=method)
    return quantize_graph(graph, stats)
