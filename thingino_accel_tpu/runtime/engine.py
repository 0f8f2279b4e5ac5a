"""The inference engine: load -> compile once -> run many.

API shape mirrors the reference runtime
(``include/mars_runtime.h:79-138``: mars_load_file / mars_get_input /
mars_run / mars_get_output) but the execution model is TPU-native: the
whole network is one jitted XLA program with weights resident on device,
replacing ``mars_run``'s per-layer loop + DDR ping-pong planner
(``src/mars/mars_runtime.c:240-337,439-459``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from thingino_accel_tpu.formats import mars as M
from thingino_accel_tpu.ir.graph import Graph, from_mars
from thingino_accel_tpu.ir import passes
from thingino_accel_tpu.utils import config
from thingino_accel_tpu.runtime.executor import (
    ExecOptions, build_executor, prepare_params,
)


@dataclasses.dataclass
class EngineOptions(ExecOptions):
    """ExecOptions + engine-level switches.

    ``precision``:
    - ``"exact"``  — bit-exact int8 integer path (the parity tier,
      mirroring the reference's requantization semantics to the bit).
    - ``"fast"``   — int8 storage, bf16 MXU compute: the graph is
      dequantized at load (``ir.passes.dequantize_graph``); int8 I/O
      preserved at the edges.
    - ``"serving"`` — int8 storage AND int8 MXU compute (2x bf16 peak)
      through the fused pallas kernels (``ops.fused_kernels``):
      activations fold into the conv requantize epilogue
      (``ir.passes.fuse_act_into_conv``), so each conv costs one int8
      HBM read + one int8 write. Linear/RELU convs use the same
      combined-scale requant math as "exact", but fused chains skip
      intermediate quantizations: SiLU/Leaky run on the f32
      pre-activation, and fused conv->ADD chains skip the conv
      output's own requant AND its int8 clamp — if the conv output
      would saturate at its own out_scale on the exact tier, the
      serving tier can diverge by more than one quantum (by design:
      fewer quantizations is closer to the f32 oracle, ACCURACY.md).
    """

    nchw_io: bool = False       # accept/return NCHW (the .mars declared layout)
    fold_bn: bool = True        # fold f32 conv+bn at load
    precision: str = "exact"    # "exact" | "fast"
    quantize_outputs: bool = True  # fast tier: keep int8 outputs at edges
    donate_inputs: bool = False
    jit: bool = True
    # fast-tier graph rewrites; None = the TAT_CONV_MERGE /
    # TAT_FPN_SPLIT env defaults (utils/config.py)
    conv_merge: Optional[bool] = None
    fpn_split: Optional[str] = None   # "" | "1"/"upsample" | "wide" | "all"


class Engine:
    """Compiled inference engine over a :class:`Graph`."""

    def __init__(self, graph: Graph, options: Optional[EngineOptions] = None):
        self.options = options or EngineOptions()
        if self.options.precision == "fast" and self.options.mode == "full":
            graph = passes.dequantize_graph(
                graph, quantize_outputs=self.options.quantize_outputs)
            if self.options.compute_dtype == jnp.float32:
                self.options = dataclasses.replace(
                    self.options, compute_dtype=jnp.bfloat16)
            if self.options.fold_bn:
                # fold BEFORE the structural rewrites: merging/splitting
                # a conv that feeds a BatchNorm would break the conv->BN
                # adjacency the fold needs (f32-imported graphs)
                graph = passes.fold_batchnorm(graph)
            merge = self.options.conv_merge
            if merge is None:
                merge = config.get("TAT_CONV_MERGE")
            if merge:
                passes.merge_sibling_convs(graph)
            fpn_split = self.options.fpn_split
            if fpn_split is None:
                fpn_split = config.get("TAT_FPN_SPLIT")
            if fpn_split:
                passes.split_concat_convs(
                    graph, mode=(fpn_split if fpn_split in ("all", "wide")
                                 else "upsample"))
        elif self.options.precision == "serving" and \
                self.options.mode == "full":
            graph = passes.fuse_act_into_conv(graph)
            if self.options.conv_backend is None:
                self.options = dataclasses.replace(
                    self.options, conv_backend="fused")
        if self.options.fold_bn and self.options.mode == "full":
            graph = passes.fold_batchnorm(graph)
        self.graph = graph
        self._np_params = prepare_params(graph)
        self.params = {k: jnp.asarray(v) for k, v in self._np_params.items()}
        fn = build_executor(graph, self.options)
        if self.options.jit:
            # donate_inputs lets XLA reuse the input batch buffer for
            # activations (saves one HBM buffer per call; callers must
            # not reuse the fed arrays)
            donate = (1,) if self.options.donate_inputs else ()
            self._fn = jax.jit(fn, donate_argnums=donate)
        else:
            self._fn = fn
        # mars_model_t-style stats (include/mars_runtime.h:64-66)
        self.inference_count = 0
        self.total_inference_s = 0.0

    # -- loading ------------------------------------------------------------

    @classmethod
    def from_mars(
        cls,
        src: Union[str, bytes, M.MarsModel],
        options: Optional[EngineOptions] = None,
        outputs: Optional[List[str]] = None,
        **import_kwargs: Any,
    ) -> "Engine":
        model = src if isinstance(src, M.MarsModel) else M.read_mars(src)
        graph = from_mars(model, **import_kwargs)
        if outputs is not None:
            graph = graph.with_outputs(outputs)
        return cls(graph, options)

    # -- introspection (mars_get_input/output analogs) ----------------------

    @property
    def input_names(self) -> List[str]:
        return list(self.graph.inputs)

    @property
    def output_names(self) -> List[str]:
        return list(self.graph.outputs)

    def input_info(self, index: int = 0):
        return self.graph.tensors[self.graph.inputs[index]]

    def output_info(self, index: int = 0):
        return self.graph.tensors[self.graph.outputs[index]]

    # -- execution ----------------------------------------------------------

    def _to_nhwc(self, x):
        # jnp.transpose works uniformly on numpy and jax arrays — a
        # jax.Array input must not skip the NCHW->NHWC conversion.
        if self.options.nchw_io and x.ndim == 4:
            return jnp.transpose(x, (0, 2, 3, 1))
        return x

    def _from_nhwc(self, x: np.ndarray) -> np.ndarray:
        if self.options.nchw_io and x.ndim == 4:
            return np.transpose(x, (0, 3, 1, 2))
        return x

    def run(self, *args: Any, **inputs: Any) -> Dict[str, jax.Array]:
        """Run inference. Positional args map to graph inputs in order.

        A single dict positional is accepted as a name->array feed
        (the shape ``run`` itself returns). Returns dict name -> NHWC
        jax array (or NCHW if ``nchw_io``).
        """
        if len(args) == 1 and isinstance(args[0], dict):
            inputs = {**args[0], **inputs}
            args = ()
        feed: Dict[str, jax.Array] = {}
        for name, arr in zip(self.graph.inputs, args):
            feed[name] = arr
        for name, arr in inputs.items():
            if name not in self.graph.tensors:
                raise KeyError(f"unknown input {name!r}")
            feed[name] = arr
        for name in self.graph.inputs:
            if name not in feed:
                raise ValueError(f"missing input {name!r}")
            x = np.asarray(feed[name]) if not isinstance(feed[name], jax.Array) \
                else feed[name]
            x = self._to_nhwc(x)
            want = self.graph.tensors[name].dtype
            feed[name] = jnp.asarray(x, dtype=want)

        t0 = time.perf_counter()
        out = self._fn(self.params, feed)
        jax.block_until_ready(out)
        self.total_inference_s += time.perf_counter() - t0
        self.inference_count += 1
        if self.options.nchw_io:
            out = {k: jnp.asarray(self._from_nhwc(np.asarray(v)))
                   for k, v in out.items()}
        return out

    __call__ = run

    def run_np(self, *args: Any, **inputs: Any) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.run(*args, **inputs).items()}

    def trace(self, *args: Any, **inputs: Any) -> Dict[str, np.ndarray]:
        """Run inference returning EVERY intermediate activation.

        The debugging analog of the reference's layer-graph side-car
        recording + per-layer printf narration (``src/venus/magik_model.cpp``
        g_parsed_layers, SURVEY §5 observability): one call, all tensors,
        for layer-by-layer comparison against another implementation.
        """
        produced = set(self.graph.inputs)
        for node in self.graph.nodes:
            produced.update(node.outputs)
        all_acts = [n for n, t in self.graph.tensors.items()
                    if not t.is_const and n in produced]
        probe = Graph(nodes=self.graph.nodes, tensors=self.graph.tensors,
                      inputs=self.graph.inputs, outputs=all_acts,
                      name=self.graph.name)
        body = build_executor(probe, self.options)
        feed: Dict[str, Any] = {}
        for name, arr in zip(self.graph.inputs, args):
            feed[name] = arr
        feed.update(inputs)
        feed = {k: jnp.asarray(self._to_nhwc(np.asarray(v)),
                               dtype=self.graph.tensors[k].dtype)
                for k, v in feed.items()}
        out = jax.jit(body)(self.params, feed)
        return {k: np.asarray(v) for k, v in out.items()}

    # -- reporting ----------------------------------------------------------

    def summary(self) -> str:
        g = self.graph
        nparams = sum(int(np.prod(v.shape)) for v in self._np_params.values())
        lines = [
            f"Engine[{self.options.mode}] {g.name}: {len(g.nodes)} nodes, "
            f"{nparams} weight elems",
        ]
        for n in g.inputs:
            t = g.tensors[n]
            lines.append(f"  in  {n}: {t.shape} {t.dtype}")
        for n in g.outputs:
            t = g.tensors[n]
            lines.append(f"  out {n}: {t.shape} {t.dtype}")
        if self.inference_count:
            avg = self.total_inference_s / self.inference_count * 1e3
            lines.append(
                f"  {self.inference_count} inferences, avg {avg:.3f} ms")
        return "\n".join(lines)
