"""Pipeline parallelism: stage-split a graph across devices.

The third parallelism axis (after dp/tp in ``parallel.mesh``): the IR is
cut into N stages balanced by estimated FLOPs, each stage jitted on its
own device, and microbatches stream through — stage i computes
microbatch m while stage i+1 computes m-1 (JAX's async dispatch gives
the overlap; inter-stage transfers ride device-to-device copies, ICI on
real TPU meshes).

Useful when a model's weights exceed one chip's HBM or to hide
per-stage latency in serving; for yolov5-class models dp is usually the
better axis, so this is an orthogonal tool, not the default.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence

import jax
import numpy as np

from thingino_accel_tpu.ir.graph import Graph, Node


def _node_cost(graph: Graph, node: Node) -> float:
    """FLOP estimate for stage balancing (convs dominate)."""
    if node.op in ("CONV2D", "DEPTHWISE_CONV2D"):
        out = graph.tensors[node.outputs[0]].shape
        k = node.attrs.get("kernel", (1, 1))
        cin = graph.tensors[node.inputs[0]].shape[-1]
        groups = node.attrs.get("groups", 1)
        return 2.0 * np.prod(out) * k[0] * k[1] * cin / max(groups, 1)
    if node.op == "FC" and len(node.inputs) > 1:
        w = graph.tensors[node.inputs[1]].shape
        return 2.0 * np.prod(w)
    out_t = graph.tensors.get(node.outputs[0])
    return float(np.prod(out_t.shape)) if out_t is not None else 1.0


def split_graph(graph: Graph, n_stages: int) -> List[Graph]:
    """Cut the (topologically ordered) node list into ``n_stages``
    contiguous stages with balanced FLOPs. Tensors crossing a boundary
    become the downstream stage's inputs."""
    costs = [_node_cost(graph, n) for n in graph.nodes]
    total = sum(costs)
    target = total / n_stages
    n_stages = min(n_stages, len(graph.nodes))
    stages_nodes: List[List[Node]] = [[] for _ in range(n_stages)]
    acc, si = 0.0, 0
    for idx, (node, c) in enumerate(zip(graph.nodes, costs)):
        nodes_left = len(graph.nodes) - idx
        stages_left = n_stages - si
        if si < n_stages - 1 and stages_nodes[si] and (
                acc >= target * (si + 1) or nodes_left <= stages_left - 1):
            si += 1
        stages_nodes[si].append(node)
        acc += c

    const_names = {n for n, t in graph.tensors.items() if t.is_const}
    stages: List[Graph] = []
    for si, nodes in enumerate(stages_nodes):
        stage_inputs: List[str] = []
        stage_produced = set()
        needed = set()
        for node in nodes:
            for i in node.inputs:
                if i in const_names:
                    continue
                if i not in stage_produced:
                    needed.add(i)
            stage_produced.update(node.outputs)
        stage_inputs = sorted(needed)
        # outputs: tensors needed by later stages or final outputs
        later_needed = set(graph.outputs)
        for later in stages_nodes[si + 1:]:
            for node in later:
                later_needed.update(node.inputs)
        stage_outputs = sorted(stage_produced & later_needed)
        tensors = {}
        for node in nodes:
            for nm in list(node.inputs) + list(node.outputs):
                tensors[nm] = graph.tensors[nm]
        for nm in stage_inputs + stage_outputs:
            tensors[nm] = graph.tensors[nm]
        g = Graph(nodes=list(nodes), tensors=tensors,
                  inputs=stage_inputs, outputs=stage_outputs,
                  name=f"{graph.name}_stage{si}")
        g.validate()
        stages.append(g)
    return stages


class PipelinedEngine:
    """Inference pipeline over explicit devices (one stage per device).

    Feed an iterator of microbatch dicts; results stream out in order.
    JAX's async dispatch overlaps stages automatically: while stage 1
    computes microbatch m, stage 0 already runs m+1.
    """

    def __init__(self, graph: Graph, devices: Optional[Sequence] = None,
                 options=None):
        from thingino_accel_tpu.runtime.engine import Engine, EngineOptions
        devices = list(devices if devices is not None else jax.devices())
        self.graph_outputs = list(graph.outputs)
        self.stages = split_graph(graph, len(devices))
        devices = devices[:len(self.stages)]
        self.devices = devices
        self.engines = []
        for g, d in zip(self.stages, devices):
            eng = Engine(g, options)
            params = {k: jax.device_put(v, d) for k, v in eng.params.items()}
            eng.params = params
            self.engines.append(eng)

    def _run_one(self, feed: Dict[str, Any]) -> Dict[str, Any]:
        env = dict(feed)
        for eng, dev in zip(self.engines, self.devices):
            stage_feed = {
                k: jax.device_put(env[k], dev) for k in eng.graph.inputs}
            out = eng._fn(eng.params, stage_feed)
            env.update(out)
        return {k: env[k] for k in self.graph_outputs}

    def run(self, microbatches: Iterable[Dict[str, Any]]
            ) -> Iterator[Dict[str, Any]]:
        import collections
        inflight: collections.deque = collections.deque()
        depth = len(self.devices) + 1
        for mb in microbatches:
            inflight.append(self._run_one(mb))
            if len(inflight) >= depth:
                yield jax.block_until_ready(inflight.popleft())
        while inflight:
            yield jax.block_until_ready(inflight.popleft())
