"""IR executor: traces the whole graph into one jitted XLA program.

This is the TPU replacement for the reference's per-layer interpreter
(``src/mars/mars_runtime.c:439-459`` + the execute_* dispatch ``:1161-1224``):
instead of running layers one by one through hand-managed ping-pong DDR
buffers (``:240-337``), the entire network is traced once into a single
XLA computation — buffer placement, fusion, and scheduling belong to the
compiler.

Two execution modes:

- ``full``   — every declared op implemented with real semantics
  (depthwise/avgpool/softmax/transpose included, which the reference
  accepts but skips, ``mars_runtime.c:1168-1213``).
- ``compat`` — replicates the reference runtime's observable behavior for
  bit-parity testing: pass-through ops are identity, RELU6 behaves as RELU,
  SiLU stays an unfused SIGMOID+MUL pair with intermediate requantization.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thingino_accel_tpu.ir.graph import Graph, Node, TensorInfo
from thingino_accel_tpu.ops import conv as conv_mod
from thingino_accel_tpu.ops import reference as R
from thingino_accel_tpu.ops.quant import RoundMode


@dataclasses.dataclass
class ExecOptions:
    mode: str = "full"               # "full" | "compat"
    conv_backend: Optional[str] = None   # None -> ops.conv global default
    compute_dtype: Any = jnp.float32     # f32-model conv compute (bfloat16 = fast)
    accum_dtype: Any = None              # conv accumulation (bfloat16 = fastest)
    round_mode: RoundMode = RoundMode.HALF_AWAY  # conv epilogue rule
    fuse_silu: bool = True           # fuse SIGMOID+MUL pairs (full mode)


def _is_int8(t: TensorInfo) -> bool:
    return np.issubdtype(t.dtype, np.signedinteger) and t.dtype.itemsize == 1


def _kernel_act(act: str) -> str:
    """Serving-kernel activation name. ``TAT_FAST_SILU=1`` routes SILU
    through the rational fast-sigmoid epilogue
    (``ops.fused_kernels._sigmoid_fast``, |silu err| < 6e-3). Default
    OFF: measured on a v5e, Mosaic's exp-based sigmoid is FASTER than
    the Pade + Newton-reciprocal VPU sequence (every SILU kernel ran
    8-30% slower with it — docs/KERNELS.md round-3 negative results),
    so the exact path wins on both axes."""
    from thingino_accel_tpu.ops import fused_kernels as FK
    from thingino_accel_tpu.utils import config
    if act == "SILU" and config.get("TAT_FAST_SILU"):
        return "SILU_FAST"
    return act if act in FK.ACTS else "NONE"


def _act_applied(f_act: str, act: str) -> bool:
    """Did the kernel's epilogue already apply the node's activation?
    (SILU_FAST is the serving implementation OF SILU.)"""
    return f_act == act or (f_act == "SILU_FAST" and act == "SILU")


def _nhwc_out_hw(t: TensorInfo) -> Tuple[int, int]:
    return t.shape[1], t.shape[2]


def prepare_params(graph: Graph) -> Dict[str, np.ndarray]:
    """Constants of the graph as device-ready arrays.

    Conv weights are stored OIHW in the IR; the executor consumes HWIO
    (kernel-position-major so each tap is a ``[C, O]`` matmul operand tile
    on the MXU). Depthwise weights become ``[KH, KW, C]``.
    """
    consumers = graph.consumers()
    params: Dict[str, np.ndarray] = {}
    dw_weights = set()
    conv_weights = set()
    for node in graph.nodes:
        if node.op in ("CONV2D", "DEPTHWISE_CONV2D"):
            w = _conv_weight_name(graph, node)
            if w is not None:
                groups = node.attrs.get("groups", 1)
                cin = graph.tensors[node.inputs[0]].shape[3]
                if node.op == "DEPTHWISE_CONV2D" or (groups > 1 and groups == cin):
                    dw_weights.add(w)
                else:
                    conv_weights.add(w)
    for name, t in graph.tensors.items():
        if not t.is_const:
            continue
        data = t.data
        if name in conv_weights:
            data = np.ascontiguousarray(np.transpose(data, (2, 3, 1, 0)))  # OIHW->HWIO
        elif name in dw_weights:
            o, i, kh, kw = data.shape  # OIHW with I=1 (or O=C,I=1)
            data = np.ascontiguousarray(
                data.reshape(o * i, kh, kw).transpose(1, 2, 0))  # -> [KH,KW,C]
        params[name] = data
    return params


def _conv_weight_name(graph: Graph, node: Node) -> Optional[str]:
    # conv inputs: [x, weight, (bias)]
    if len(node.inputs) >= 2:
        return node.inputs[1]
    return None


def build_executor(
    graph: Graph, opts: ExecOptions
) -> Callable[[Dict[str, jax.Array], Dict[str, jax.Array]], Dict[str, jax.Array]]:
    """Return ``fn(params, inputs) -> outputs`` ready for jax.jit."""

    compat = opts.mode == "compat"
    tensors = graph.tensors

    nodes = list(graph.nodes)
    if opts.fuse_silu and not compat:
        from thingino_accel_tpu.ir.passes import fuse_silu_pairs
        nodes = fuse_silu_pairs(graph)

    plan = _plan_folds(nodes, tensors, graph.outputs) \
        if opts.conv_backend == "fused" and not compat else None

    def fn(params: Dict[str, jax.Array],
           inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        env: Dict[str, jax.Array] = {}
        env.update(inputs)
        for name, arr in params.items():
            env[name] = arr

        for node in nodes:
            if plan is not None:
                out0 = node.outputs[0] if node.outputs else None
                if out0 in plan.skip_outputs and (
                        out0 in env or out0 in plan.virtual_concat
                        or out0 in plan.pool_of):
                    continue   # folded into a consumer's kernel
                if _lower_node_folded(node, env, tensors, opts, plan):
                    continue
                _unfold_inputs(node, env, tensors, plan)
            _lower_node(node, env, tensors, opts, compat)
            if plan is not None:
                # a node lowered on the logical path produces fold-1 output
                for o in node.outputs:
                    plan.runtime_fold.pop(o, None)

        for o in graph.outputs:
            _ensure_logical(o, env, tensors, plan)
        return {o: env[o] for o in graph.outputs}

    return fn


# ---------------------------------------------------------------------------
# Fold-layout planning & lowering (serving tier, conv_backend="fused")
# ---------------------------------------------------------------------------
#
# Activations with C < 128 are stored W-folded ([B, H, W/f, f*C]) so the
# int8 (8,128) HBM tiling doesn't pad them (2-4x traffic) and the MXU
# sees full 128-lane contractions. Fold factors halve across stride-2
# convs, which keeps the layout globally consistent through the YOLO
# trunk (C doubles exactly when the stride halves the fold). Ops that
# are not fold-aware get logical inputs via a lazy unfold.

_FOLD_ELTWISE = ("RELU", "RELU6", "LEAKY_RELU", "SILU", "SILU_FUSED",
                 "SIGMOID", "CLIP")


def _clip_q(x, lo, hi, in_scale):
    """CLIP with ONNX real-valued bounds. Integer tensors clamp the
    QUANTIZED bounds (``trunc(v/scale ± 0.5)``, the RELU6 rule —
    ``ops.reference.relu6``); raw real bounds on int8 codes would clip
    the real value at ``bound * scale`` instead of ``bound``."""
    out = x
    if jnp.issubdtype(x.dtype, jnp.integer):
        sc = np.float32(in_scale or 1.0)

        def q(v):
            t = np.float32(v) / sc
            t = np.trunc(t + (0.5 if t >= 0 else -0.5))
            return int(np.clip(t, -128, 127))

        lo = q(lo) if lo is not None else None
        hi = q(hi) if hi is not None else None
    if lo is not None:
        out = jnp.maximum(out, jnp.asarray(lo, out.dtype))
    if hi is not None:
        out = jnp.minimum(out, jnp.asarray(hi, out.dtype))
    return out


class _FoldPlan:
    def __init__(self):
        self.fold: Dict[str, int] = {}      # planned fold per tensor
        self.parts: Dict[str, tuple] = {}   # channel-concat structure
        self.runtime_fold: Dict[str, int] = {}  # env arrays currently folded
        # stem stage: thin-channel convs kept in XLA's bf16 world with
        # integer values carried as bf16 ("qbf16") between them — no
        # int8 materialization/relayout until the stage exit conv
        self.stem_stage: set = set()        # conv OUTPUT names in stage
        self.stem_emit: Dict[str, str] = {}  # out name -> "qbf16"|"int8"
        self.qbf16_env: set = set()         # env names currently qbf16
        # epilogue fusions (pattern-matched at plan time):
        self.consumers: Dict[str, list] = {}
        self.res_fuse: Dict[str, tuple] = {}   # conv out -> (add_node,
        #   other_input) — the ADD runs in the conv epilogue
        self.virtual_concat: Dict[str, list] = {}  # concat out ->
        #   input names (never materialized; consumers are 1x1 convs)
        self.sppf: Dict[str, tuple] = {}    # concat out -> (src, k)
        self.bneck: Dict[str, tuple] = {}   # m name -> (convA, convB):
        #   1x1 convA -> KxK convB pair fused into one kernel with the
        #   intermediate m resident in VMEM (the C3 bottleneck)
        self.bneck_live: set = set()        # m names deferred at runtime
        self.pool_of: Dict[str, tuple] = {}  # skipped maxpool out ->
        #   (predecessor name, k) for on-demand one-level recompute
        self.skip_outputs: set = set()      # nodes folded into a
        #   consumer's kernel (fused ADDs, SPPF maxpools)

    def f(self, name: str) -> int:
        return self.fold.get(name, 1)


def _conv_fold_eligible(node: Node, tensors) -> bool:
    if node.op != "CONV2D" or len(node.inputs) < 2:
        return False
    a = node.attrs
    in_t = tensors[node.inputs[0]]
    out_t = tensors[node.outputs[0]]
    if not (_is_int8(in_t) and _is_int8(out_t)):
        return False
    if a.get("dilation", (1, 1)) != (1, 1):
        return False
    st = a.get("stride", (1, 1))
    if st[0] != st[1]:
        return False
    if a.get("groups", 1) != 1:
        return False
    if len(in_t.shape) != 4 or 0 in in_t.shape or 0 in out_t.shape:
        return False
    return True


def _plan_folds(nodes, tensors, graph_outputs) -> _FoldPlan:
    plan = _FoldPlan()

    # stem-stage membership: a fold-eligible conv is kept on the XLA
    # bf16-exact path when its input channels are thin — either the
    # graph-input stem (cin < 16) or a conv consuming a stage conv's
    # qbf16 output with cin < 48 (K*K*C <= 1024 keeps f32 accumulation
    # exact). It emits qbf16 iff every consumer of its output is also a
    # stage conv; the last stage conv emits folded int8.
    consumers: Dict[str, list] = {}
    for node in nodes:
        for i in node.inputs:
            consumers.setdefault(i, []).append(node)

    def stage_eligible(node, cin_limit):
        if not _conv_fold_eligible(node, tensors):
            return False
        a = node.attrs
        k = a.get("kernel", (1, 1))
        cin = tensors[node.inputs[0]].shape[3]
        act = a.get("activation", "NONE")
        return (cin < cin_limit and k[0] * k[1] * cin <= 1024
                and act in ("NONE", "RELU", "LEAKY_RELU", "SILU"))

    stage = {n.outputs[0] for n in nodes if stage_eligible(n, 16)}
    from thingino_accel_tpu.utils import config as _cfg0
    # TAT_STEM_NOGROW: keep the stage at the seed convs — the convs it
    # would absorb (e.g. the 3x3 s2 trunk entry) then run on the folded
    # pallas path with int8 I/O, and the stage-exit f32-accumulator
    # read + quantize pass happens once, on the stem conv's output,
    # instead of on the (larger) grown-conv accumulator chain.
    grown = not _cfg0.get("TAT_STEM_NOGROW")
    while grown:   # grow chains: thin conv consuming a stage conv
        grown = False
        for node in nodes:
            out = node.outputs[0]
            if (out not in stage and stage_eligible(node, 48)
                    and tensors[node.inputs[0]].shape[3] >= 16
                    and node.inputs[0] in stage):
                stage.add(out)
                grown = True

    def emits(st):
        em = {}
        for node in nodes:
            out = node.outputs[0]
            if out not in st:
                continue
            cons = consumers.get(out, [])
            qb = bool(cons) and all(
                c.op == "CONV2D" and c.outputs[0] in st
                and c.inputs[0] == out for c in cons)
            em[out] = "qbf16" if qb else "int8"
        return em

    while True:   # prune: a grown conv needs a qbf16-emitting source
        em = emits(stage)
        drop = {n.outputs[0] for n in nodes
                if n.outputs[0] in stage
                and tensors[n.inputs[0]].shape[3] >= 16
                and em.get(n.inputs[0]) == "int8"}
        if not drop:
            break
        stage -= drop
    plan.stem_stage = stage
    plan.stem_emit = emits(stage)

    # qbf16 stage EXITS: when every consumer of the exit tensor is a
    # plain fold-eligible 1x1 serving conv, the exit can stay in bf16
    # (integer values) — the consumers' matmul kernels cast int8 in
    # VMEM (ops.pallas_kernels.dot_i8), deleting the stage-exit
    # f32->int8 quantize pass. Other consumer shapes fall back via
    # _ensure_logical, so the gate here is a perf choice, not a
    # correctness one.
    for node in nodes:
        out = node.outputs[0]
        if plan.stem_emit.get(out) != "int8" or out in graph_outputs:
            continue
        cons = consumers.get(out, [])
        from thingino_accel_tpu.utils import config as _cfg
        if _cfg.get("TAT_QBF16_EXIT") and cons and all(
                c.op == "CONV2D" and _conv_fold_eligible(c, tensors)
                and c.inputs[0] == out and out not in c.inputs[1:]
                and c.outputs[0] not in stage
                and c.attrs.get("kernel", (1, 1)) == (1, 1)
                and c.attrs.get("stride", (1, 1)) == (1, 1)
                for c in cons):
            # "qbf16x": bf16 VALUES but the EXIT fold layout — unlike
            # stage-internal "qbf16", this tensor leaves the stage and
            # must seed the downstream fold chain. Default OFF
            # (TAT_QBF16_EXIT): XLA materializes the conv's f32
            # accumulator either way, so the bf16 exit only widens the
            # convert pass (55.3 vs 45.7 us/frame measured) — kept as
            # the tested mechanism for stems whose consumers could
            # fuse the convert (docs/KERNELS.md round-3 negatives)
            plan.stem_emit[out] = "qbf16x"

    for node in nodes:
        out = node.outputs[0]
        if _conv_fold_eligible(node, tensors):
            a = node.attrs
            s = a.get("stride", (1, 1))[0]
            cin = tensors[node.inputs[0]].shape[3]
            o = tensors[out].shape[3]
            ow = tensors[out].shape[2]
            if out in plan.stem_stage:
                if plan.stem_emit[out] == "qbf16":
                    continue   # no fold; stays bf16 inside the stage
                # stage exit (int8 or qbf16x): seed the fold chain
                f = next((c for c in (4, 2)
                          if c * o <= 128 and ow % c == 0), 1)
            elif cin < 16:   # stem: seed the fold chain from the output
                f = next((c for c in (4, 2)
                          if c * o <= 128 and ow % c == 0), 1)
            else:
                fin = plan.f(node.inputs[0])
                f = fin // s if (fin % s == 0 and fin >= s) else 1
                if f > 1 and ow % f:
                    f = 1
            plan.fold[out] = f
            plan.parts[out] = (o,)
        elif node.op in ("ADD", "MUL") and len(node.inputs) == 2:
            fa, fb = plan.f(node.inputs[0]), plan.f(node.inputs[1])
            pa = plan.parts.get(node.inputs[0])
            pb = plan.parts.get(node.inputs[1])
            if fa == fb and fa > 1 and pa == pb:
                plan.fold[out] = fa
                plan.parts[out] = pa
        elif node.op in _FOLD_ELTWISE:
            f = plan.f(node.inputs[0])
            if f > 1:
                plan.fold[out] = f
                plan.parts[out] = plan.parts.get(node.inputs[0])
        elif node.op == "CONCAT":
            fs = [plan.f(i) for i in node.inputs]
            shp = [tensors[i].shape for i in node.inputs]
            same_hw = all(len(sh) == 4 and sh[:3] == shp[0][:3]
                          for sh in shp)
            tot = sum(sh[3] for sh in shp) if same_hw else -1
            if (same_hw and len(set(fs)) == 1 and fs[0] > 1
                    and len(tensors[out].shape) == 4
                    and tensors[out].shape[3] == tot):
                plan.fold[out] = fs[0]
                ps = []
                for i in node.inputs:
                    ps.extend(plan.parts.get(i, (tensors[i].shape[3],)))
                plan.parts[out] = tuple(ps)

    plan.consumers = consumers
    _plan_epilogue_fusions(nodes, tensors, plan, consumers,
                           set(graph_outputs))
    return plan


def _plan_epilogue_fusions(nodes, tensors, plan, consumers,
                           graph_outputs) -> None:
    """Pattern-match fusions that run inside a conv kernel's epilogue:

    - residual add: ``ADD(conv_out, r)`` where the conv's output has no
      other consumer -> the add joins the conv's requant epilogue
      (one fewer int8 round-trip AND one fewer intermediate
      quantization — serving-tier semantics);
    - virtual concat: a CONCAT consumed only by 1x1/s1 fused convs is
      never materialized (each conv sums per-part dots);
    - SPPF: CONCAT(y, m1, m2, m3) with m_{i+1} = KxK/1 maxpool(m_i)
      consumed by 1x1 convs -> pools run in the conv kernel's VMEM.
    """
    by_out = {n.outputs[0]: n for n in nodes if n.outputs}

    def conv_1x1_fused_ok(c_node, src):
        a = c_node.attrs
        return (c_node.op == "CONV2D" and c_node.inputs
                and c_node.inputs[0] == src
                and _conv_fold_eligible(c_node, tensors)
                and c_node.outputs[0] not in plan.stem_stage
                and a.get("kernel", (1, 1)) == (1, 1)
                and a.get("stride", (1, 1)) == (1, 1)
                and a.get("activation", "NONE") in (
                    "NONE", "RELU", "LEAKY_RELU", "SILU"))

    # residual adds
    for node in nodes:
        out = node.outputs[0]
        if not _conv_fold_eligible(node, tensors) \
                or out in plan.stem_stage:
            continue
        if node.attrs.get("activation", "NONE") not in (
                "NONE", "RELU", "SILU"):
            # LEAKY excluded: its alpha applies on the already-
            # quantized int8 value (reference semantics), which is
            # incompatible with the fused residual's pre-quantization
            # add (ops.fused_kernels._epilogue)
            continue
        cons = consumers.get(out, [])
        if out in graph_outputs:
            continue   # the conv's own tensor must stay materialized
        if len(cons) != 1 or cons[0].op != "ADD" \
                or len(cons[0].inputs) != 2:
            continue
        add = cons[0]
        other = add.inputs[0] if add.inputs[1] == out else add.inputs[1]
        if other == out:
            continue   # ADD(x, x) self-add
        o_ch = tensors[out].shape[3]
        ot = tensors.get(other)
        at = tensors.get(add.outputs[0])
        if ot is None or at is None or not (_is_int8(ot) and _is_int8(at)):
            continue
        if tuple(ot.shape) != tuple(tensors[out].shape):
            continue
        # residual must arrive in the same folded layout the conv emits
        if plan.f(other) != plan.f(out):
            continue
        p_other = plan.parts.get(other, (ot.shape[3],))
        if tuple(ci for ci in p_other if ci > 0) != (o_ch,):
            continue
        plan.res_fuse[out] = (add, other)
        plan.skip_outputs.add(add.outputs[0])

    # virtual concats (+ SPPF upgrade)
    for node in nodes:
        if node.op != "CONCAT" or not node.outputs:
            continue
        out = node.outputs[0]
        cons = consumers.get(out, [])
        if not cons or not all(conv_1x1_fused_ok(c, out) for c in cons):
            continue
        shp = [tensors[i].shape for i in node.inputs]
        if not all(len(sh) == 4 and sh[:3] == shp[0][:3] for sh in shp):
            continue
        fs = {plan.f(i) for i in node.inputs}
        if len(fs) != 1:
            continue
        plan.virtual_concat[out] = list(node.inputs)
        plan.skip_outputs.add(out)

        # SPPF: inputs (y, m1, m2, m3), maxpool chain, fold 1
        ins = node.inputs
        if len(ins) == 4 and plan.f(ins[0]) == 1:
            ms = [by_out.get(i) for i in ins[1:]]
            k0 = ms[0].attrs.get("kernel") if ms[0] is not None else None
            chain_src = [ins[0], ins[1], ins[2]]

            def is_pool(mn, src):
                if mn is None or mn.op != "MAXPOOL" or \
                        mn.inputs[0] != src:
                    return False
                a = mn.attrs
                t_in = tensors[mn.inputs[0]]
                t_out = tensors[mn.outputs[0]]
                if k0 is None:
                    return False
                p = (k0[0] - 1) // 2
                if _pool_pads(a) != ((p, p), (p, p)):
                    return False   # fused kernel assumes centered SAME
                return (a.get("kernel") == k0
                        and a.get("kernel", (1, 1))[0] ==
                        a.get("kernel", (1, 1))[1]
                        and a.get("kernel", (1, 1))[0] % 2 == 1
                        and a.get("stride") == (1, 1)
                        and tuple(t_in.shape) == tuple(t_out.shape)
                        and abs(t_in.quant.scale - t_out.quant.scale)
                        < 1e-12)
            pool_only = all(
                is_pool(mn, src) for mn, src in zip(ms, chain_src))
            # every pool feeds only the chain + this concat
            clean = pool_only and all(
                {id(c) for c in consumers.get(m.outputs[0], [])}
                <= {id(node)} | {id(x) for x in ms if x is not None}
                for m in ms)
            # the conv's int32 bias is quantized in units
            # scale(concat_out) * w_scale, but the fused kernel is
            # invoked with in_scale = scale(p_src): the concat OUTPUT
            # scale must match the inputs' too
            scales_eq = pool_only and all(
                abs(tensors[i].quant.scale - tensors[ins[0]].quant.scale)
                < 1e-12 for i in list(ins) + [out])
            if pool_only and clean and scales_eq:
                plan.sppf[out] = (ins[0], k0[0])
                for m, src_nm in zip(ms, chain_src):
                    plan.skip_outputs.add(m.outputs[0])
                    plan.pool_of[m.outputs[0]] = (src_nm, k0[0])

    # fused bottlenecks: 1x1 conv -> KxK conv (+planned residual) pairs
    # whose intermediate has exactly one consumer run as ONE kernel
    # with the intermediate in VMEM (ops.fused_kernels.bottleneck_*)
    for node in nodes:
        if not _conv_fold_eligible(node, tensors):
            continue
        m_name = node.outputs[0]
        if m_name in graph_outputs or m_name in plan.stem_stage:
            continue
        a = node.attrs
        if a.get("kernel", (1, 1)) != (1, 1) \
                or a.get("stride", (1, 1)) != (1, 1) \
                or a.get("activation", "NONE") not in (
                    "NONE", "RELU", "LEAKY_RELU", "SILU"):
            continue
        cons = consumers.get(m_name, [])
        if len(cons) != 1:
            continue
        b = cons[0]
        if (not _conv_fold_eligible(b, tensors)
                or b.inputs[0] != m_name
                or b.outputs[0] in plan.stem_stage):
            continue
        ab = b.attrs
        kb = ab.get("kernel", (1, 1))
        if (kb[0] != kb[1] or kb[0] % 2 == 0 or kb[0] < 3
                or ab.get("stride", (1, 1)) != (1, 1)
                or ab.get("activation", "NONE") not in (
                    "NONE", "RELU", "LEAKY_RELU", "SILU")):
            continue
        x_nm = node.inputs[0]
        t_x, t_m, t_o = tensors[x_nm], tensors[m_name], \
            tensors[b.outputs[0]]
        if not (len(t_x.shape) == 4
                and tuple(t_x.shape[:3]) == tuple(t_m.shape[:3])
                == tuple(t_o.shape[:3])):
            continue
        hh = (kb[0] - 1) // 2
        try:
            pads_a = R._conv_pads(
                (t_x.shape[1], t_x.shape[2]), (t_m.shape[1], t_m.shape[2]),
                (1, 1), (1, 1), a.get("dilation", (1, 1)),
                a["padding"], a["explicit_pad"])
            pads_b = R._conv_pads(
                (t_m.shape[1], t_m.shape[2]), (t_o.shape[1], t_o.shape[2]),
                kb, (1, 1), ab.get("dilation", (1, 1)),
                ab["padding"], ab["explicit_pad"])
        except Exception:
            continue
        if pads_a != ((0, 0), (0, 0)) or pads_b != ((hh, hh), (hh, hh)):
            continue
        f = plan.f(b.outputs[0])
        if plan.f(x_nm) != f or plan.f(m_name) != f:
            continue
        # a planned residual must be the pair's own input (the C3
        # shortcut) so the kernel can source it from its x slab
        ri = plan.res_fuse.get(b.outputs[0])
        if ri is not None and ri[1] != x_nm:
            continue
        plan.bneck[m_name] = (node, b)


def _ensure_logical(name, env, tensors, plan) -> None:
    """Replace a folded/lane-padded env value with its logical NHWC
    view (unfold_layout strips trailing phys padding by shape)."""
    if plan is None:
        return
    if name not in env and name in plan.pool_of:
        # skipped SPPF maxpool needed outside the fused path: recompute
        # one level from its (possibly also recomputed) predecessor
        src, k = plan.pool_of[name]
        _ensure_logical(src, env, tensors, plan)
        z = env[src]
        p = (k - 1) // 2
        hw = (z.shape[1], z.shape[2])
        env[name] = R.maxpool(z, (k, k), (1, 1), hw, ((p, p), (p, p)))
        return
    if name not in env and name in plan.virtual_concat:
        ins = plan.virtual_concat[name]
        for i in ins:
            _ensure_logical(i, env, tensors, plan)
        env[name] = R.concat([env[i] for i in ins], 3)
        return
    if name in plan.qbf16_env:
        # integer values stored as bf16 -> materialize the int8 tensor
        # (NO early return: a folded qbf16 stage-exit still needs the
        # unfold below for logical consumers)
        plan.qbf16_env.discard(name)
        env[name] = env[name].astype(jnp.int8)
    if name not in plan.runtime_fold:
        return
    from thingino_accel_tpu.ops import fused_kernels as FK
    f = plan.runtime_fold.pop(name)
    c = tensors[name].shape[3]
    env[name] = FK.unfold_layout(env[name], f, c)


def _unfold_inputs(node, env, tensors, plan) -> None:
    for i in node.inputs:
        if i in env or i in plan.virtual_concat or i in plan.pool_of:
            _ensure_logical(i, env, tensors, plan)


def _lower_node_folded(node, env, tensors, opts, plan) -> bool:
    """Fold-aware lowering. Returns True when the node was handled."""
    from thingino_accel_tpu.ops import fused_kernels as FK
    op = node.op
    a = node.attrs
    out_name = node.outputs[0]
    out_t = tensors[out_name]

    def rtf(nm):
        return plan.runtime_fold.get(nm, 1)

    def scale(nm):
        return tensors[nm].quant.scale

    # fused depthwise (stride-1, int8): VPU tap kernel with the
    # requant/activation epilogue in VMEM
    if op in ("CONV2D", "DEPTHWISE_CONV2D") and len(node.inputs) >= 2:
        in_t = tensors[node.inputs[0]]
        groups = a.get("groups", 1)
        cin = in_t.shape[3] if len(in_t.shape) == 4 else 0
        is_dw = (op == "DEPTHWISE_CONV2D"
                 or (groups > 1 and groups == cin))
        if (is_dw and _is_int8(in_t) and _is_int8(tensors[out_name])
                and a.get("stride", (1, 1)) == (1, 1)
                and a.get("dilation", (1, 1)) == (1, 1)
                and len(in_t.shape) == 4 and 0 not in in_t.shape):
            act = a.get("activation", "NONE")
            f_act = _kernel_act(act)
            _unfold_inputs(node, env, tensors, plan)
            x = env[node.inputs[0]]
            w = env[node.inputs[1]]           # [KH, KW, C] (prepare_params)
            bias = env[node.inputs[2]] if len(node.inputs) > 2 else None
            wt_info = tensors[node.inputs[1]]
            ws = (wt_info.channel_scales
                  if wt_info.channel_scales is not None
                  else scale(node.inputs[1]))
            out_hw = _nhwc_out_hw(tensors[out_name])
            pads = R._conv_pads(
                (in_t.shape[1], in_t.shape[2]), out_hw, a["kernel"],
                a["stride"], a["dilation"], a["padding"],
                a["explicit_pad"])
            out = FK.depthwise_conv2d_int8_fused(
                x, w, bias, out_hw, (1, 1), pads,
                scale(node.inputs[0]), ws, scale(out_name),
                act=f_act, alpha=a.get("alpha", 0.01) or 0.01)
            if not _act_applied(f_act, act):
                out = _apply_fused_act(
                    out, act, out_t, compat=False,
                    alpha=a.get("alpha", 0.01) or 0.01)
            env[out_name] = out
            return True

    if _conv_fold_eligible(node, tensors):
        act = a.get("activation", "NONE")
        f_act = _kernel_act(act)
        s = a["stride"][0]
        f_out = plan.f(out_name)

        # fused bottleneck, first half: defer this 1x1 — the pair runs
        # as ONE kernel when its KxK consumer is lowered
        if out_name in plan.bneck:
            x_nm = node.inputs[0]
            okf = (x_nm in env and x_nm not in plan.qbf16_env
                   and plan.runtime_fold.get(x_nm, 1) == f_out)
            if okf and plan.res_fuse.get(
                    plan.bneck[out_name][1].outputs[0]) is not None:
                # in-kernel residual sources the x slab: phys lanes
                # of x and the pair's output must match
                o_b = tensors[plan.bneck[out_name][1].outputs[0]].shape[3]
                okf = (-(-env[x_nm].shape[3] // 128) * 128
                       == -(-f_out * o_b // 128) * 128)
            if okf:
                plan.bneck_live.add(out_name)
                return True
            # else: fall through, lower the 1x1 normally

        x = env.get(node.inputs[0])   # None for a virtual concat input
        w = env[node.inputs[1]]
        bias = env[node.inputs[2]] if len(node.inputs) > 2 else None
        in_t = tensors[node.inputs[0]]
        cin = in_t.shape[3]
        out_hw = _nhwc_out_hw(out_t)
        wt_info = tensors[node.inputs[1]]
        ws = (wt_info.channel_scales
              if wt_info.channel_scales is not None
              else scale(node.inputs[1]))
        pads = R._conv_pads(
            (in_t.shape[1], in_t.shape[2]), out_hw, a["kernel"],
            a["stride"], a["dilation"], a["padding"], a["explicit_pad"])
        k2c = a["kernel"][0] * a["kernel"][1] * cin
        if (out_name in plan.stem_stage or cin < 16) and k2c <= 1024:
            emit = plan.stem_emit.get(out_name, "int8")
            if node.inputs[0] in plan.qbf16_env:
                x = env[node.inputs[0]]     # integer values as bf16
            else:
                _ensure_logical(node.inputs[0], env, tensors, plan)
                x = env[node.inputs[0]]
            # the stem runs in XLA (not a pallas epilogue): exp SiLU
            # is already fused and cheap there — keep it exact
            stem_act = act if act in FK.ACTS else "NONE"
            out = FK.conv2d_int8_stem_fused(
                x, w, bias, out_hw, a["stride"], pads,
                scale(node.inputs[0]), ws, scale(out_name),
                act=stem_act, alpha=a.get("alpha", 0.01) or 0.01,
                f_out=f_out,
                emit="qbf16" if emit.startswith("qbf16") else "int8")
            if emit.startswith("qbf16"):
                # stage membership guarantees act in FK.ACTS (fused)
                assert stem_act == act, (act, out_name)
                if emit == "qbf16x":
                    # qbf16 STAGE EXIT: serving 1x1 consumers take the
                    # integer-valued bf16 directly (dot_i8 casts in
                    # VMEM) — fold it so the layout contract matches;
                    # this deletes the whole-tensor f32->int8 quantize
                    # pass (~46 us/frame on yolov5s@640 b128)
                    if f_out > 1:
                        out = FK.fold_layout(out, f_out)
                        plan.runtime_fold[out_name] = f_out
                env[out_name] = out
                plan.qbf16_env.add(out_name)
                return True
        else:
            o_ch = out_t.shape[3]
            # epilogue residual: the ADD consuming this conv's output
            # runs inside the kernel (skipping one int8 round-trip and
            # the conv's intermediate quantization)
            store_name = out_name
            residual = None
            res_scale = 1.0
            ri = plan.res_fuse.get(out_name)
            if ri is not None and _act_applied(f_act, act):
                add_node, other = ri
                p_other = plan.parts.get(other, (o_ch,))
                if (other in env and rtf(other) == f_out
                        and other not in plan.qbf16_env
                        and tuple(c for c in p_other if c > 0) == (o_ch,)):
                    residual = env[other]
                    res_scale = scale(other)
                    store_name = add_node.outputs[0]
            out_s = scale(store_name)

            src = node.inputs[0]
            if src in plan.bneck_live:
                # fused bottleneck, second half: run 1x1 -> KxK
                # (+residual) as one kernel, intermediate in VMEM
                plan.bneck_live.discard(src)
                convA = plan.bneck[src][0]
                aa = convA.attrs
                x_nm = convA.inputs[0]
                arr = env[x_nm]
                cin_x = tensors[x_nm].shape[3]
                if x_nm in plan.runtime_fold \
                        and rtf(x_nm) == f_out:
                    parts_x = tuple(plan.parts.get(x_nm, (cin_x,)))
                elif arr.shape[3] == cin_x and f_out > 1:
                    # layout went stale between the pair (a logical
                    # consumer unfolded x after the 1x1 was deferred):
                    # re-fold rather than feed the kernel a logical
                    # array with folded metadata
                    arr = FK.fold_layout(arr, f_out)
                    parts_x = (cin_x,)
                else:
                    parts_x = (cin_x,)
                phys = sum(-p if p < 0 else f_out * p for p in parts_x)
                if arr.shape[3] > phys:
                    parts_x += (-(arr.shape[3] - phys),)
                w1 = env[convA.inputs[1]]
                b1 = env[convA.inputs[2]] \
                    if len(convA.inputs) > 2 else None
                w1t = tensors[convA.inputs[1]]
                ws1 = (w1t.channel_scales
                       if w1t.channel_scales is not None
                       else scale(convA.inputs[1]))
                out = FK.bottleneck_int8_fused(
                    arr, w1, b1, ws1, scale(src),
                    w, bias, ws, out_s,
                    scale(x_nm), out_hw,
                    f=f_out, parts=parts_x,
                    act1=_kernel_act(aa.get("activation", "NONE")),
                    act2=f_act,
                    alpha1=aa.get("alpha", 0.01) or 0.01,
                    alpha2=a.get("alpha", 0.01) or 0.01,
                    shortcut=residual is not None,
                    keep_phys=True)
            elif src in plan.sppf and a["kernel"] == (1, 1) and s == 1 \
                    and residual is None and f_out == 1:
                # SPPF: pools + concat + this 1x1 conv in one kernel
                p_src, pk = plan.sppf[src]
                _ensure_logical(p_src, env, tensors, plan)
                out = FK.sppf_int8_fused(
                    env[p_src], w.reshape(1, 1, -1, o_ch), bias, pk,
                    scale(p_src), ws, out_s,
                    act=f_act, alpha=a.get("alpha", 0.01) or 0.01,
                    keep_phys=True)
            elif src in plan.virtual_concat and a["kernel"] == (1, 1) \
                    and s == 1:
                ins = plan.virtual_concat[src]
                for i in ins:
                    if i not in env:   # skipped SPPF pool parts etc.
                        _ensure_logical(i, env, tensors, plan)
                if any(rtf(i) != f_out or i in plan.qbf16_env
                       for i in ins):
                    # runtime layouts diverged from the plan ->
                    # materialize and take the ordinary folded path
                    _ensure_logical(src, env, tensors, plan)
                    x = env[src]
                    if f_out > 1:
                        x = FK.fold_layout(x, f_out)
                        # keep env in sync with the recorded layout: a
                        # second consumer (or the graph-output unfold)
                        # reads env[src] through runtime_fold
                        env[src] = x
                        plan.runtime_fold[src] = f_out
                        plan.parts[src] = (cin,)
                    out = FK.conv2d_int8_folded(
                        x, w, bias, out_hw, s, pads,
                        scale(src), ws, out_s,
                        act=f_act, alpha=a.get("alpha", 0.01) or 0.01,
                        f_out=f_out, parts=(cin,), keep_phys=True,
                        residual=residual, res_scale=res_scale)
                else:
                    xs, ws_l, in_scales = [], [], []
                    off = 0
                    mrows = None
                    # host numpy: scale vectors must reach the kernels'
                    # _scale_rows un-traced so the combined-scale math
                    # runs in IEEE f32 on the host (fused_kernels)
                    ws_vec = np.asarray(ws, np.float32)
                    if ws_vec.ndim == 0:
                        ws_vec = np.full((o_ch,), ws_vec, np.float32)
                    for i in ins:
                        ci = tensors[i].shape[3]
                        arr = env[i]
                        nb, hh, wgg = arr.shape[:3]
                        mrows = nb * hh * wgg
                        xs.append(arr.reshape(mrows, arr.shape[3]))
                        # runtime-truth part structure: plan.parts is
                        # only valid for arrays our producers emitted
                        # (tracked in runtime_fold); anything else is a
                        # plain logical tensor
                        if i in plan.runtime_fold:
                            parts_i = tuple(plan.parts.get(i, (ci,)))
                        else:
                            parts_i = (ci,)
                        phys = sum(-p if p < 0 else f_out * p
                                   for p in parts_i)
                        if arr.shape[3] > phys:
                            parts_i += (-(arr.shape[3] - phys),)
                        elif arr.shape[3] < phys:
                            raise AssertionError(
                                f"stale fold metadata for {i}: "
                                f"phys {phys} vs array {arr.shape[3]}")
                        wk, _, _ = FK.repack_weights_folded(
                            np.asarray(w[:, :, off:off + ci, :])
                            if isinstance(w, np.ndarray)
                            else w[:, :, off:off + ci, :],
                            1, f_out, 0, parts_i)
                        ws_l.append(jnp.asarray(wk).reshape(
                            wk.shape[2], f_out * o_ch))
                        in_scales.append(scale(i))
                        off += ci
                    b0 = bias if bias is not None else \
                        jnp.zeros((o_ch,), jnp.int32)
                    res_m = residual.reshape(mrows, -1) \
                        if residual is not None else None
                    out = FK.matmul_int8_fused_multi(
                        xs, ws_l, jnp.tile(b0, f_out), in_scales,
                        np.tile(ws_vec, f_out), out_s,
                        act=f_act, alpha=a.get("alpha", 0.01) or 0.01,
                        residual=res_m, res_scale=res_scale,
                        bias_scale=scale(src), keep_phys=True)
                    out = out.reshape(nb, hh, wgg, -1)
            else:
                g = s * f_out
                fin = rtf(src)
                parts = plan.parts.get(src, (cin,))
                if fin != g:
                    _ensure_logical(src, env, tensors, plan)
                    x = env[src]
                    parts = (cin,)
                    if g > 1:
                        if x.shape[2] % g:
                            return False  # W not foldable -> logical
                        x = FK.fold_layout(x, g)
                out = FK.conv2d_int8_folded(
                    x, w, bias, out_hw, s, pads,
                    scale(src), ws, out_s,
                    act=f_act, alpha=a.get("alpha", 0.01) or 0.01,
                    f_out=f_out, parts=parts, keep_phys=True,
                    residual=residual, res_scale=res_scale)
            if residual is not None:
                out_name = store_name
                out_t = tensors[store_name]
        if not _act_applied(f_act, act):
            out = _apply_fused_act(
                out, act, out_t, compat=False,
                alpha=a.get("alpha", 0.01) or 0.01)
        env[out_name] = out
        o_ch = out_t.shape[3]
        pad = out.shape[3] - f_out * o_ch
        if f_out > 1 or pad > 0:
            plan.runtime_fold[out_name] = f_out
            plan.parts[out_name] = (o_ch,) + ((-pad,) if pad else ())
        return True

    f_planned = plan.f(out_name)
    if f_planned <= 1:
        return False

    if op in ("ADD", "MUL"):
        if any(rtf(i) != f_planned for i in node.inputs):
            return False
        fn = R.add_q if op == "ADD" else R.mul_q
        env[out_name] = fn(
            env[node.inputs[0]], env[node.inputs[1]],
            scale(node.inputs[0]), scale(node.inputs[1]), scale(out_name))
        plan.runtime_fold[out_name] = f_planned
        plan.parts[out_name] = plan.parts.get(
            node.inputs[0], (tensors[node.inputs[0]].shape[3],))
        return True

    if op in _FOLD_ELTWISE:
        if rtf(node.inputs[0]) != f_planned:
            return False
        x = env[node.inputs[0]]
        if op == "RELU":
            env[out_name] = R.relu(x)
        elif op == "SILU":
            env[out_name] = R.silu(x, scale(node.inputs[0]),
                                   out_scale=scale(out_name))
        elif op == "SILU_FUSED":
            env[out_name] = R.silu(
                x, in_scale=a["in_scale"], sig_scale=a["sig_scale"],
                out_scale=a["out_scale"], fuse=True)
        elif op == "LEAKY_RELU":
            env[out_name] = R.leaky_relu(x, a.get("alpha", 0.0) or 0.01)
        elif op == "SIGMOID":
            env[out_name] = R.sigmoid(x, scale(node.inputs[0]),
                                      scale(out_name))
        elif op == "RELU6":
            env[out_name] = R.relu6(x, scale(node.inputs[0]), False)
        elif op == "CLIP":
            # positionally independent -> valid on the folded layout
            env[out_name] = _clip_q(x, a.get("min"), a.get("max"),
                                    scale(node.inputs[0]))
        else:
            return False
        plan.runtime_fold[out_name] = f_planned
        plan.parts[out_name] = plan.parts.get(
            node.inputs[0], (tensors[node.inputs[0]].shape[3],))
        return True

    if op == "CONCAT":
        if out_name in plan.virtual_concat:
            return True   # consumed part-wise by fused 1x1 convs
        if any(rtf(i) != f_planned for i in node.inputs):
            return False
        env[out_name] = R.concat([env[i] for i in node.inputs], 3)
        plan.runtime_fold[out_name] = f_planned
        ps = []
        for i in node.inputs:
            ps.extend(plan.parts.get(i, (tensors[i].shape[3],)))
        plan.parts[out_name] = tuple(ps)
        return True

    return False


def _lower_node(
    node: Node,
    env: Dict[str, jax.Array],
    tensors: Dict[str, TensorInfo],
    opts: ExecOptions,
    compat: bool,
) -> None:
    op = node.op
    a = node.attrs
    out_name = node.outputs[0]
    out_t = tensors[out_name]

    # Degenerate region guard: bundled files contain subgraphs over
    # zero-shaped dangling tensors (compiler-skipped ops, see
    # ir.graph._materialize_dangling — e.g. the v8 DFL head in
    # yolov5nu.mars). Any op touching an empty tensor produces
    # deterministic zeros of its declared shape.
    degenerate = (
        any(0 in env[i].shape for i in node.inputs if i in env)
        or any(0 in tensors[o].shape for o in node.outputs)
        or (op in ("MAXPOOL", "AVGPOOL")
            and (0 in a.get("kernel", (1, 1)) or 0 in a.get("stride", (1, 1))))
    )
    if degenerate:
        for o in node.outputs:
            t = tensors[o]
            env[o] = jnp.zeros(t.shape, t.dtype)
        return

    def scale(nm: str) -> float:
        return tensors[nm].quant.scale

    if op in ("CONV2D", "DEPTHWISE_CONV2D"):
        x = env[node.inputs[0]]
        w = env[node.inputs[1]]
        bias = env[node.inputs[2]] if len(node.inputs) > 2 else None
        in_t = tensors[node.inputs[0]]
        out_hw = _nhwc_out_hw(out_t)
        pads = R._conv_pads(
            (x.shape[1], x.shape[2]), out_hw, a["kernel"], a["stride"],
            a["dilation"], a["padding"], a["explicit_pad"])
        is_int = _is_int8(in_t)
        act = a.get("activation", "NONE")
        relu = act == "RELU"
        groups = a.get("groups", 1)
        cin = x.shape[3]
        depthwise = op == "DEPTHWISE_CONV2D" or (groups > 1 and groups == cin)
        if is_int:
            wt_info = tensors[node.inputs[1]]
            ws = (wt_info.channel_scales
                  if wt_info.channel_scales is not None
                  else scale(node.inputs[1]))
            if depthwise:
                out = R.depthwise_conv2d_int8(
                    x, w, bias, out_hw, a["stride"], a["dilation"], pads,
                    scale(node.inputs[0]), ws, scale(out_name),
                    opts.round_mode, relu)
            elif groups > 1:
                out = R.grouped_conv2d_int8(
                    x, w, bias, groups, out_hw, a["stride"], a["dilation"],
                    pads, scale(node.inputs[0]), ws, scale(out_name),
                    opts.round_mode, relu)
            elif (opts.conv_backend == "fused"
                    and a["dilation"] == (1, 1)
                    and a["stride"][0] == a["stride"][1]):
                # serving tier: fused pallas kernels with the activation
                # (incl. SILU/LEAKY) folded into the requant epilogue
                from thingino_accel_tpu.ops import fused_kernels as FK
                f_act = _kernel_act(act)
                if compat and f_act not in ("NONE", "RELU"):
                    # reference runtime honors fused RELU only
                    # (mars_runtime.c:701-707): other epilogues must
                    # NOT run in bit-compat mode
                    f_act = "NONE"
                out = FK.conv2d_int8_fused(
                    x, w, bias, out_hw, a["stride"], a["dilation"], pads,
                    scale(node.inputs[0]), ws, scale(out_name),
                    act=f_act, alpha=a.get("alpha", 0.01) or 0.01)
                if _act_applied(f_act, act):
                    env[out_name] = out
                    return   # epilogue consumed the activation
            else:
                backend = opts.conv_backend
                if not np.isscalar(ws) and getattr(ws, "ndim", 0):
                    backend = "xla"   # pallas epilogue is per-tensor-only
                out = conv_mod.conv2d_int8(
                    x, w, bias, out_hw, a["stride"], a["dilation"], pads,
                    scale(node.inputs[0]), ws, scale(out_name),
                    opts.round_mode, relu, backend=backend)
        else:
            if depthwise:
                out = R.depthwise_conv2d_f32(
                    x, w, bias, out_hw, a["stride"], a["dilation"], pads, relu)
            else:
                out = R.conv2d_f32(
                    x, w, bias, out_hw, a["stride"], a["dilation"], pads,
                    relu, opts.compute_dtype, opts.accum_dtype)
        out = _apply_fused_act(out, act, out_t, compat,
                               alpha=a.get("alpha", 0.01) or 0.01)
        env[out_name] = out

    elif op in ("MAXPOOL",):
        x = env[node.inputs[0]]
        out_hw = _nhwc_out_hw(out_t)
        # reference ignores pool padding entirely (mars_runtime.c:939-950)
        pads = ((0, 0), (0, 0)) if compat else \
            _pool_pads(a, (x.shape[1], x.shape[2]))
        env[out_name] = R.maxpool(x, a["kernel"], a["stride"], out_hw, pads)

    elif op == "AVGPOOL":
        x = env[node.inputs[0]]
        if compat:  # unimplemented in reference -> pass-through
            env[out_name] = x
            return
        out_hw = _nhwc_out_hw(out_t)
        env[out_name] = R.avgpool(
            x, a["kernel"], a["stride"], out_hw,
            _pool_pads(a, (x.shape[1], x.shape[2])),
            scale(node.inputs[0]), scale(out_name))

    elif op == "GLOBAL_AVGPOOL":
        x = env[node.inputs[0]]
        if compat:
            env[out_name] = x
            return
        env[out_name] = R.global_avgpool(
            x, scale(node.inputs[0]), scale(out_name))

    elif op == "RELU":
        env[out_name] = R.relu(env[node.inputs[0]])

    elif op == "RELU6":
        env[out_name] = R.relu6(
            env[node.inputs[0]], scale(node.inputs[0]), compat)

    elif op == "LEAKY_RELU":
        alpha = a.get("alpha", 0.0) or 0.01  # C default (mars_runtime.c:1064)
        env[out_name] = R.leaky_relu(env[node.inputs[0]], alpha)

    elif op == "SIGMOID":
        env[out_name] = R.sigmoid(
            env[node.inputs[0]], scale(node.inputs[0]), scale(out_name))

    elif op == "SILU":
        x = env[node.inputs[0]]
        if compat:  # reference treats standalone SILU as no-op (":1184-1186")
            env[out_name] = x
            return
        env[out_name] = R.silu(
            x, scale(node.inputs[0]), out_scale=scale(out_name))

    elif op == "SILU_FUSED":  # produced by fuse_silu_pairs
        x = env[node.inputs[0]]
        env[out_name] = R.silu(
            x, in_scale=a["in_scale"], sig_scale=a["sig_scale"],
            out_scale=a["out_scale"], fuse=True)

    elif op == "SOFTMAX":
        env[out_name] = R.softmax(
            env[node.inputs[0]], axis=int(a.get("axis", -1)),
            in_scale=scale(node.inputs[0]), out_scale=scale(out_name),
            compat=compat)

    elif op == "CONCAT":
        xs = [env[i] for i in node.inputs]
        axis = int(a.get("axis", 3))
        # .mars graphs express concat on NCHW axis 1 == NHWC axis 3, and
        # some bundled files carry garbage axis values (the C runtime
        # ignores the field and always concats channels,
        # mars_runtime.c:963-1000). Infer the axis from declared shapes
        # when they identify it unambiguously.
        rank = xs[0].ndim
        if all(x.ndim == rank for x in xs):
            cands = []
            for ax in range(rank):
                tot = sum(x.shape[ax] for x in xs)
                others = all(
                    all(x.shape[d] == xs[0].shape[d] for x in xs)
                    for d in range(rank) if d != ax)
                if others and len(out_t.shape) == rank \
                        and out_t.shape[ax] in (tot, 0) and tot > 0:
                    cands.append(ax)
            if len(cands) == 1:
                axis = cands[0]
            elif axis == 1 and rank == 4:
                axis = 3
        env[out_name] = R.concat(xs, axis)

    elif op == "ADD":
        env[out_name] = R.add_q(
            env[node.inputs[0]], env[node.inputs[1]],
            scale(node.inputs[0]), scale(node.inputs[1]), scale(out_name))

    elif op == "MUL":
        env[out_name] = R.mul_q(
            env[node.inputs[0]], env[node.inputs[1]],
            scale(node.inputs[0]), scale(node.inputs[1]), scale(out_name))

    elif op == "UPSAMPLE":
        x = env[node.inputs[0]]
        out_hw = _nhwc_out_hw(out_t)
        sc = a.get("scale", (0, 0))
        if sc[0] <= 0 or sc[1] <= 0:   # corrupt/partial descriptor
            sc = (out_hw[0] // x.shape[1], out_hw[1] // x.shape[2])
        if a.get("mode", 0) == 1 and not compat:
            env[out_name] = R.upsample_bilinear(x, out_hw)
        else:
            env[out_name] = R.upsample_nearest(x, sc, out_hw)

    elif op == "TRANSPOSE" and "perm" in a:
        x = env[node.inputs[0]]
        if compat:
            env[out_name] = x
            return
        env[out_name] = jnp.transpose(x, a["perm"])

    elif op in ("RESHAPE", "TRANSPOSE"):
        x = env[node.inputs[0]]
        if compat:  # reference: data no-op (:1203-1209)
            env[out_name] = x
            return
        target = list(out_t.shape)
        if target and target[0] == 1 and x.shape[0] != 1:
            target[0] = x.shape[0]
        numel_t = int(np.prod(target)) if target else 0
        if numel_t == int(np.prod(x.shape)):
            env[out_name] = x.reshape(target)
        else:
            env[out_name] = x  # shape metadata inconsistent -> identity

    elif op == "DEQUANT":
        x = env[node.inputs[0]]
        env[out_name] = x.astype(jnp.float32) * jnp.float32(a["scale"])

    elif op == "QUANT":
        from thingino_accel_tpu.ops.quant import clamp_i8, round_to_int
        x = env[node.inputs[0]].astype(jnp.float32)
        q = round_to_int(x / jnp.float32(a["scale"] or 1.0),
                         RoundMode.PLUS_HALF_TRUNC)
        env[out_name] = clamp_i8(q)

    elif op == "FAKE_QUANT":
        # QAT observer: forward = int8 round-trip at the given scale,
        # backward = identity (straight-through estimator). Inserted by
        # training.qat.insert_activation_fake_quant so the QAT loss
        # models the ACTIVATION quantization the exact tier deploys —
        # weight-only fake-quant sits at the weight-noise floor and
        # cannot see the dominant error term.
        x = env[node.inputs[0]]
        xf = x.astype(jnp.float32)
        s = jnp.float32(a["scale"] or 1.0)
        q = jnp.clip(jnp.round(xf / s), -128, 127) * s
        env[out_name] = (xf + jax.lax.stop_gradient(q - xf)).astype(x.dtype)

    elif op == "SPLIT":
        x = env[node.inputs[0]]
        axis = int(a["axis"])
        off = 0
        for out_nm, sz in zip(node.outputs, a["sizes"]):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(off, off + sz)
            env[out_nm] = x[tuple(idx)]
            off += sz

    elif op == "SLICE":
        x = env[node.inputs[0]]
        idx = [slice(None)] * x.ndim
        for (ax, s, e, st) in a["slices"]:
            idx[ax] = slice(s, e, st)
        env[out_name] = x[tuple(idx)]

    elif op in ("SUB", "DIV", "POW"):
        def deq(nm):
            v = env[nm]
            if jnp.issubdtype(v.dtype, jnp.integer):
                return v.astype(jnp.float32) * jnp.float32(
                    tensors[nm].quant.scale or 1.0)
            return v.astype(jnp.float32)
        x = deq(node.inputs[0])
        y = deq(node.inputs[1])
        fn = {"SUB": jnp.subtract, "DIV": jnp.divide, "POW": jnp.power}[op]
        out = fn(x, y)
        if _is_int8(out_t):
            from thingino_accel_tpu.ops.quant import clamp_i8, round_to_int
            out = clamp_i8(round_to_int(
                out / jnp.float32(out_t.quant.scale or 1.0),
                RoundMode.PLUS_HALF_TRUNC))
        env[out_name] = out

    elif op == "GRU":
        _lower_gru(node, env)

    elif op == "CONV1D":
        # [N, C, L] x OIW -> [N, O, L']; channels-last dot decomposition
        x = env[node.inputs[0]].astype(jnp.float32)
        w = env[node.inputs[1]].astype(jnp.float32)   # [O, I, K]
        bias = env[node.inputs[2]] if len(node.inputs) > 2 else None
        k, s, d = a["kernel"], a["stride"], a.get("dilation", 1)
        p0, p1 = a.get("pads", (0, 0))
        xl = jnp.moveaxis(x, 1, 2)                    # [N, L, C]
        xl = jnp.pad(xl, ((0, 0), (p0, p1), (0, 0)))
        ol = out_t.shape[2]
        acc = None
        for dk in range(k):
            off = dk * d
            sl = jax.lax.slice(
                xl, (0, off, 0),
                (xl.shape[0], off + (ol - 1) * s + 1, xl.shape[2]),
                (1, s, 1))
            part = jnp.einsum("nlc,oc->nlo", sl, w[:, :, dk])
            acc = part if acc is None else acc + part
        if bias is not None:
            acc = acc + bias.astype(jnp.float32)
        env[out_name] = jnp.moveaxis(acc, 2, 1)       # [N, O, L']

    elif op == "CONV1D_TRANSPOSE":
        x = env[node.inputs[0]].astype(jnp.float32)   # [N, C, L]
        w = env[node.inputs[1]].astype(jnp.float32)   # [C_in, O, K]
        bias = env[node.inputs[2]] if len(node.inputs) > 2 else None
        k, s = a["kernel"], a["stride"]
        p0, p1 = a.get("pads", (0, 0))
        xl = jnp.moveaxis(x, 1, 2)                    # [N, L, C]
        # ONNX ConvTranspose == zero-stuffed conv with the flipped kernel;
        # rhs here is [K, I=C_in, O=C_out] with W flipped.
        w_k = jnp.transpose(w[:, :, ::-1], (2, 0, 1))
        out = jax.lax.conv_transpose(
            xl, w_k,
            strides=(s,), padding=((k - 1 - p0, k - 1 - p1),),
            dimension_numbers=("NWC", "WIO", "NWC"))
        if bias is not None:
            out = out + bias.astype(jnp.float32)
        out = out[:, :out_t.shape[2], :]
        env[out_name] = jnp.moveaxis(out, 2, 1)

    elif op == "CLIP":
        x = env[node.inputs[0]]
        lo = a.get("min")
        hi = a.get("max")
        env[out_name] = _clip_q(x, lo, hi, scale(node.inputs[0]))

    elif op == "BATCHNORM":
        x = env[node.inputs[0]]
        sc = env[node.inputs[1]] if len(node.inputs) > 1 else None
        bi = env[node.inputs[2]] if len(node.inputs) > 2 else None
        c = x.shape[-1]
        sc = sc.reshape(-1)[:c] if sc is not None else jnp.ones((c,), jnp.float32)
        bi = bi.reshape(-1)[:c] if bi is not None else jnp.zeros((c,), jnp.float32)
        env[out_name] = R.batchnorm(
            x, sc, bi, scale(node.inputs[0]), scale(out_name))

    elif op == "FC":
        x = env[node.inputs[0]]
        w = env[node.inputs[1]]
        bias = env[node.inputs[2]] if len(node.inputs) > 2 else None
        xf = x.reshape(x.shape[0], -1)
        wm = w.reshape(-1, w.shape[-1]) if w.ndim > 2 else w
        wt_info = tensors[node.inputs[1]]
        ws = (wt_info.channel_scales
              if wt_info.channel_scales is not None
              else scale(node.inputs[1]))
        env[out_name] = R.fc(
            xf, wm, bias, scale(node.inputs[0]), ws,
            scale(out_name), a.get("activation", "NONE") == "RELU")

    else:
        raise NotImplementedError(f"op {op!r} not supported by executor")


def _lower_gru(node: Node, env: Dict[str, jax.Array]) -> None:
    """ONNX-semantics GRU (gate order z,r,h; linear_before_reset) over
    layout-0 input [T, B, C], via lax.scan. The audio-model recurrence
    (the reference's .mgk GRU layers) runs inside the same jitted graph.
    """
    a = node.attrs
    x = env[node.inputs[0]].astype(jnp.float32)     # [T, B, C]
    w = env[node.inputs[1]].astype(jnp.float32)     # [D, 3H, C]
    r = env[node.inputs[2]].astype(jnp.float32)     # [D, 3H, H]
    b = env[node.inputs[3]].astype(jnp.float32) if len(node.inputs) > 3 \
        else None                                   # [D, 6H]
    h0s = env[node.inputs[4]].astype(jnp.float32) \
        if len(node.inputs) > 4 else None           # [D, B, H] initial_h
    hs = a["hidden_size"]
    lbr = bool(a.get("linear_before_reset", 0))
    direction = a.get("direction", "forward")
    dirs = []
    ndir = w.shape[0]
    for d in range(ndir):
        wb = b[d] if b is not None else jnp.zeros((6 * hs,), jnp.float32)
        dirs.append((w[d].T, r[d].T, wb[:3 * hs], wb[3 * hs:]))

    t, bsz, _ = x.shape

    def run_dir(wT, rT, wbi, rbi, reverse, h0=None):
        def step(h, x_t):
            gi = x_t @ wT + wbi                      # [B, 3H] (z, r, h)
            gz, gr, gh = (gi[:, :hs], gi[:, hs:2 * hs], gi[:, 2 * hs:])
            hz = h @ rT[:, :hs] + rbi[:hs]
            hrr = h @ rT[:, hs:2 * hs] + rbi[hs:2 * hs]
            z = jax.nn.sigmoid(gz + hz)
            rr = jax.nn.sigmoid(gr + hrr)
            if lbr:
                # reset after the recurrent matmul (torch convention)
                hh = h @ rT[:, 2 * hs:] + rbi[2 * hs:]
                n_ = jnp.tanh(gh + rr * hh)
            else:
                # ONNX default: reset gate applied to h before Rh
                n_ = jnp.tanh(gh + (rr * h) @ rT[:, 2 * hs:]
                              + rbi[2 * hs:])
            h2 = (1.0 - z) * n_ + z * h
            return h2, h2
        if h0 is None:
            h0 = jnp.zeros((bsz, hs), jnp.float32)
        hT, ys = jax.lax.scan(step, h0, x, reverse=reverse)
        return ys, hT

    outs = []
    finals = []
    for d, (wT, rT, wbi, rbi) in enumerate(dirs):
        rev = (direction == "reverse") or (d == 1)
        ys, hT = run_dir(wT, rT, wbi, rbi, rev,
                         h0s[d] if h0s is not None else None)
        outs.append(ys)
        finals.append(hT)
    y = jnp.stack(outs, axis=1)          # [T, D, B, H]
    env[node.outputs[0]] = y
    if len(node.outputs) > 1:
        env[node.outputs[1]] = jnp.stack(finals, axis=0)


def _pool_pads(a: Dict[str, Any], in_hw=None
               ) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    ep = a.get("explicit_pad", (0, 0, 0, 0))
    if a.get("padding") == "EXPLICIT":
        return (ep[0], ep[1]), (ep[2], ep[3])
    if a.get("padding") == "SAME" and in_hw is not None:
        # same split rule as convs: out = ceil(in/stride)
        kh, kw = a.get("kernel", (1, 1))
        sh, sw = a.get("stride", (1, 1))
        ph = max(0, (-(-in_hw[0] // sh) - 1) * sh + kh - in_hw[0])
        pw = max(0, (-(-in_hw[1] // sw) - 1) * sw + kw - in_hw[1])
        return (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)
    return (0, 0), (0, 0)


def _apply_fused_act(
    out: jax.Array, act: str, out_t: TensorInfo, compat: bool,
    alpha: float = 0.01,
) -> jax.Array:
    """Fused activations beyond RELU (which conv kernels handle inline).

    The reference only ever applies fused RELU post-conv
    (``mars_runtime.c:701-707``); the format declares more
    (``include/mars.h:82-91``), implemented here for full mode.
    """
    if act in ("NONE", "RELU"):
        return out
    if compat:
        return out
    sc = out_t.quant.scale
    if act == "RELU6":
        return R.relu6(out, sc, compat=False)
    if act == "LEAKY_RELU":
        return R.leaky_relu(out, alpha or 0.01)
    if act == "SILU":
        return R.silu(out, sc, out_scale=sc)
    if act == "SIGMOID":
        return R.sigmoid(out, sc, sc)
    if act == "TANH":
        if jnp.issubdtype(out.dtype, jnp.integer):
            xf = out.astype(jnp.float32) * jnp.float32(sc)
            from thingino_accel_tpu.ops.quant import round_to_int, clamp_i8
            return clamp_i8(round_to_int(
                jnp.tanh(xf) / jnp.float32(sc), RoundMode.PLUS_HALF_TRUNC))
        return jnp.tanh(out)
    if act == "HARD_SWISH":
        if jnp.issubdtype(out.dtype, jnp.integer):
            xf = out.astype(jnp.float32) * jnp.float32(sc)
            y = xf * jnp.clip(xf + 3.0, 0.0, 6.0) / 6.0
            from thingino_accel_tpu.ops.quant import round_to_int, clamp_i8
            return clamp_i8(round_to_int(
                y / jnp.float32(sc), RoundMode.PLUS_HALF_TRUNC))
        return out * jnp.clip(out + 3.0, 0.0, 6.0) / 6.0
    return out
