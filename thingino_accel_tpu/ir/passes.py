"""Graph optimization passes.

The reference has no graph compiler — its runtime executes the layer list
verbatim. On TPU the jit trace is the program, so passes are cheap and pay
off at trace/compile time and in fusion quality:

- ``fuse_silu_pairs``: SIGMOID(x) + MUL(x, sig) -> SILU_FUSED (x*σ(x) in
  one f32 expression with a single requant). YOLOv5 graphs are ~50% such
  pairs (60 SIGMOID + 60 matching MUL in ``models/yolov5n.mars``).
- ``fold_batchnorm``: BATCHNORM following CONV2D folded into conv weights
  (f32 graphs).
- ``dead_code``: drop nodes whose outputs are never consumed.
"""

from __future__ import annotations

from typing import Dict, List, Set

import numpy as np

from thingino_accel_tpu.ir.graph import Graph, Node, TensorInfo


def fuse_silu_pairs(graph: Graph) -> List[Node]:
    """Return a rewritten node list with SIGMOID+MUL pairs fused.

    Pattern: ``s = SIGMOID(x)``, ``y = MUL(x, s)`` (either operand order)
    where ``s`` has no other consumer. Scales of the pair are preserved in
    the fused node's attrs for exact-ish int8 replication.
    """
    consumers = graph.consumers()
    nodes = list(graph.nodes)
    out_set = set(graph.outputs)
    producer: Dict[str, Node] = graph.producer_map()

    fused: List[Node] = []
    skip: Set[int] = set()
    for idx, node in enumerate(nodes):
        if idx in skip:
            continue
        if node.op == "SIGMOID":
            sig_out = node.outputs[0]
            cons = consumers.get(sig_out, [])
            if (len(cons) == 1 and cons[0].op == "MUL"
                    and sig_out not in out_set):
                mul = cons[0]
                other = [i for i in mul.inputs if i != sig_out]
                if len(other) == 1 and other[0] == node.inputs[0]:
                    x = node.inputs[0]
                    fused.append(Node(
                        op="SILU_FUSED",
                        inputs=[x],
                        outputs=list(mul.outputs),
                        attrs=dict(
                            in_scale=graph.tensors[x].quant.scale,
                            sig_scale=graph.tensors[sig_out].quant.scale,
                            out_scale=graph.tensors[mul.outputs[0]].quant.scale,
                        ),
                        name=f"{node.name}+{mul.name}",
                    ))
                    skip.add(nodes.index(mul))
                    continue
        fused.append(node)
    return fused


def fuse_act_into_conv(graph: Graph) -> Graph:
    """Fold a standalone activation node (RELU / LEAKY_RELU / SILU /
    SILU_FUSED) into the preceding CONV2D's ``activation`` attr when the
    conv feeds only that node.

    The serving tier's fused conv kernels apply the activation on the
    f32 pre-activation inside the requantize epilogue — one intermediate
    quantization fewer than the interpreter pipeline (reference analog:
    the format's fused-activation field, ``include/mars.h:82-91``, which
    the C runtime only honors for RELU, ``mars_runtime.c:701-707``).
    Applies :func:`fuse_silu_pairs` first so SIGMOID+MUL pairs fold too.
    Operates on a node-copied graph: Node objects may be shared with
    other engines built over the same Graph, and this pass rewires conv
    outputs in place.
    """
    graph = Graph(
        nodes=[Node(op=n.op, inputs=list(n.inputs),
                    outputs=list(n.outputs), attrs=dict(n.attrs),
                    name=n.name) for n in graph.nodes],
        tensors=graph.tensors, inputs=list(graph.inputs),
        outputs=list(graph.outputs), name=graph.name)
    graph.nodes = fuse_silu_pairs(graph)
    consumers = graph.consumers()
    producer = graph.producer_map()
    out_set = set(graph.outputs)
    fusable = {"RELU": "RELU", "LEAKY_RELU": "LEAKY_RELU",
               "SILU": "SILU", "SILU_FUSED": "SILU"}
    remove = set()
    for i, node in enumerate(graph.nodes):
        act = fusable.get(node.op)
        if act is None:
            continue
        src = node.inputs[0]
        prod = producer.get(src)
        if (prod is None or prod.op != "CONV2D"
                or prod.attrs.get("activation", "NONE") != "NONE"
                or prod.attrs.get("dilation", (1, 1)) != (1, 1)
                or len(consumers.get(src, [])) != 1
                or src in out_set):
            continue
        prod.attrs["activation"] = act
        if node.op == "LEAKY_RELU":
            prod.attrs["alpha"] = node.attrs.get("alpha", 0.01) or 0.01
        prod.outputs = list(node.outputs)
        remove.add(i)
    if remove:
        graph.nodes = [n for i, n in enumerate(graph.nodes)
                       if i not in remove]
    return graph


def fold_batchnorm(graph: Graph) -> Graph:
    """Fold BATCHNORM(conv_out) into the preceding f32 CONV2D's weights.

    y = (conv(x, W) + b) * s + t  ==  conv(x, W*s) + (b*s + t)
    Only applied when the conv output feeds just the BN, is not itself a
    graph output, and both ops are f32. Non-destructive: folded weights
    and biases go into FRESH tensors and the conv is REPLACED, never
    mutated — Graph copies share Node/TensorInfo objects (see
    fuse_act_into_conv's docstring), so an in-place fold would
    double-apply the BN scale if the same source graph builds two
    engines.
    """
    consumers = graph.consumers()
    producer = graph.producer_map()
    out_set = set(graph.outputs)
    nodes = list(graph.nodes)
    idx_of = {id(n): i for i, n in enumerate(nodes)}
    remove: Set[int] = set()
    replace: Dict[int, Node] = {}

    for i, node in enumerate(nodes):
        if node.op != "BATCHNORM" or len(node.inputs) < 3:
            continue
        src = node.inputs[0]
        if src in out_set:
            continue   # conv output must stay produced
        prod = producer.get(src)
        if prod is None or prod.op != "CONV2D":
            continue
        pi = idx_of.get(id(prod))
        if pi is None or pi in replace:
            continue
        if len(consumers.get(src, [])) != 1:
            continue
        wt = graph.tensors.get(prod.inputs[1]) if len(prod.inputs) > 1 else None
        sc_t = graph.tensors.get(node.inputs[1])
        bi_t = graph.tensors.get(node.inputs[2])
        if wt is None or wt.data is None or sc_t is None or bi_t is None:
            continue
        if wt.data.dtype != np.float32:
            continue
        s = sc_t.data.reshape(-1).astype(np.float32)
        t = bi_t.data.reshape(-1).astype(np.float32)
        w_name = f"{prod.inputs[1]}__bnf{i}"
        graph.tensors[w_name] = TensorInfo(
            name=w_name, shape=wt.shape, dtype=wt.dtype,
            data=wt.data * s[:, None, None, None])
        if len(prod.inputs) > 2:
            b_new = graph.tensors[prod.inputs[2]].data \
                .astype(np.float32) * s + t
        else:
            b_new = t.copy()
        b_name = f"{prod.name}__bnf{i}_b"
        graph.tensors[b_name] = TensorInfo(
            name=b_name, shape=b_new.shape, dtype=np.dtype(np.float32),
            data=b_new)
        # the replacement conv writes what BN wrote
        replace[pi] = Node(
            op="CONV2D", inputs=[prod.inputs[0], w_name, b_name],
            outputs=list(node.outputs), attrs=dict(prod.attrs),
            name=prod.name)
        remove.add(i)

    if remove:
        graph.nodes = [replace.get(j, n) for j, n in enumerate(nodes)
                       if j not in remove]
    return graph


def dequantize_graph(graph: Graph, quantize_outputs: bool = True) -> Graph:
    """Lower an int8 graph to float compute with int8 I/O at the edges.

    The fast serving tier: int8 weights are dequantized once at load
    (``w * w_scale``), int32 biases become ``b * in_scale * w_scale``, all
    activations are float (bf16 on the MXU via ExecOptions.compute_dtype),
    and DEQUANT/QUANT nodes bracket the graph edges so callers still see
    the model's declared int8 interface. This trades bit-exact int8
    requantization (the ``exact`` tier keeps it) for ~an order of
    magnitude on the MXU — measured 8.6x on yolov5s@640 v5e — because
    XLA's native bf16 convolutions beat any int8 emulation path.
    """
    from thingino_accel_tpu.ir.graph import Graph as G, Node, TensorInfo

    tensors: Dict[str, TensorInfo] = {}
    nodes: List[Node] = []

    def is_i8(t: TensorInfo) -> bool:
        return (np.issubdtype(t.dtype, np.signedinteger)
                and t.dtype.itemsize == 1)

    conv_ws: Dict[str, str] = {}   # weight name -> owning conv input name
    conv_bias: Dict[str, tuple] = {}
    bias_rename: Dict[int, str] = {}   # id(node) -> cloned bias name
    for node in graph.nodes:
        if node.op in ("CONV2D", "DEPTHWISE_CONV2D", "FC") \
                and len(node.inputs) >= 2:
            conv_ws[node.inputs[1]] = node.inputs[0]
            if len(node.inputs) >= 3:
                b = node.inputs[2]
                key = (node.inputs[0], node.inputs[1])
                if b not in conv_bias:
                    conv_bias[b] = key
                elif conv_bias[b] != key:
                    # int32 bias shared by convs with different input
                    # scales: the dequant is per-conv (in*w units), so
                    # a shared const must be CLONED per context —
                    # last-wins would scale it with the wrong conv's
                    # input scale
                    nb = f"{b}__dqclone{len(bias_rename)}"
                    bias_rename[id(node)] = nb
                    conv_bias[nb] = key

    for name, t in graph.tensors.items():
        nt = TensorInfo(name=t.name, shape=t.shape, dtype=t.dtype,
                        quant=t.quant, data=t.data,
                        source_format=t.source_format)
        if t.is_const:
            if name in conv_ws and np.issubdtype(t.data.dtype, np.signedinteger):
                if t.channel_scales is not None:
                    sc = np.asarray(t.channel_scales, np.float32)
                    bshape = (-1,) + (1,) * (t.data.ndim - 1)
                    nt.data = t.data.astype(np.float32) * sc.reshape(bshape)
                else:
                    nt.data = (t.data.astype(np.float32)
                               * np.float32(t.quant.scale))
                nt.dtype = nt.data.dtype
            elif name in conv_bias and np.issubdtype(
                    t.data.dtype, np.signedinteger) and t.data.dtype.itemsize >= 4:
                x_name, w_name = conv_bias[name]
                xs = graph.tensors[x_name].quant.scale
                wt = graph.tensors[w_name]
                ws = (np.asarray(wt.channel_scales, np.float32)
                      if wt.channel_scales is not None
                      else np.float32(wt.quant.scale))
                nt.data = (t.data.astype(np.float32)
                           * (np.float32(xs) * ws))
                nt.dtype = nt.data.dtype
        elif is_i8(t) and name not in graph.inputs:
            nt.dtype = np.dtype(np.float32)
        tensors[name] = nt

    # cloned shared biases (per-conv dequant contexts)
    for nm, (x_name, w_name) in conv_bias.items():
        if nm in tensors or "__dqclone" not in nm:
            continue
        t = graph.tensors[nm.split("__dqclone")[0]]
        xs = graph.tensors[x_name].quant.scale
        wt = graph.tensors[w_name]
        ws = (np.asarray(wt.channel_scales, np.float32)
              if wt.channel_scales is not None
              else np.float32(wt.quant.scale))
        data = t.data.astype(np.float32) * (np.float32(xs) * ws)
        tensors[nm] = TensorInfo(name=nm, shape=t.shape,
                                 dtype=data.dtype, data=data)

    # input dequant nodes
    input_map: Dict[str, str] = {}
    for name in graph.inputs:
        t = graph.tensors[name]
        if is_i8(t):
            deq = f"{name}__deq"
            tensors[deq] = TensorInfo(
                name=deq, shape=t.shape, dtype=np.dtype(np.float32))
            nodes.append(Node(op="DEQUANT", inputs=[name], outputs=[deq],
                              attrs=dict(scale=t.quant.scale),
                              name=f"deq_{name}"))
            input_map[name] = deq

    for node in graph.nodes:
        ins = [input_map.get(i, i) for i in node.inputs]
        if id(node) in bias_rename:
            ins[2] = bias_rename[id(node)]
        n = Node(op=node.op, inputs=ins,
                 outputs=list(node.outputs), attrs=dict(node.attrs),
                 name=node.name)
        nodes.append(n)

    # output quant nodes (restore the declared int8 interface)
    outputs = []
    for name in graph.outputs:
        t = graph.tensors[name]
        if is_i8(t) and quantize_outputs:
            qn = f"{name}__q"
            tensors[qn] = TensorInfo(
                name=qn, shape=t.shape, dtype=t.dtype, quant=t.quant)
            nodes.append(Node(op="QUANT", inputs=[name], outputs=[qn],
                              attrs=dict(scale=t.quant.scale),
                              name=f"q_{name}"))
            outputs.append(qn)
        else:
            outputs.append(name)

    g = G(nodes=nodes, tensors=tensors, inputs=list(graph.inputs),
          outputs=outputs, name=f"{graph.name}_deq")
    g.validate()
    return g


def dead_code(graph: Graph) -> Graph:
    """Remove nodes whose outputs reach no graph output."""
    live: Set[str] = set(graph.outputs)
    keep: List[Node] = []
    for node in reversed(graph.nodes):
        if any(o in live for o in node.outputs):
            keep.append(node)
            live.update(node.inputs)
    graph.nodes = list(reversed(keep))
    return graph


def stem_space_to_depth(graph: Graph) -> bool:
    """Rewrite an even-kernel stride-2 thin-channel stem conv into its
    space-to-depth form: input ``[B, H, W, C]`` + conv ``KxK s2`` becomes
    input ``[B, H/2, W/2, 4C]`` (2x2 pixel blocks flattened into
    channels, row-major) + conv ``(K/2)x(K/2) s1`` with block-gathered
    weights. Identical arithmetic — every output value sums exactly the
    same products (int32/f32 accumulation is order-insensitive here), so
    the exact tier is bit-identical.

    This is the SURVEY §7 "small-channel stem" lever: a 3-channel 640px
    input underutilizes the 128-wide MXU and pays a strided 6x6 window
    walk; the s2d form has identical FLOPs and im2col width (K*K*C) but
    dense 3x3 loads (+2.2% e2e measured on yolov5s@640 b128, v5e, with
    bit-identical detections — examples/stem_s2d_experiment.py). The
    caller must then feed s2d frames: free for a fixed camera feed (the
    H2D DMA writes the same bytes in block order —
    ``models.yolo.space_to_depth_frames``), or an on-device relayout
    after letterbox for dynamic sizes (which gives the win back; only
    apply this pass for pre-sized feeds).

    Returns True if the graph was rewritten (exactly one eligible stem:
    conv consuming a graph input with K ≡ 2 (mod 4), stride 2, cin < 16,
    even spatial dims, and SAME padding — the per-side pad (K-2)/2 must
    itself be even to land on 2x2-block boundaries, which K=4/8 do not).
    """
    in_names = set(graph.inputs)
    cons = graph.consumers()
    for node in graph.nodes:
        if node.op != "CONV2D" or node.inputs[0] not in in_names:
            continue
        # the input's shape changes — every consumer must be this conv
        if any(c is not node for c in cons.get(node.inputs[0], [])):
            continue
        in_t = graph.tensors[node.inputs[0]]
        if len(in_t.shape) != 4:
            continue
        b, h, w, c = in_t.shape
        kh, kw = node.attrs.get("kernel", (0, 0))
        # K must be ≡ 2 (mod 4): the SAME per-side pad (K-2)/2 has to
        # be EVEN to be expressible as whole 2x2-block pads — for
        # K=4/8 the stride-2 window starts at an odd pixel row and no
        # block conv reproduces it (every output would shift by one).
        if (node.attrs.get("stride") != (2, 2) or kh != kw
                or kh % 4 != 2 or c >= 16 or h % 2 or w % 2
                or node.attrs.get("groups", 1) != 1
                or node.attrs.get("dilation", (1, 1)) != (1, 1)):
            continue
        # SAME padding for even K stride 2: total pad = K - 2 (even),
        # split (K-2)/2 per side -> becomes (Kb - 1) with Kb = K/2, the
        # SAME pad of an odd (Kb)x(Kb) stride-1 conv. Explicit pads
        # other than that are not expressible block-wise.
        ep = node.attrs.get("explicit_pad")
        if ep is not None and tuple(ep) != ((kh - 2) // 2,) * 4:
            continue
        wt = graph.tensors[node.inputs[1]]
        o, ci, _, _ = wt.shape            # OIHW
        assert ci == c, (wt.shape, in_t.shape)
        kb = kh // 2
        # OIHW [O, C, K, K] -> [O, 4C, Kb, Kb]: tap (2i+p, 2j+q) of
        # channel ch becomes tap (i, j) of block-channel (p*2+q)*C+ch
        wd = wt.data.reshape(o, c, kb, 2, kb, 2)
        wd = wd.transpose(0, 3, 5, 1, 2, 4).reshape(o, 4 * c, kb, kb)
        wt.data = np.ascontiguousarray(wd)
        wt.shape = tuple(wd.shape)
        node.attrs["kernel"] = (kb, kb)
        node.attrs["stride"] = (1, 1)
        if ep is not None:
            node.attrs["explicit_pad"] = ((kb - 1) // 2,) * 4
        in_t.shape = (b, h // 2, w // 2, 4 * c)
        return True
    return False


def fold_stage2_downsample(graph: Graph) -> bool:
    """Extend the s2d fold one stage deeper: the stem conv emits its
    output directly in 2x2 space-to-depth layout, and the stage-2
    ``3x3 s2`` downsample conv becomes ``2x2 s1`` over the folded
    tensor — the thin-K downsample (K=C_stem, e.g. 32) runs at
    K=4*C_stem instead.

    Motivation (examples/fold_probe.py, v5e b128): the isolated
    ``3x3 s2 320x320x32 -> 64`` runs 1.14x faster as ``2x2 s1
    160x160x128 -> 64`` (36.7 -> 32.3 us/frame). The general region
    fold measured 0.49x (recorded negative, same probe) — only this
    two-node pattern wins, because the downsample consumes the fold
    for free.

    Pattern: ``input -> convA (odd K, s1, SAME) [-> SIGMOID/MUL SiLU
    chain] -> convB (3x3 s2 SAME)``, convA's output consumed only by
    the chain, the chain only by convB. Arithmetic is exact: every
    output sums the same products (the stem rewrite places each
    original tap at one parity position; the downsample rewrite
    gathers the same 3x3 window from parity channels, out-of-window
    parity taps zeroed), so the exact tier stays bit-identical
    (tests/test_fold_stage2.py).

    Returns True if rewritten.
    """
    cons = graph.consumers()
    in_names = set(graph.inputs)
    for a_node in graph.nodes:
        if (a_node.op != "CONV2D" or a_node.inputs[0] not in in_names
                or a_node.attrs.get("stride") != (1, 1)
                or a_node.attrs.get("groups", 1) != 1
                or a_node.attrs.get("dilation", (1, 1)) != (1, 1)):
            continue
        ka, kaw = a_node.attrs.get("kernel", (0, 0))
        if ka != kaw or ka % 2 != 1:
            continue
        pa = (ka - 1) // 2
        ep = a_node.attrs.get("explicit_pad")
        if (a_node.attrs.get("padding") == "EXPLICIT"
                and ep is not None and tuple(ep) != (pa,) * 4):
            continue
        t_name = a_node.outputs[0]
        t = graph.tensors[t_name]
        if len(t.shape) != 4 or t.shape[1] % 2 or t.shape[2] % 2:
            continue
        # walk the (optional) SiLU chain to the single conv consumer
        chain_tensors: List[str] = []
        cur = t_name
        b_node = None
        while True:
            cs_ = cons.get(cur, [])
            if len(cs_) == 1 and cs_[0].op == "CONV2D":
                b_node = cs_[0]
                break
            if len(cs_) == 2:
                sig = next((n for n in cs_ if n.op == "SIGMOID"), None)
                mul = next((n for n in cs_ if n.op == "MUL"), None)
                if (sig is not None and mul is not None
                        and set(mul.inputs) == {cur, sig.outputs[0]}
                        and cons.get(sig.outputs[0]) == [mul]):
                    chain_tensors += [sig.outputs[0], mul.outputs[0]]
                    cur = mul.outputs[0]
                    continue
            break
        if b_node is None or b_node.inputs[0] != cur:
            continue
        if (b_node.attrs.get("kernel") != (3, 3)
                or b_node.attrs.get("stride") != (2, 2)
                or b_node.attrs.get("groups", 1) != 1
                or b_node.attrs.get("dilation", (1, 1)) != (1, 1)):
            continue
        # Resolve convB's ACTUAL (pt, pl) the way the runtime does
        # (ops/reference.py:_conv_pads): the rewrite below assumes the
        # 3x3 window starts one pixel above/left of the output site.
        # SAME on an even input gives pad_h=1 -> pt=0 (bottom-heavy),
        # which would shift every value by one pixel — skip it.
        pad_mode_b = b_node.attrs.get("padding")
        epb = b_node.attrs.get("explicit_pad")
        if pad_mode_b == "EXPLICIT" and epb is not None:
            ptl_b = (epb[0], epb[2])
        elif pad_mode_b == "SAME":
            bt_out = graph.tensors[b_node.outputs[0]]
            oh, ow = bt_out.shape[1], bt_out.shape[2]
            ih, iw = t.shape[1], t.shape[2]
            ptl_b = (max(0, ((oh - 1) * 2 + 3 - ih) // 2),
                     max(0, ((ow - 1) * 2 + 3 - iw) // 2))
        else:
            ptl_b = (0, 0) if pad_mode_b == "VALID" else None
        if ptl_b != (1, 1):
            continue
        # Tensors rewritten to the folded parity-major layout must not
        # escape the graph: external consumers would silently see
        # relaid-out data.
        out_set = set(graph.outputs)
        if t_name in out_set or any(nm in out_set for nm in chain_tensors):
            continue

        bb, h, w, ca = t.shape
        wa = graph.tensors[a_node.inputs[1]]
        oa, ci, _, _ = wa.shape              # OIHW
        # stem: each original tap lands at parity offset (p, q) of the
        # (ka+1)x(ka+1) stride-2 kernel; folded out-channel order is
        # parity-major (p*2+q)*Oa + o (the stem_space_to_depth input
        # convention)
        wd = np.zeros((4, oa, ci, ka + 1, ka + 1), wa.data.dtype)
        for p in (0, 1):
            for q in (0, 1):
                wd[p * 2 + q, :, :, p:p + ka, q:q + ka] = wa.data
        wa.data = np.ascontiguousarray(
            wd.reshape(4 * oa, ci, ka + 1, ka + 1))
        wa.shape = wa.data.shape
        if wa.channel_scales is not None:
            wa.channel_scales = np.tile(
                np.asarray(wa.channel_scales), 4)
        if len(a_node.inputs) > 2:
            bt = graph.tensors[a_node.inputs[2]]
            bt.data = np.ascontiguousarray(np.tile(bt.data, 4))
            bt.shape = bt.data.shape
        a_node.attrs["kernel"] = (ka + 1, ka + 1)
        a_node.attrs["stride"] = (2, 2)
        a_node.attrs["padding"] = "EXPLICIT"
        a_node.attrs["explicit_pad"] = (pa, pa, pa, pa)
        # fold every tensor on the A->B chain
        for nm in [t_name] + chain_tensors:
            tt = graph.tensors[nm]
            tt.shape = (bb, h // 2, w // 2, 4 * ca)

        wb = graph.tensors[b_node.inputs[1]]
        ob, cb, _, _ = wb.shape
        assert cb == ca, (wb.shape, t.shape)
        # downsample: original tap (ky, kx) of channel c comes from
        # folded channel (p*2+q)*ca + c at folded tap (ku, kv) where
        # ky = 2*ku + p - 1 (and same for kx); positions the 3x3
        # window never reaches stay zero
        wbd = np.zeros((ob, 4, ca, 2, 2), wb.data.dtype)
        for p in (0, 1):
            for q in (0, 1):
                for ku in (0, 1):
                    for kv in (0, 1):
                        ky, kx = 2 * ku + p - 1, 2 * kv + q - 1
                        if 0 <= ky < 3 and 0 <= kx < 3:
                            wbd[:, p * 2 + q, :, ku, kv] = \
                                wb.data[:, :, ky, kx]
        wb.data = np.ascontiguousarray(wbd.reshape(ob, 4 * ca, 2, 2))
        wb.shape = wb.data.shape
        b_node.attrs["kernel"] = (2, 2)
        b_node.attrs["stride"] = (1, 1)
        b_node.attrs["padding"] = "EXPLICIT"
        b_node.attrs["explicit_pad"] = (1, 0, 1, 0)
        graph.validate()
        return True
    return False


def split_detect_heads(graph: Graph, step: int = 85) -> List[List[str]]:
    """Split each detect-conv graph output (1x1, ``A*step`` channels)
    into ``A`` per-anchor convs of ``step`` channels — weight/bias row
    slices, so each split output is the corresponding channel slice of
    the original BIT for bit.

    Motivation: the packed ``[B,H,W,A*step]`` head needs a
    lane-splitting ``(A, step)`` reshape in the decode consumer, which
    XLA materializes as a relayout copy (~10 us/frame at 80x80 b128);
    per-anchor heads decode with plain channel slices.
    ``models.yolo.decode_and_parse_split`` consumes the result.

    Returns per-original-output lists of the new output names (in
    anchor order), or [] if no eligible output was found. Graph outputs
    are replaced in order (level-major, anchor-minor).
    """
    groups: List[List[str]] = []
    new_outputs: List[str] = []
    drop_nodes = set()
    cons = graph.consumers()
    for out_name in list(graph.outputs):
        node = next((n for n in graph.nodes if out_name in n.outputs), None)
        out_t = graph.tensors[out_name]
        if (node is None or node.op != "CONV2D"
                or node.attrs.get("kernel") != (1, 1)
                or len(out_t.shape) != 4 or out_t.shape[3] % step
                or out_t.shape[3] == step
                or cons.get(out_name)):   # packed tensor has consumers
            new_outputs.append(out_name)
            continue
        a = out_t.shape[3] // step
        wt = graph.tensors[node.inputs[1]]
        bias_name = node.inputs[2] if len(node.inputs) > 2 else None
        group = []
        for anc in range(a):
            sl = slice(anc * step, (anc + 1) * step)
            wn = f"{node.inputs[1]}_a{anc}"
            graph.tensors[wn] = TensorInfo(
                name=wn, shape=(step,) + wt.shape[1:], dtype=wt.dtype,
                quant=wt.quant, channel_scales=(
                    None if wt.channel_scales is None
                    else np.ascontiguousarray(wt.channel_scales[sl])),
                data=np.ascontiguousarray(wt.data[sl]))
            ins = [node.inputs[0], wn]
            if bias_name is not None:
                bt = graph.tensors[bias_name]
                bn = f"{bias_name}_a{anc}"
                graph.tensors[bn] = TensorInfo(
                    name=bn, shape=(step,), dtype=bt.dtype,
                    data=np.ascontiguousarray(bt.data[sl]))
                ins.append(bn)
            on = f"{out_name}_a{anc}"
            graph.tensors[on] = TensorInfo(
                name=on, shape=out_t.shape[:3] + (step,),
                dtype=out_t.dtype, quant=out_t.quant)
            graph.nodes.append(Node(
                op="CONV2D", inputs=ins, outputs=[on],
                attrs=dict(node.attrs)))
            group.append(on)
        drop_nodes.add(id(node))
        groups.append(group)
        new_outputs.extend(group)
    if not groups:
        return []
    graph.outputs = new_outputs
    graph.nodes = [n for n in graph.nodes if id(n) not in drop_nodes]
    graph.validate()
    return groups


def pad_detect_heads(graph: Graph, step: int = 85,
                     block: int = 128) -> int:
    """Pad each detect-conv graph output's per-anchor channel group
    from ``step`` to ``block`` (the TPU lane width) with ZERO weight
    rows, so the decode consumer's ``(A, block)`` reshape splits the
    channel dim at a lane-tile boundary and is layout-preserving.

    Motivation (measured, yolov5n@640 b128 v5e): the packed
    ``[B,H,W,A*85]`` heads force XLA to materialize relayout copies
    between the detect convs and the decode — 10.6 us/frame of the
    119 us e2e frame time (`copy.122/124/128` in the TPU HLO; the
    85-channel groups straddle the (8,128) lane tiles). Zero weight
    rows add +50% FLOPs to the three 1x1 head convs (~4% of model
    MACs) but produce BIT-IDENTICAL logits in the real channels —
    float accumulation over appended zeros is exact, unlike
    `split_detect_heads` (which measured -8% e2e: three thin convs
    lose XLA's layout choice) or a head-layout constraint (measured
    -4%, docs/KERNELS.md round-3).

    The decode side (`models.yolo.decode_and_parse`) derives the
    per-anchor block from the channel count and slices the real
    ``step`` channels, so padded and unpadded heads share one decode.
    Returns the number of padded head convs.
    """
    cons = graph.consumers()
    n_padded = 0
    for out_name in list(graph.outputs):
        node = next((n for n in graph.nodes if out_name in n.outputs),
                    None)
        out_t = graph.tensors[out_name]
        if (node is None or node.op != "CONV2D"
                or node.attrs.get("kernel") != (1, 1)
                or len(out_t.shape) != 4 or out_t.shape[3] % step
                or out_t.shape[3] == step
                or cons.get(out_name)):   # packed tensor has consumers
            continue
        a = out_t.shape[3] // step
        pad = block - step
        if pad <= 0:
            continue
        wt = graph.tensors[node.inputs[1]]
        # weight rows are output channels (OIHW); interleave zero rows
        # after each anchor's group
        w = wt.data.reshape((a, step) + wt.data.shape[1:])
        wz = np.zeros((a, pad) + wt.data.shape[1:], wt.data.dtype)
        wt.data = np.concatenate([w, wz], axis=1).reshape(
            (a * block,) + wt.data.shape[1:])
        wt.shape = wt.data.shape
        if wt.channel_scales is not None:
            cs = np.asarray(wt.channel_scales).reshape(a, step)
            wt.channel_scales = np.concatenate(
                [cs, np.ones((a, pad), cs.dtype)], axis=1).reshape(-1)
        if len(node.inputs) > 2:
            bt = graph.tensors[node.inputs[2]]
            bv = bt.data.reshape(a, step)
            bt.data = np.concatenate(
                [bv, np.zeros((a, pad), bt.data.dtype)], axis=1
            ).reshape(-1)
            bt.shape = bt.data.shape
        out_t.shape = out_t.shape[:3] + (a * block,)
        n_padded += 1
    if n_padded:
        graph.validate()
    return n_padded


def semantic_detect_heads(graph: Graph, step: int = 85) -> int:
    """Permute each detect-conv graph output's channels from
    anchor-major ``[anchor][x y w h obj cls...]`` to semantic-major /
    anchor-minor ``[x(A), y(A), w(A), h(A), obj(A), cls0(A), ...]`` by
    permuting the conv's weight rows (free at import time; bit-exact
    per channel — nothing is recomputed, only reordered).

    Motivation (measured, yolov5n@640 b128 v5e round-4 HLO): the
    decode's lane-splitting ``(A, 85)`` reshape forces XLA to
    materialize full-head relayout copies (`copy.122/124/128`,
    ~15 us/frame). With anchor-minor channels the decode
    (``models.yolo.decode_and_parse_semantic``) consumes CONTIGUOUS
    channel slices — xy/wh/obj are ``feat[..., k*A:(k+1)*A]`` and the
    class max/argmax is a fused elementwise chain over per-class
    slices — so no cross-lane reshape of the full tensor exists in the
    program. Alternative attacks on the same copies (pad to 128,
    split into per-anchor convs, layout constraint) all measured
    NEGATIVE (docs/KERNELS.md round-4 table); this one removes the
    reshape instead of re-shaping its operands.

    Returns the number of permuted head convs.
    """
    cons = graph.consumers()
    n = 0
    for out_name in list(graph.outputs):
        node = next((m for m in graph.nodes if out_name in m.outputs),
                    None)
        out_t = graph.tensors[out_name]
        if (node is None or node.op != "CONV2D"
                or node.attrs.get("kernel") != (1, 1)
                or len(out_t.shape) != 4 or out_t.shape[3] % step
                or out_t.shape[3] == step
                or cons.get(out_name)):   # packed tensor has consumers
            continue
        a = out_t.shape[3] // step
        # perm[new] = old: new channel s*a + j <- old j*step + s
        perm = np.arange(a * step).reshape(a, step).T.reshape(-1)
        wt = graph.tensors[node.inputs[1]]
        wt.data = np.ascontiguousarray(wt.data[perm])
        if wt.channel_scales is not None:
            wt.channel_scales = np.ascontiguousarray(
                np.asarray(wt.channel_scales)[perm])
        if len(node.inputs) > 2:
            bt = graph.tensors[node.inputs[2]]
            bt.data = np.ascontiguousarray(bt.data[perm])
        node.attrs["head_semantic"] = True
        n += 1
    if n:
        graph.validate()
    return n


def split_concat_convs(graph: Graph, mode: str = "upsample") -> int:
    """Split 1x1 float convs over channel concats into per-part dots.

    ``conv1x1(concat(p0, p1, ...))`` becomes ``act(sum_i conv1x1_i(p_i))``
    with the weight matrix sliced along input channels — the concat
    buffer is never materialized for this consumer (XLA dot operands
    must be materialized, so a concat feeding a conv always costs a
    whole-tensor copy otherwise). When a part is a nearest-neighbor
    UPSAMPLE output, its dot additionally commutes below the upsample —
    ``conv1x1(up(x)) == up(conv1x1(x))`` exactly, since both the conv
    and the duplication are pointwise in space — so that part's MACs run
    at the LOW resolution (4x fewer at scale 2) and the broadcast fuses
    into the final elementwise add instead of materializing.

    This is the fast-tier analog of the serving tier's virtual-concat
    kernels (``ops/fused_kernels.matmul_int8_fused_multi``); the target
    is the FPN ``upsample -> concat -> C3`` nodes of the YOLO neck
    (reference semantics anchor: the concat executor it bypasses,
    ``src/mars/mars_runtime.c:963-1000``).

    Float graphs only (run after ``dequantize_graph``): the rewrite
    reorders the channel accumulation, which is exact in math but not
    in the int8 tier's single-requant dataflow.

    ``mode``: ``"upsample"`` rewrites only concats with at least one
    upsampled part (the FPN win); ``"all"`` rewrites every eligible
    1x1-over-concat. Returns the number of convs rewritten.
    """
    producers: Dict[str, Node] = {}
    for n in graph.nodes:
        for o in n.outputs:
            producers[o] = n

    def is_float(nm: str) -> bool:
        return not (np.issubdtype(graph.tensors[nm].dtype, np.signedinteger))

    new_nodes: List[Node] = []
    n_rewritten = 0
    uid = 0
    for node in graph.nodes:
        a = node.attrs
        ok = (node.op == "CONV2D"
              and a.get("kernel") == (1, 1)
              and a.get("stride") == (1, 1)
              and a.get("dilation", (1, 1)) == (1, 1)
              and a.get("groups", 1) == 1
              and tuple(a.get("explicit_pad") or (0, 0, 0, 0)) == (0, 0, 0, 0)
              and a.get("activation", "NONE") in (
                  "NONE", "RELU", "SILU", "LEAKY_RELU", "RELU6", "SIGMOID")
              and len(node.inputs) >= 2)
        src = producers.get(node.inputs[0]) if ok else None
        ok = (ok and src is not None and src.op == "CONCAT"
              and src.attrs.get("axis", 3) == 3
              and len(src.inputs) >= 2
              and is_float(node.inputs[0])
              and graph.tensors[node.inputs[1]].is_const
              and is_float(node.inputs[1])
              and all(i in graph.tensors
                      and not graph.tensors[i].is_const
                      and len(graph.tensors[i].shape) == 4
                      for i in src.inputs))
        if ok:
            parts = [graph.tensors[i] for i in src.inputs]
            x_t = graph.tensors[node.inputs[0]]
            ok = (sum(p.shape[3] for p in parts) == x_t.shape[3]
                  and all(p.shape[:3] == x_t.shape[:3] for p in parts)
                  and all(is_float(i) for i in src.inputs)
                  and 0 not in x_t.shape)
        if ok:
            # per-part plan: (input name, low-res?, upsample attrs)
            plan = []
            any_up = False
            for i in src.inputs:
                p = producers.get(i)
                if (p is not None and p.op == "UPSAMPLE"
                        and p.attrs.get("mode", 0) == 0
                        and is_float(p.inputs[0])):
                    lo = graph.tensors[p.inputs[0]]
                    hi = graph.tensors[i]
                    sc = p.attrs.get("scale", (0, 0))
                    if (sc[0] > 0 and sc[1] > 0
                            and lo.shape[1] * sc[0] == hi.shape[1]
                            and lo.shape[2] * sc[1] == hi.shape[2]):
                        plan.append((p.inputs[0], dict(p.attrs)))
                        any_up = True
                        continue
                plan.append((i, None))
            if mode == "upsample" and not any_up:
                ok = False
            elif mode == "wide" and not any_up and not all(
                    graph.tensors[i].shape[3] >= 128 for i in src.inputs):
                # "wide": the upsample splits PLUS concats whose every
                # part is >= the 128-lane width — splitting those costs
                # no MXU lane padding (unlike the narrow C3 halves that
                # made mode="all" measure -4.7%), and the concat buffer
                # (SPPF pyramid, FPN down-path) is never materialized
                ok = False
        if not ok:
            new_nodes.append(node)
            continue

        out_name = node.outputs[0]
        out_t = graph.tensors[out_name]
        w_t = graph.tensors[node.inputs[1]]
        W = w_t.data                       # OIHW float [O, C, 1, 1]
        o_ch = W.shape[0]
        bias_in = list(node.inputs[2:3])   # attach to the first part conv
        act = a.get("activation", "NONE")
        fdt = np.dtype(np.float32)

        def fresh(tag, shape):
            nonlocal uid
            uid += 1
            nm = f"{out_name}__scc{uid}_{tag}"
            graph.tensors[nm] = TensorInfo(name=nm, shape=tuple(shape),
                                           dtype=fdt)
            return nm

        acc = None
        off = 0
        for pi, (src_nm, up_attrs) in enumerate(plan):
            ci = graph.tensors[src.inputs[pi]].shape[3]
            wnm = fresh(f"w{pi}", (o_ch, ci, 1, 1))
            graph.tensors[wnm].data = np.ascontiguousarray(
                W[:, off:off + ci]).astype(W.dtype)
            graph.tensors[wnm].dtype = W.dtype
            off += ci
            st = graph.tensors[src_nm]
            part_out = fresh(f"p{pi}", (st.shape[0], st.shape[1],
                                        st.shape[2], o_ch))
            new_nodes.append(Node(
                op="CONV2D", inputs=[src_nm, wnm] + (bias_in if pi == 0
                                                     else []),
                outputs=[part_out],
                attrs=dict(kernel=(1, 1), stride=(1, 1), dilation=(1, 1),
                           padding="EXPLICIT", explicit_pad=(0, 0, 0, 0),
                           groups=1, activation="NONE"),
                name=f"{node.name}_scc{pi}"))
            if up_attrs is not None:
                up_out = fresh(f"u{pi}", (st.shape[0],
                                          st.shape[1] * up_attrs["scale"][0],
                                          st.shape[2] * up_attrs["scale"][1],
                                          o_ch))
                new_nodes.append(Node(op="UPSAMPLE", inputs=[part_out],
                                      outputs=[up_out], attrs=up_attrs,
                                      name=f"{node.name}_sccu{pi}"))
                part_out = up_out
            if acc is None:
                acc = part_out
            else:
                tgt = (out_name if (pi == len(plan) - 1 and act == "NONE")
                       else fresh(f"s{pi}", out_t.shape))
                new_nodes.append(Node(op="ADD", inputs=[acc, part_out],
                                      outputs=[tgt],
                                      name=f"{node.name}_scca{pi}"))
                acc = tgt
        if act != "NONE":
            new_nodes.append(Node(
                op=act, inputs=[acc], outputs=[out_name],
                attrs=({"alpha": a.get("alpha")} if act == "LEAKY_RELU"
                       else {}),
                name=f"{node.name}_sccact"))
        n_rewritten += 1

    if n_rewritten:
        graph.nodes = new_nodes
        dead_code(graph)
        graph.validate()
    return n_rewritten


def merge_sibling_convs(graph: Graph) -> int:
    """Merge sibling convs over the same input into one wider conv.

    Two or more CONV2D nodes that consume the SAME activation with
    identical hyperparameters (kernel/stride/dilation/groups/pad/
    activation) become ONE conv whose weight is the output-channel
    concatenation, followed by a SPLIT back into the original output
    tensors. Mathematically exact: every output channel's dot product
    is over the same products — but the wider N can make XLA pick a
    different conv tiling, which reassociates the f32 accumulation
    over K (measured <= 2 int8 quanta on the real calibrated yolov5n;
    small graphs are bit-identical). The win is
    lane utilization: XLA pads a dot's N (output channels) to the
    128-wide lane dim, so the YOLO C3 blocks' cv1/cv2 pairs
    (N = c/2 = 32..64 on the small stages) waste half to 3/4 of every
    MXU issue; merged, N doubles.

    Float graphs only (run after ``dequantize_graph``): the int8 exact
    tier requantizes each conv output with its own per-tensor scale,
    which siblings don't share. The reference runs each conv layer
    record independently (``src/mars/mars_runtime.c`` conv dispatch);
    the merge is a pure TPU-shape optimization with no reference
    counterpart. Returns the number of groups merged.
    """
    def key_of(n: Node):
        a = n.attrs
        if (n.op != "CONV2D" or len(n.outputs) != 1
                or len(n.inputs) not in (2, 3)
                or a.get("groups", 1) != 1):
            return None
        w = graph.tensors.get(n.inputs[1])
        if (w is None or not w.is_const or len(w.shape) != 4
                or np.issubdtype(w.dtype, np.signedinteger)
                or w.channel_scales is not None):
            return None
        if len(n.inputs) == 3:
            b = graph.tensors.get(n.inputs[2])
            if (b is None or not b.is_const
                    or np.issubdtype(b.dtype, np.signedinteger)):
                return None
        out = graph.tensors[n.outputs[0]]
        if np.issubdtype(out.dtype, np.signedinteger):
            return None
        return (n.inputs[0], tuple(a.get("kernel", ())),
                tuple(a.get("stride", ())),
                tuple(a.get("dilation", (1, 1))),
                a.get("padding"),
                tuple(a.get("explicit_pad") or ()),
                a.get("activation", "NONE"), a.get("alpha"))

    groups: Dict[tuple, List[Node]] = {}
    for n in graph.nodes:
        k = key_of(n)
        if k is not None:
            groups.setdefault(k, []).append(n)
    groups = {k: v for k, v in groups.items() if len(v) >= 2}
    if not groups:
        return 0

    first_member = {id(v[0]): k for k, v in groups.items()}
    member_ids = {id(n) for v in groups.values() for n in v}
    new_nodes: List[Node] = []
    n_merged = 0
    for node in graph.nodes:
        if id(node) not in member_ids:
            new_nodes.append(node)
            continue
        k = first_member.get(id(node))
        if k is None:
            continue                       # later member: already emitted
        members = groups[k]
        sizes = [graph.tensors[m.outputs[0]].shape[3] for m in members]
        out0 = graph.tensors[members[0].outputs[0]]
        mnm = f"{members[0].outputs[0]}__msc"
        wnm = f"{mnm}_w"
        W = np.concatenate(
            [np.ascontiguousarray(graph.tensors[m.inputs[1]].data)
             for m in members], axis=0)
        graph.tensors[wnm] = TensorInfo(name=wnm, shape=W.shape,
                                        dtype=W.dtype, data=W)
        ins = [k[0], wnm]
        if any(len(m.inputs) == 3 for m in members):
            bs = []
            for m, sz in zip(members, sizes):
                if len(m.inputs) == 3:
                    bs.append(np.asarray(graph.tensors[m.inputs[2]].data,
                                         np.float32).reshape(-1))
                else:
                    bs.append(np.zeros(sz, np.float32))
            B = np.concatenate(bs)
            bnm = f"{mnm}_b"
            graph.tensors[bnm] = TensorInfo(name=bnm, shape=B.shape,
                                            dtype=B.dtype, data=B)
            ins.append(bnm)
        graph.tensors[mnm] = TensorInfo(
            name=mnm, shape=out0.shape[:3] + (sum(sizes),),
            dtype=out0.dtype)
        new_nodes.append(Node(
            op="CONV2D", inputs=ins, outputs=[mnm],
            attrs=dict(members[0].attrs),
            name=f"{members[0].name}_msc"))
        new_nodes.append(Node(
            op="SPLIT", inputs=[mnm],
            outputs=[m.outputs[0] for m in members],
            attrs=dict(axis=3, sizes=sizes),
            name=f"{members[0].name}_mscs"))
        n_merged += 1

    graph.nodes = new_nodes
    graph.validate()
    return n_merged
