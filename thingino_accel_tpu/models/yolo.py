"""YOLO pre/post-processing, fully on-device.

The reference does letterbox + quantize on the host CPU with stb_image
(``src/mars/mars_yolo_test.c:40-77``) and detection parsing + NMS on the
host too (``:79-130``, ``examples/yolo_detect.cpp:132-227``). Here the
whole pipeline — resize, normalize/quantize, backbone, head decode,
class-aware NMS — is one jitted XLA program: JPEG-decoded frames in,
fixed-shape detection tensors out.

All shapes are static (fixed max detections K) so everything fuses and
batches; NMS is the standard top-k + IoU-matrix greedy formulation
instead of the reference's O(n^2) pointer-chasing loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# COCO class names (shared vocabulary with the reference's
# ``mars_yolo_test.c:21-35`` CLASS_NAMES table).
COCO_CLASSES = (
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep",
    "cow", "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "couch", "potted plant", "bed", "dining table", "toilet", "tv",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
)

# YOLOv5 anchors / strides (``examples/yolo_detect.cpp:176-181``).
YOLOV5_ANCHORS = np.array([
    [[10, 13], [16, 30], [33, 23]],
    [[30, 61], [62, 45], [59, 119]],
    [[116, 90], [156, 198], [373, 326]],
], dtype=np.float32)
YOLOV5_STRIDES = (8, 16, 32)


# ---------------------------------------------------------------------------
# Preprocessing (device-side letterbox; reference: mars_yolo_test.c:40-77)
# ---------------------------------------------------------------------------


def letterbox_uint8(
    frames: jax.Array,            # [B, H, W, 3] uint8
    target: Tuple[int, int] = (640, 640),
    pad_value: int = 114,
) -> jax.Array:
    """Aspect-preserving resize + center pad, on device, batched.

    Matches the reference letterbox: ``scale = min(tw/w, th/h)``, bilinear
    resize, gray fill (114) (``examples/yolo_detect.cpp:100-127``). Input
    frame size is static per jit specialization — the serving path for a
    fixed camera. Returns uint8 [B, th, tw, 3].
    """
    b, h, w, c = frames.shape
    th, tw = target
    scale = min(tw / w, th / h)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) == (h, w):
        resized = frames          # already target-scaled: skip the
    else:                         # f32 resize round-trip entirely
        resized = jax.image.resize(
            frames.astype(jnp.float32), (b, nh, nw, c), method="bilinear")
        resized = jnp.clip(jnp.round(resized), 0, 255).astype(jnp.uint8)
    if (nh, nw) == (th, tw):
        return resized
    py, px = (th - nh) // 2, (tw - nw) // 2
    return jnp.pad(
        resized,
        ((0, 0), (py, th - nh - py), (px, tw - nw - px), (0, 0)),
        constant_values=np.uint8(pad_value))


def nv12_to_rgb(nv12: jax.Array, height: int, width: int) -> jax.Array:
    """NV12 (camera-native planar YUV420, the reference's tensor format
    for camera frames — ``include/nna_types.h`` NV12) -> RGB uint8, on
    device, batched.

    Input: [B, H*3/2, W] uint8 (Y plane then interleaved UV half-res
    plane, the V4L2 NV12 layout). BT.601 full-range conversion.
    """
    b = nv12.shape[0]
    y = nv12[:, :height, :].astype(jnp.float32)
    uv = nv12[:, height:, :].reshape(b, height // 2, width // 2, 2)
    u = uv[..., 0].astype(jnp.float32) - 128.0
    v = uv[..., 1].astype(jnp.float32) - 128.0
    # upsample chroma to full res (nearest)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    bch = y + 1.772 * u
    rgb = jnp.stack([r, g, bch], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def quantize_input_int8(frames_u8: jax.Array, dtype=jnp.int8) -> jax.Array:
    """uint8 [0,255] -> int8 centered: the reference feeds ``pixel - 128``
    (``src/mars/mars_yolo_test.c:64-71``).

    ``dtype=jnp.bfloat16`` emits the SAME integer values stored as bf16
    (exact: |v| <= 128 < 2^8) — for the bf16 fast tier this skips the
    thin-channel int8 materialization between the quantize and the
    engine's input DEQUANT (which accepts any real dtype)."""
    return (frames_u8.astype(jnp.int32) - 128).astype(dtype)


def normalize_input_f32(frames_u8: jax.Array) -> jax.Array:
    """uint8 -> f32 in [0,1] (the standard YOLOv5 f32 input)."""
    return frames_u8.astype(jnp.float32) * jnp.float32(1.0 / 255.0)


def space_to_depth_frames(frames: np.ndarray) -> np.ndarray:
    """Host-side 2x2 space-to-depth: ``[B, H, W, C]`` ->
    ``[B, H/2, W/2, 4C]``, block pixels flattened row-major into
    channels (phase-major: channel ``(p*2+q)*C + c``).

    The ingest order for a graph rewritten by
    ``ir.passes.stem_space_to_depth`` — a fixed camera feed writes this
    during the H2D DMA at no extra cost (same bytes, block-major
    order). Pair with ``runtime.ingest.ingest`` for the batch-minor
    device layout."""
    b, h, w, c = frames.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out = frames.reshape(b, h // 2, 2, w // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    return np.ascontiguousarray(out)


def space_to_depth(frames: jax.Array) -> jax.Array:
    """Device-side 2x2 space-to-depth (same channel order as
    :func:`space_to_depth_frames`) — for dynamic-size feeds where the
    letterbox runs on device first. Costs an on-device relayout; the
    s2d stem's win comes from doing this in the H2D write instead."""
    b, h, w, c = frames.shape
    return frames.reshape(b, h // 2, 2, w // 2, 2, c) \
        .transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def find_detect_outputs(graph) -> list:
    """Locate the three raw detect-conv outputs in an imported YOLO graph.

    The bundled `.mars` YOLO files carry a broken in-file decode subgraph
    (skipped Split/Pow ops, zero-shaped tensors — see
    ``ir.graph._materialize_dangling``); the three 1x1 detect convs
    (``model.24.m.{0,1,2}`` weights) are intact. Returns their output
    names sorted by descending spatial size (stride 8, 16, 32).
    """
    outs = []
    for node in graph.nodes:
        if node.op != "CONV2D" or len(node.inputs) < 2:
            continue
        wname = node.inputs[1]
        t = graph.tensors.get(node.outputs[0])
        if t is None or len(t.shape) != 4 or 0 in t.shape:
            continue
        # detect convs: 1x1, linear, output channels divisible by 85-ish
        k = node.attrs.get("kernel", (0, 0))
        if k != (1, 1):
            continue
        if ".24." in wname or wname.startswith("model.24"):
            outs.append((t.shape[1], node.outputs[0]))
    outs.sort(reverse=True)
    return [name for _, name in outs]


# ---------------------------------------------------------------------------
# Head decode
# ---------------------------------------------------------------------------


def decode_head_level(
    feat: jax.Array,              # [B, H, W, A*(5+NC)] f32 raw logits
    anchors: jax.Array,           # [A, 2] f32 (pixels)
    stride: int,
    num_classes: int = 80,
) -> jax.Array:
    """YOLOv5 anchor decode for one pyramid level -> [B, H*W*A, 5+NC].

    xy = (2σ(t)-0.5 + grid)*stride ; wh = (2σ(t))^2 * anchor ;
    obj/cls = σ(t). This is the decode the reference leaves to a TODO in
    its .mgk path (``examples/yolo_detect.cpp:183-206``) and that its
    .mars graphs half-express with ops the runtime skips.
    """
    b, h, w, ch = feat.shape
    a = anchors.shape[0]
    nc = num_classes
    x = feat.reshape(b, h, w, a, 5 + nc)
    sig = jax.nn.sigmoid(x)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]      # [H, W, 1, 2]
    xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * jnp.float32(stride)
    wh = jnp.square(sig[..., 2:4] * 2.0) * anchors[None, None, :, :]
    out = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
    return out.reshape(b, h * w * a, 5 + nc)


def decode_heads(
    feats: Sequence[jax.Array],
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
    num_classes: int = 80,
) -> jax.Array:
    """Decode all pyramid levels and concat -> [B, N, 5+NC]."""
    outs = [
        decode_head_level(f, jnp.asarray(anchors[i]), strides[i], num_classes)
        for i, f in enumerate(feats)
    ]
    return jnp.concatenate(outs, axis=1)


def _best_class(cls_logits: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Best class logit + index in ONE reduction for int8 heads: pack
    (logit, 255-idx) into int16 so the max carries the first-occurrence
    argmax in its low byte — halves the pass over the class dim. The
    packing assumes the logit fits a signed byte, so it is gated to
    int8 specifically (uint8/int16 heads would overflow the int16
    product silently); everything else takes two reductions."""
    if cls_logits.dtype == jnp.int8 and cls_logits.shape[-1] <= 256:
        iota = jax.lax.broadcasted_iota(
            jnp.int16, cls_logits.shape, cls_logits.ndim - 1)
        comb = cls_logits.astype(jnp.int16) * 256 + (255 - iota)
        cmax = jnp.max(comb, axis=-1)
        return ((cmax >> 8).astype(jnp.float32),
                (255 - (cmax & 255)).astype(jnp.int32))
    return (jnp.max(cls_logits, axis=-1).astype(jnp.float32),
            jnp.argmax(cls_logits, axis=-1).astype(jnp.int32))


def decode_and_parse(
    feats: Sequence[jax.Array],
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
    num_classes: int = 80,
    scales: Optional[Sequence[float]] = None,
    defer_classes: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused head decode + parse: raw logit feature maps ->
    (boxes_xywh [B,N,4], conf [B,N], classes [B,N]).

    Equivalent to decode_heads + parse_predictions(already_sigmoid=True)
    but computes sigmoid only where needed: xy/wh/obj channels, and a
    single sigmoid of the max class logit (sigmoid is monotonic, so
    max(sigmoid(x)) == sigmoid(max(x))) — skipping the elementwise
    sigmoid over all `num_classes` channels of every anchor, the bulk of
    the postprocess HBM traffic.

    ``scales``: per-head dequant scales for int8 heads — the max/argmax
    run on the raw int8 values (monotonic for scale > 0) and only the
    handful of consumed channels are dequantized, so the head tensors
    cross HBM once at 1 byte/element instead of being materialized f32.

    ``defer_classes``: skip the full-N argmax; the third return value is
    the raw class-logit tensor [B, N, NC] (original head dtype) for
    :func:`nms_fixed`/:func:`nms_batched` ``class_logits=`` — argmax
    then runs on the pre-NMS survivors only. Exact: argmax is invariant
    under the positive dequant scale, and every candidate whose class
    is ever read survives the top-k.
    """
    all_boxes, all_conf, all_cls = [], [], []
    for i, feat in enumerate(feats):
        b, h, w, ch = feat.shape
        a = anchors.shape[1]
        sc = (jnp.float32(scales[i])
              if scales is not None and scales[i] is not None else None)
        # per-anchor block from the channel count: 5+num_classes for
        # plain heads, the padded lane-aligned width for
        # ir.passes.pad_detect_heads heads (pad channels are zero
        # weights — never read; the aligned reshape is a free bitcast).
        # Padded widths are always lane multiples (128), so anything
        # else with ch != a*(5+nc) is a num_classes mismatch — fail
        # loudly rather than decode misaligned channel groups.
        assert ch == a * (5 + num_classes) or (
            ch % a == 0 and ch // a >= 5 + num_classes
            and (ch // a) % 128 == 0), (ch, a, num_classes)
        x = feat.reshape(b, h, w, a, ch // a)
        x5 = x[..., 0:5].astype(jnp.float32)
        if sc is not None:
            x5 = x5 * sc
        sig5 = jax.nn.sigmoid(x5)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]
        xy = (sig5[..., 0:2] * 2.0 - 0.5 + grid) * jnp.float32(strides[i])
        wh = jnp.square(sig5[..., 2:4] * 2.0) * \
            jnp.asarray(anchors[i], jnp.float32)[None, None, :, :]
        obj = sig5[..., 4]
        cls_logits = x[..., 5:5 + num_classes]   # excludes pad channels
        n = h * w * a
        if defer_classes:
            best_logit = jnp.max(cls_logits, axis=-1).astype(jnp.float32)
            cls_entry = cls_logits.reshape(b, n, num_classes)
        else:
            best_logit, cls = _best_class(cls_logits)
            cls_entry = cls.reshape(b, n)
        if sc is not None:
            best_logit = best_logit * sc
        conf = obj * jax.nn.sigmoid(best_logit)
        all_boxes.append(jnp.concatenate([xy, wh], -1).reshape(b, n, 4))
        all_conf.append(conf.reshape(b, n))
        all_cls.append(cls_entry)
    return (jnp.concatenate(all_boxes, 1), jnp.concatenate(all_conf, 1),
            jnp.concatenate(all_cls, 1))


def decode_and_parse_split(
    feat_groups: Sequence[Sequence[jax.Array]],   # [level][anchor] [B,H,W,5+NC]
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
    num_classes: int = 80,
    scales: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`decode_and_parse` for per-anchor split heads
    (``ir.passes.split_detect_heads``): each level supplies A tensors
    of ``5+NC`` channels, consumed with plain channel slices — no
    lane-splitting ``(A, 5+NC)`` reshape, no relayout copy. Output
    ordering matches :func:`decode_and_parse` (anchor-fastest)."""
    all_boxes, all_conf, all_cls = [], [], []
    for i, group in enumerate(feat_groups):
        sc = (jnp.float32(scales[i])
              if scales is not None and scales[i] is not None else None)
        anc_b, anc_c, anc_k = [], [], []
        for anc, feat in enumerate(group):
            b, h, w, ch = feat.shape
            gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            grid = jnp.stack([gx, gy], axis=-1)
            x5 = feat[..., 0:5].astype(jnp.float32)
            if sc is not None:
                x5 = x5 * sc
            sig5 = jax.nn.sigmoid(x5)
            xy = (sig5[..., 0:2] * 2.0 - 0.5 + grid) * \
                jnp.float32(strides[i])
            wh = jnp.square(sig5[..., 2:4] * 2.0) * \
                jnp.asarray(anchors[i][anc], jnp.float32)
            obj = sig5[..., 4]
            cls_logits = feat[..., 5:5 + num_classes]
            best_logit, acls = _best_class(cls_logits)
            if sc is not None:
                best_logit = best_logit * sc
            conf = obj * jax.nn.sigmoid(best_logit)
            hw = h * w
            anc_b.append(jnp.concatenate([xy, wh], -1).reshape(b, hw, 4))
            anc_c.append(conf.reshape(b, hw))
            anc_k.append(acls.reshape(b, hw))
        n = hw * len(group)
        all_boxes.append(jnp.stack(anc_b, axis=2).reshape(b, n, 4))
        all_conf.append(jnp.stack(anc_c, axis=2).reshape(b, n))
        all_cls.append(jnp.stack(anc_k, axis=2).reshape(b, n))
    return (jnp.concatenate(all_boxes, 1), jnp.concatenate(all_conf, 1),
            jnp.concatenate(all_cls, 1))


def decode_and_parse_semantic(
    feats: Sequence[jax.Array],     # per level [B,H,W,A*(5+NC)] permuted
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
    num_classes: int = 80,
    scales: Optional[Sequence[float]] = None,
    class_reduce: str = "reshape",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`decode_and_parse` for semantic-major / anchor-minor heads
    (``ir.passes.semantic_detect_heads``): channel layout
    ``[x(A), y(A), w(A), h(A), obj(A), cls0(A), cls1(A), ...]``.

    Every consumed quantity is a CONTIGUOUS channel slice of width A,
    and the class max/argmax is a fused compare/select chain over the
    per-class slices — the program contains no lane-splitting
    ``(A, 5+NC)`` reshape of the full head, hence none of the
    whole-head relayout copies that reshape forces
    (``copy.122/124/128``, ~15 us/frame at v5n@640 b128;
    docs/KERNELS.md round-5). Values and output ordering are
    bit-identical to :func:`decode_and_parse` on the unpermuted heads:
    the permutation only renames channels, the chain keeps argmax's
    first-maximum tie-break, and the box/conf arithmetic is the same
    f32 expression tree."""
    all_boxes, all_conf, all_cls = [], [], []
    for i, feat in enumerate(feats):
        b, h, w, ch = feat.shape
        a = anchors.shape[1]
        assert ch == a * (5 + num_classes), (ch, a, num_classes)
        sc = (jnp.float32(scales[i])
              if scales is not None and scales[i] is not None else None)

        def grp(k):
            return feat[..., k * a:(k + 1) * a]

        def sig(k):
            v = grp(k).astype(jnp.float32)
            if sc is not None:
                v = v * sc
            return jax.nn.sigmoid(v)

        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[..., None]
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[..., None]
        st = jnp.float32(strides[i])
        anc = np.asarray(anchors[i], np.float32)         # [A, 2]
        xy_x = (sig(0) * 2.0 - 0.5 + gx) * st            # [B,H,W,A]
        xy_y = (sig(1) * 2.0 - 0.5 + gy) * st
        wh_w = jnp.square(sig(2) * 2.0) * anc[None, None, :, 0]
        wh_h = jnp.square(sig(3) * 2.0) * anc[None, None, :, 1]
        obj = sig(4)

        # class max + first-max argmax (raw dtype: monotone under
        # sc > 0). Two formulations, same values:
        # - "reshape": view the class block as [..., NC, A] and reduce
        #   over NC — a REDUCTION consumes the strided view without
        #   materializing a relayout (unlike the packed decode's
        #   elementwise (A, 85) reshape), and compiles compactly;
        # - "chain": NC-step compare/select over contiguous A-slices —
        #   zero reshapes of any kind, but the unrolled chain compiles
        #   slowly on TPU at NC=80.
        if class_reduce == "chain":
            best = grp(5)
            cls = jnp.zeros(best.shape, jnp.int32)
            for k in range(1, num_classes):
                s = grp(5 + k)
                upd = s > best
                best = jnp.where(upd, s, best)
                cls = jnp.where(upd, jnp.int32(k), cls)
        else:
            cl = feat[..., 5 * a:].reshape(b, h, w, num_classes, a)
            best = jnp.max(cl, axis=-2)
            cls = jnp.argmax(cl, axis=-2).astype(jnp.int32)
        best = best.astype(jnp.float32)
        if sc is not None:
            best = best * sc
        conf = obj * jax.nn.sigmoid(best)

        n = h * w * a
        boxes = jnp.stack([xy_x, xy_y, wh_w, wh_h], axis=-1)
        all_boxes.append(boxes.reshape(b, n, 4))
        all_conf.append(conf.reshape(b, n))
        all_cls.append(cls.reshape(b, n))
    return (jnp.concatenate(all_boxes, 1), jnp.concatenate(all_conf, 1),
            jnp.concatenate(all_cls, 1))


def _masked_best_class(
    feat: jax.Array, a: int, blk: int, num_classes: int,
) -> Tuple[jax.Array, jax.Array]:
    """Per-anchor class (max, argmax) over an UNRESHAPED head tensor
    ``[B,H,W,A*blk]``: one variadic ``lax.reduce`` per anchor group over
    the channel axis, with non-class / other-group channels masked to
    -inf. The reduces are siblings over the same operand in its native
    channel-minor layout — XLA fuses them into one multi-output pass, so
    the head is read once and never relaid out. Tie-break matches
    ``jnp.argmax`` (first maximum): the (max, min-index-on-ties) reducer
    is associative and commutative, so any reduction order gives the
    first-occurrence index. Returns ([B,H,W,A] best, [B,H,W,A] cls)."""
    if feat.dtype == jnp.int8:
        vals = feat.astype(jnp.int32)
        ninf = jnp.int32(np.iinfo(np.int32).min)
    else:
        vals = feat.astype(jnp.float32)
        ninf = jnp.float32(-np.inf)
    ch = feat.shape[-1]
    cidx = np.arange(ch)
    grp_of = cidx // blk
    is_cls = (cidx % blk) >= 5
    local = np.where(is_cls, cidx - grp_of * blk - 5, 0)
    idx_const = jnp.asarray(local, jnp.int32)

    def amax2(x, y):
        v1, i1 = x
        v2, i2 = y
        pick = (v1 > v2) | ((v1 == v2) & (i1 <= i2))
        return (jnp.where(pick, v1, v2), jnp.where(pick, i1, i2))

    bests, clss = [], []
    for gi in range(a):
        mask = jnp.asarray(is_cls & (grp_of == gi))
        mvals = jnp.where(mask, vals, ninf)
        best, am = jax.lax.reduce(
            (mvals, jnp.broadcast_to(idx_const, mvals.shape)),
            (ninf, jnp.int32(0)), amax2, (feat.ndim - 1,))
        bests.append(best)
        clss.append(am)
    return jnp.stack(bests, axis=-1), jnp.stack(clss, axis=-1)


def decode_and_parse_mm(
    feats: Sequence[jax.Array],
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
    num_classes: int = 80,
    scales: Optional[Sequence[float]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`decode_and_parse` without the lane-splitting ``(A, 5+NC)``
    reshape of the full head — the reshape is what forces XLA to relay
    out the whole head tensor (copy.122/124, ~12.6 us/frame at v5n@640
    b128; docs/KERNELS.md round-5). Two structural changes:

    - box/obj channels come from three CONTIGUOUS 5-wide slices
      (``feat[..., g*blk : g*blk+5]``) — a slice's relayout cost is
      proportional to its small OUTPUT, not to the 255-channel head;
    - the class max/argmax is :func:`_masked_best_class`: one masked
      variadic reduce per anchor group over the head in its NATIVE
      layout (read once, fused siblings, nothing written back at full
      size).

    Outputs are bit-identical to :func:`decode_and_parse`: the box/conf
    arithmetic is the same f32 expression tree and the reduce keeps
    ``jnp.argmax``'s first-maximum tie-break."""
    all_boxes, all_conf, all_cls = [], [], []
    for i, feat in enumerate(feats):
        b, h, w, ch = feat.shape
        a = anchors.shape[1]
        assert ch == a * (5 + num_classes), (ch, a, num_classes)
        blk = 5 + num_classes
        sc = (jnp.float32(scales[i])
              if scales is not None and scales[i] is not None else None)
        x5 = jnp.stack(
            [feat[..., g * blk:g * blk + 5] for g in range(a)], axis=3)
        x5 = x5.astype(jnp.float32)
        if sc is not None:
            x5 = x5 * sc
        sig5 = jax.nn.sigmoid(x5)
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]
        xy = (sig5[..., 0:2] * 2.0 - 0.5 + grid) * jnp.float32(strides[i])
        wh = jnp.square(sig5[..., 2:4] * 2.0) * \
            jnp.asarray(anchors[i], jnp.float32)[None, None, :, :]
        obj = sig5[..., 4]
        best_logit, cls = _masked_best_class(feat, a, blk, num_classes)
        best_logit = best_logit.astype(jnp.float32)
        if sc is not None:
            best_logit = best_logit * sc
        conf = obj * jax.nn.sigmoid(best_logit)
        n = h * w * a
        all_boxes.append(jnp.concatenate([xy, wh], -1).reshape(b, n, 4))
        all_conf.append(conf.reshape(b, n))
        all_cls.append(cls.reshape(b, n))
    return (jnp.concatenate(all_boxes, 1), jnp.concatenate(all_conf, 1),
            jnp.concatenate(all_cls, 1))


def decode_anchor_free(
    box_feats: Sequence[jax.Array],   # per level [B, H, W, 4*reg_max]
    cls_feats: Sequence[jax.Array],   # per level [B, H, W, NC]
    strides: Sequence[int] = YOLOV5_STRIDES,
    reg_max: int = 16,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Anchor-free DFL decode (yolov5u/yolov8-style heads, e.g. the
    bundled ``yolov5nu.mars``): box head emits 4*reg_max distribution
    logits per cell -> softmax expectation = ltrb distances in stride
    units from the cell center; class head is sigmoid scores (no
    objectness). Returns (boxes_xywh [B,N,4], conf [B,N], classes [B,N]).
    """
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    all_b, all_s, all_c = [], [], []
    for bf, cf, stride in zip(box_feats, cls_feats, strides):
        b, h, w, _ = bf.shape
        x = bf.astype(jnp.float32).reshape(b, h, w, 4, reg_max)
        dist = jnp.sum(jax.nn.softmax(x, axis=-1) * bins, axis=-1)  # ltrb
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        l, t, r, bt = (dist[..., 0], dist[..., 1], dist[..., 2],
                       dist[..., 3])
        x0 = (gx - l) * stride
        y0 = (gy - t) * stride
        x1 = (gx + r) * stride
        y1 = (gy + bt) * stride
        boxes = jnp.stack([(x0 + x1) / 2, (y0 + y1) / 2,
                           x1 - x0, y1 - y0], axis=-1)
        cls_logits = cf.astype(jnp.float32)
        conf = jax.nn.sigmoid(jnp.max(cls_logits, axis=-1))
        cls = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
        n = h * w
        all_b.append(boxes.reshape(b, n, 4))
        all_s.append(conf.reshape(b, n))
        all_c.append(cls.reshape(b, n))
    return (jnp.concatenate(all_b, 1), jnp.concatenate(all_s, 1),
            jnp.concatenate(all_c, 1))


def make_anchor_tables(
    shapes: Sequence[Tuple[int, int]],
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
) -> Dict[str, np.ndarray]:
    """Flat per-candidate lookup tables (grid x/y, anchor w/h, stride)
    over all pyramid levels, in head-concat order. ~100 KB of constants
    that let the decode run on top-k survivors only."""
    gx, gy, aw, ah, st = [], [], [], [], []
    for (h, w), anc, s in zip(shapes, anchors, strides):
        a = anc.shape[0]
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        for arrs, vals in ((gx, np.broadcast_to(xx[..., None], (h, w, a))),
                           (gy, np.broadcast_to(yy[..., None], (h, w, a)))):
            arrs.append(vals.reshape(-1).astype(np.float32))
        aw.append(np.broadcast_to(anc[None, None, :, 0],
                                  (h, w, a)).reshape(-1).astype(np.float32))
        ah.append(np.broadcast_to(anc[None, None, :, 1],
                                  (h, w, a)).reshape(-1).astype(np.float32))
        st.append(np.full(h * w * a, s, np.float32))
    return {k: np.concatenate(v) for k, v in
            (("gx", gx), ("gy", gy), ("aw", aw), ("ah", ah), ("st", st))}


def detect_postprocess_topk(
    feats: Sequence[jax.Array],       # per-level [B, H, W, A*(5+NC)]
    scales: Optional[Sequence[float]] = None,
    anchors: np.ndarray = YOLOV5_ANCHORS,
    strides: Sequence[int] = YOLOV5_STRIDES,
    num_classes: int = 80,
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_dets: int = 100,
    pre_nms: int = 256,
) -> Detections:
    """Score -> top-k -> decode-survivors-only -> NMS.

    The full decode computes sigmoid/anchor math for all 25200
    candidates; here only confidences (obj x best-class, both monotone
    in the raw int8 logits) touch every candidate, the box math runs on
    the ``pre_nms`` survivors via gathered anchor tables. One 1-byte
    pass over the heads + O(pre_nms) everything else."""
    a = anchors.shape[1]
    flats, confs, clss = [], [], []
    for i, feat in enumerate(feats):
        b, h, w, ch = feat.shape
        # derive the per-anchor block from the channel count (like
        # decode_and_parse) so lane-padded heads (pad_detect_heads)
        # decode correctly; pad channels past 5+num_classes are never
        # read
        assert ch == a * (5 + num_classes) or (
            ch % a == 0 and ch // a >= 5 + num_classes
            and (ch // a) % 128 == 0), (ch, a, num_classes)
        x = feat.reshape(b, h * w * a, ch // a)
        # per-head None entries mean a float head (mixed int8/float
        # graphs, e.g. make_sharded_detector) -> scale 1
        sc = (jnp.float32(scales[i])
              if scales is not None and scales[i] is not None
              else jnp.float32(1))
        obj = jax.nn.sigmoid(x[..., 4].astype(jnp.float32) * sc)
        best = jnp.max(x[..., 5:5 + num_classes],
                       axis=-1).astype(jnp.float32) * sc
        confs.append(obj * jax.nn.sigmoid(best))
        clss.append(jnp.argmax(x[..., 5:5 + num_classes],
                               axis=-1).astype(jnp.int32))
        flats.append(x[..., :4])
    conf = jnp.concatenate(confs, axis=1)            # [B, N]
    cls = jnp.concatenate(clss, axis=1)
    raw4 = jnp.concatenate(flats, axis=1)            # [B, N, 4] raw logits
    n = conf.shape[1]
    k = min(pre_nms, n)

    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    tab = make_anchor_tables(shapes, anchors, strides)
    gx, gy = jnp.asarray(tab["gx"]), jnp.asarray(tab["gy"])
    aw, ah = jnp.asarray(tab["aw"]), jnp.asarray(tab["ah"])
    st = jnp.asarray(tab["st"])
    lvl_scale = None
    if scales is not None:
        lvl_scale = jnp.concatenate([
            jnp.full((f.shape[1] * f.shape[2] * a,),
                     jnp.float32(s if s is not None else 1.0))
            for f, s in zip(feats, scales)])

    def one(conf_i, cls_i, raw_i):
        masked = jnp.where(conf_i >= conf_thresh, conf_i, 0.0)
        top, idx = top_k_grouped(masked, k)
        r = raw_i[idx].astype(jnp.float32)           # [k, 4]
        if lvl_scale is not None:
            r = r * lvl_scale[idx][:, None]
        sig = jax.nn.sigmoid(r)
        xy_x = (sig[:, 0] * 2.0 - 0.5 + gx[idx]) * st[idx]
        xy_y = (sig[:, 1] * 2.0 - 0.5 + gy[idx]) * st[idx]
        wh_w = jnp.square(sig[:, 2] * 2.0) * aw[idx]
        wh_h = jnp.square(sig[:, 3] * 2.0) * ah[idx]
        boxes = jnp.stack([xy_x, xy_y, wh_w, wh_h], axis=-1)
        return nms_fixed(boxes, top, cls_i[idx],
                         conf_thresh=conf_thresh, iou_thresh=iou_thresh,
                         max_dets=max_dets, pre_nms=k)

    return jax.vmap(one)(conf, cls, raw4)


def parse_predictions(
    pred: jax.Array,              # [B, N, 5+NC] int8 or f32
    scale: float = 1.0,
    already_sigmoid: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """[B,N,5+NC] -> (boxes_xywh [B,N,4], scores [B,N], classes [B,N]).

    Replicates the reference parse (``src/mars/mars_yolo_test.c:80-104``):
    obj = σ(p4*s); cls = argmax raw class logits; conf = obj * σ(best).
    ``already_sigmoid`` skips the σ for decoded-head outputs.
    """
    p = pred.astype(jnp.float32) * jnp.float32(scale)
    boxes = p[..., 0:4]
    if already_sigmoid:
        obj = p[..., 4]
        cls_scores = p[..., 5:]
        best = jnp.max(cls_scores, axis=-1)
        conf = obj * best
    else:
        obj = jax.nn.sigmoid(p[..., 4])
        cls_logits = p[..., 5:]
        best = jnp.max(cls_logits, axis=-1)
        conf = obj * jax.nn.sigmoid(best)
    classes = jnp.argmax(p[..., 5:], axis=-1).astype(jnp.int32)
    return boxes, conf, classes


# ---------------------------------------------------------------------------
# NMS (fixed shape, on device)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Detections:
    """Fixed-shape detection output: entries beyond ``num`` are padding.
    Registered as a pytree so it flows through jit/vmap."""

    boxes: jax.Array      # [B, K, 4] xyxy, input-image pixels
    scores: jax.Array     # [B, K]
    classes: jax.Array    # [B, K] int32
    valid: jax.Array      # [B, K] bool

    @property
    def num(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)


def _xywh_to_xyxy(b: jax.Array) -> jax.Array:
    xy, wh = b[..., :2], b[..., 2:4]
    half = wh * 0.5
    return jnp.concatenate([xy - half, xy + half], axis=-1)


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """Pairwise IoU of [K,4] xyxy boxes -> [K,K] (``yolo_detect.cpp:136-148``
    semantics incl. the +1e-6 denominator guard)."""
    a = boxes[:, None, :]
    b = boxes[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0.0), axis=-1)
    area = jnp.prod(jnp.maximum(boxes[:, 2:] - boxes[:, :2], 0.0), axis=-1)
    union = area[:, None] + area[None, :] - inter
    return inter / (union + 1e-6)


def top_k_grouped(scores: jax.Array, k: int, group: int = 8):
    """Exact top-k via a group-max prefilter, ~4x faster than
    ``lax.top_k`` for large N on TPU (the TopK custom call costs
    ~10 us/frame per 128 kept over 25k candidates; a VPU group-max is
    nearly free and shrinks the sort input ``group``-fold).

    Exactness: every element of the true top-k lives in a group whose
    max is >= the k-th largest value, and at most k groups are needed
    to cover k elements — so the top-k groups by group-max contain the
    true top-k elements; a second small top-k over those k*group
    candidates recovers them. Tie handling at the boundary matches
    ``lax.top_k``'s arbitrary-among-equals behavior (group-max ties are
    broken by lowest group index).

    ``scores``: [N] (vmap for batches). Returns (values, indices).
    """
    n = scores.shape[-1]
    if k >= n or k > 512:
        return jax.lax.top_k(scores, min(k, n))
    npad = ((n + group - 1) // group) * group
    s = jnp.pad(scores, (0, npad - n), constant_values=-jnp.inf) \
        if npad != n else scores
    q = s.reshape(npad // group, group)
    gv = jnp.max(q, axis=-1)
    _, sel = jax.lax.top_k(gv, min(k, q.shape[0]))
    cand = q[sel].reshape(-1)              # [k*group]
    cidx = (sel[:, None] * group + jnp.arange(group)[None, :]).reshape(-1)
    v, j = jax.lax.top_k(cand, k)
    return v, cidx[j]


def nms_fixed(
    boxes_xywh: jax.Array,        # [N, 4] center format
    scores: jax.Array,            # [N]
    classes: jax.Array,           # [N] int32
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_dets: int = 100,
    class_aware: bool = True,
    pre_nms: int = 256,
    suppress_impl: str = "reduce",
    unroll: int = 1,
    classes_are_logits: bool = False,
    topk_group: int = 8,
) -> Detections:
    """Greedy class-aware NMS with static shapes (single image).

    Suppression runs over the top ``pre_nms`` candidates above
    ``conf_thresh`` (NOT just the top ``max_dets`` — a crowded scene's
    survivors can rank below suppressed higher-scored boxes, so the
    pool must be deeper than the output; the reference suppresses over
    all N, ``src/mars/mars_yolo_test.c:107-130``). The greedy rule is
    evaluated as a fixpoint over the score-sorted K×K IoU relation:
    keep[j] iff no kept higher-scored i overlaps j — converges in
    suppression-chain-depth (<5) iterations of cheap vector ops.
    O(K^2) with K=pre_nms, entirely on device; batch via vmap.

    ``suppress_impl``: the fixpoint step — ``"reduce"`` is the VPU
    and-reduce over the [K,K] relation; ``"matvec"`` computes the same
    hit counts as a 0/1 matvec on the MXU (exact: counts <= K-1 fit an
    f32 accumulator). ``unroll`` applies the step N times per while
    iteration, amortizing the loop-carry sync; convergence detection
    stays exact because ``up`` is strictly upper-triangular, so any
    apparent unroll-cycle is already the fixpoint (keep[j] depends only
    on keep[<j]; induction from index 0 collapses cycles to fixpoints).

    ``classes_are_logits``: ``classes`` is the raw [N, NC] class-logit
    tensor (``decode_and_parse(defer_classes=True)``); the argmax runs
    on the gathered top-k rows only.
    """
    k = min(max(pre_nms, max_dets), scores.shape[0])
    masked = jnp.where(scores >= conf_thresh, scores, 0.0)
    top_scores, idx = top_k_grouped(masked, k, group=topk_group)
    top_boxes = _xywh_to_xyxy(boxes_xywh[idx])
    if classes_are_logits:
        top_classes = jnp.argmax(classes[idx], axis=-1).astype(jnp.int32)
    else:
        top_classes = classes[idx]

    iou = _iou_matrix(top_boxes)
    if class_aware:
        same = top_classes[:, None] == top_classes[None, :]
        iou = jnp.where(same, iou, 0.0)

    overlap = iou > iou_thresh
    idx_r = jnp.arange(k)
    up = overlap & (idx_r[:, None] < idx_r[None, :])  # i suppresses j

    if suppress_impl == "matvec":
        up_bf = up.astype(jnp.bfloat16)

        def step(keep):
            hits = jax.lax.dot_general(
                keep.astype(jnp.bfloat16)[None, :], up_bf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0]
            return hits == 0.0
    else:
        def step(keep):
            return ~jnp.any(up & keep[:, None], axis=0)

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    def body(state):
        keep, _, it = state
        new = keep
        for _ in range(unroll):
            new = step(new)
        return new, jnp.any(new != keep), it + unroll

    keep, _, _ = jax.lax.while_loop(
        cond, body, (jnp.ones((k,), bool), jnp.array(True), 0))
    valid = keep & (top_scores > 0.0)
    # trim the surviving pool to the fixed max_dets output (survivors
    # are score-sorted, so a top_k over the masked scores preserves
    # the reference's output order)
    if k > max_dets:
        sel_scores, sel = jax.lax.top_k(
            jnp.where(valid, top_scores, 0.0), max_dets)
        top_boxes = top_boxes[sel]
        top_scores = sel_scores
        top_classes = top_classes[sel]
        valid = valid[sel] & (sel_scores > 0.0)
    elif k < max_dets:  # pad to the fixed output size
        pad = max_dets - k
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, pad))
        top_classes = jnp.pad(top_classes, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return Detections(
        boxes=top_boxes, scores=top_scores, classes=top_classes, valid=valid)


def nms_batched(
    boxes: jax.Array, scores: jax.Array, classes: jax.Array, **kw
) -> Detections:
    """vmap of :func:`nms_fixed` over the batch dim."""
    fn = partial(nms_fixed, **kw)
    return jax.vmap(fn)(boxes, scores, classes)


def scale_boxes_to_original(
    boxes_xyxy: jax.Array,
    orig_hw: Tuple[int, int],
    letterboxed_hw: Tuple[int, int] = (640, 640),
) -> jax.Array:
    """Undo the letterbox transform (``examples/yolo_detect.cpp:209-227``):
    subtract pad, divide scale, clamp to image bounds."""
    oh, ow = orig_hw
    th, tw = letterboxed_hw
    scale = min(tw / ow, th / oh)
    px = (tw - ow * scale) / 2.0
    py = (th - oh * scale) / 2.0
    shift = jnp.asarray([px, py, px, py], jnp.float32)
    out = (boxes_xyxy - shift) / jnp.float32(scale)
    lim = jnp.asarray([ow - 1, oh - 1, ow - 1, oh - 1], jnp.float32)
    return jnp.clip(out, 0.0, lim)


# ---------------------------------------------------------------------------
# End-to-end pipeline builders
# ---------------------------------------------------------------------------


def build_e2e_mars_pipeline(
    engine,                        # runtime.Engine over a .mars YOLO graph
    frame_hw: Tuple[int, int],
    conf_thresh: float = 0.25,
    iou_thresh: float = 0.45,
    max_dets: int = 100,
):
    """uint8 frames -> Detections, one jitted program, for `.mars` YOLO
    models whose graph emits [B, N, 85] predictions (the
    ``mars_yolo_test.c`` flow, entirely on device)."""
    in_name = engine.graph.inputs[0]
    out_name = engine.graph.outputs[0]
    in_t = engine.graph.tensors[in_name]
    out_t = engine.graph.tensors[out_name]
    target = (in_t.shape[1], in_t.shape[2])
    is_int8 = np.issubdtype(in_t.dtype, np.signedinteger)
    out_scale = out_t.quant.scale
    fn = engine._fn  # the traced graph body (jit applied around the whole)
    params = engine.params

    def pipeline(frames_u8: jax.Array) -> Detections:
        lb = letterbox_uint8(frames_u8, target)
        x = quantize_input_int8(lb) if is_int8 else normalize_input_f32(lb)
        preds = fn(params, {in_name: x})[out_name]
        if preds.ndim == 2:
            preds = preds[None]
        boxes, scores, classes = parse_predictions(preds, out_scale)
        dets = nms_batched(
            boxes, scores, classes, conf_thresh=conf_thresh,
            iou_thresh=iou_thresh, max_dets=max_dets)
        return Detections(
            boxes=scale_boxes_to_original(dets.boxes, frame_hw, target),
            scores=dets.scores, classes=dets.classes, valid=dets.valid)

    return jax.jit(pipeline)
