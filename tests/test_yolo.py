"""YOLO pre/post-processing tests: letterbox, decode, NMS vs a numpy
oracle transliterating the reference's host-side logic
(src/mars/mars_yolo_test.c:79-130, examples/yolo_detect.cpp:132-227)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import reference_model
from thingino_accel_tpu.models import yolo


def np_nms_oracle(boxes_xywh, scores, classes, conf_t, iou_t):
    """Reference NMS transliteration: sort by conf desc, suppress same-class
    overlaps (mars_yolo_test.c:107-130)."""
    keep_idx = [i for i in range(len(scores)) if scores[i] >= conf_t]
    keep_idx.sort(key=lambda i: -scores[i])
    out = []
    sup = set()
    for ii, i in enumerate(keep_idx):
        if i in sup:
            continue
        out.append(i)
        for j in keep_idx[ii + 1:]:
            if j in sup or classes[i] != classes[j]:
                continue
            xi, yi, wi, hi = boxes_xywh[i]
            xj, yj, wj, hj = boxes_xywh[j]
            x1 = max(xi - wi / 2, xj - wj / 2)
            y1 = max(yi - hi / 2, yj - hj / 2)
            x2 = min(xi + wi / 2, xj + wj / 2)
            y2 = min(yi + hi / 2, yj + hj / 2)
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            iou = inter / (wi * hi + wj * hj - inter + 1e-6)
            if iou > iou_t:
                sup.add(j)
    return out


def test_nms_matches_oracle(rng):
    n = 200
    boxes = np.stack([
        rng.uniform(50, 590, n), rng.uniform(50, 590, n),
        rng.uniform(10, 120, n), rng.uniform(10, 120, n)], axis=1
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, 5, n).astype(np.int32)

    dets = yolo.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        conf_thresh=0.25, iou_thresh=0.45, max_dets=200)
    got = sorted(
        (round(float(s), 5), int(c))
        for s, c, v in zip(np.asarray(dets.scores), np.asarray(dets.classes),
                           np.asarray(dets.valid)) if v)

    ref_idx = np_nms_oracle(boxes, scores, classes, 0.25, 0.45)
    ref = sorted((round(float(scores[i]), 5), int(classes[i]))
                 for i in ref_idx)
    assert got == ref


def test_nms_suppress_variants_match_oracle(rng):
    """matvec (MXU 0/1 dot) and unrolled fixpoint bodies are exact:
    same survivors as the sequential oracle, incl. a crowded cluster
    with deep suppression chains."""
    n = 300
    # half scattered, half piled into one crowded 100x100 region so
    # suppression chains alternate keep/suppress several levels deep
    boxes = np.stack([
        np.concatenate([rng.uniform(50, 590, n // 2),
                        rng.uniform(280, 380, n - n // 2)]),
        np.concatenate([rng.uniform(50, 590, n // 2),
                        rng.uniform(280, 380, n - n // 2)]),
        rng.uniform(10, 120, n), rng.uniform(10, 120, n)], axis=1
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    classes = rng.integers(0, 3, n).astype(np.int32)

    ref_idx = np_nms_oracle(boxes, scores, classes, 0.25, 0.45)
    ref = sorted((round(float(scores[i]), 5), int(classes[i]))
                 for i in ref_idx)
    for impl in ("reduce", "matvec"):
        for unroll in (1, 2, 3):
            dets = yolo.nms_fixed(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(classes), conf_thresh=0.25, iou_thresh=0.45,
                max_dets=n, suppress_impl=impl, unroll=unroll)
            got = sorted(
                (round(float(s), 5), int(c))
                for s, c, v in zip(np.asarray(dets.scores),
                                   np.asarray(dets.classes),
                                   np.asarray(dets.valid)) if v)
            assert got == ref, (impl, unroll)


def test_defer_classes_matches_full_argmax(rng):
    """decode_and_parse(defer_classes=True) + survivor-only argmax in
    NMS == the full-N argmax path, for float and scaled-int8 heads."""
    for mk, scales in (
        (lambda s: rng.normal(size=s).astype(np.float32) * 2, None),
        (lambda s: rng.integers(-128, 128, s).astype(np.int8), (0.1, 0.2)),
    ):
        feats = [jnp.asarray(mk((2, 8 // (2 ** i), 8 // (2 ** i), 255)))
                 for i in range(2)]
        strides = (8, 16)
        b1, s1, c1 = yolo.decode_and_parse(feats, strides=strides,
                                           scales=scales)
        ref = yolo.nms_batched(b1, s1, c1, conf_thresh=0.1, max_dets=50)
        b2, s2, lg = yolo.decode_and_parse(feats, strides=strides,
                                           scales=scales,
                                           defer_classes=True)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5, atol=1e-6)
        got = yolo.nms_batched(b2, s2, lg, conf_thresh=0.1, max_dets=50,
                               classes_are_logits=True)
        np.testing.assert_array_equal(np.asarray(ref.classes),
                                      np.asarray(got.classes))
        np.testing.assert_array_equal(np.asarray(ref.valid),
                                      np.asarray(got.valid))
        np.testing.assert_allclose(np.asarray(ref.boxes),
                                   np.asarray(got.boxes), rtol=1e-6)


def test_nms_class_aware(rng):
    # two perfectly-overlapping boxes, different classes: both survive
    boxes = np.array([[100, 100, 50, 50], [100, 100, 50, 50]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    classes = np.array([0, 1], np.int32)
    dets = yolo.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(classes), max_dets=10)
    assert int(dets.num) == 2
    # same class: one suppressed
    dets2 = yolo.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                           jnp.asarray(np.zeros(2, np.int32)), max_dets=10)
    assert int(dets2.num) == 1


def test_parse_predictions_matches_reference(rng):
    """parse_predictions == the C parse loop (mars_yolo_test.c:80-104)."""
    n = 50
    pred = rng.integers(-128, 128, (1, n, 85), dtype=np.int8)
    scale = 0.05
    boxes, conf, classes = yolo.parse_predictions(jnp.asarray(pred), scale)
    boxes, conf, classes = map(np.asarray, (boxes, conf, classes))
    for i in range(n):
        p = pred[0, i].astype(np.float32) * np.float32(scale)
        obj = 1 / (1 + np.exp(-p[4]))
        best_c = int(np.argmax(p[5:]))
        best_s = p[5:].max()
        want_conf = obj / (1 + np.exp(-best_s))
        np.testing.assert_allclose(conf[0, i], want_conf, rtol=1e-5)
        assert classes[0, i] == best_c
        np.testing.assert_allclose(boxes[0, i], p[0:4], rtol=1e-5)


def test_decode_and_parse_matches_two_step(rng):
    """Fused decode_and_parse == decode_heads + parse_predictions."""
    feats = [jnp.asarray(rng.normal(size=(2, 4 // (2 ** i), 4 // (2 ** i),
                                          255)).astype(np.float32) * 2)
             for i in range(2)]
    strides = (8, 16)
    pred = yolo.decode_heads(feats, strides=strides)
    b1, s1, c1 = yolo.parse_predictions(pred, 1.0, already_sigmoid=True)
    b2, s2, c2 = yolo.decode_and_parse(feats, strides=strides)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_letterbox_shapes_and_fill():
    frames = np.full((2, 480, 640, 3), 200, np.uint8)
    out = np.asarray(yolo.letterbox_uint8(jnp.asarray(frames), (640, 640)))
    assert out.shape == (2, 640, 640, 3)
    # 480x640 -> scale 1.0, pad 80 top/bottom
    assert (out[:, :80] == 114).all() and (out[:, -80:] == 114).all()
    assert (out[:, 80:560] == 200).all()


def test_quantize_input_matches_reference():
    u8 = np.arange(0, 256, dtype=np.uint8).reshape(1, 16, 16, 1)
    q = np.asarray(yolo.quantize_input_int8(jnp.asarray(u8)))
    np.testing.assert_array_equal(
        q, (u8.astype(np.int32) - 128).astype(np.int8))


def test_decode_head_level():
    b, h, w, a, nc = 1, 4, 4, 3, 80
    feat = np.zeros((b, h, w, a * (5 + nc)), np.float32)
    anchors = jnp.asarray(yolo.YOLOV5_ANCHORS[0])
    out = np.asarray(yolo.decode_head_level(jnp.asarray(feat), anchors, 8, nc))
    assert out.shape == (b, h * w * a, 5 + nc)
    # zero logits: sigmoid=0.5 -> xy = (2*0.5-0.5+grid)*8 = (grid+0.5)*8
    xy0 = out[0, 0, :2]
    np.testing.assert_allclose(xy0, [4.0, 4.0], rtol=1e-6)
    # wh = (2*0.5)^2 * anchor = anchor
    np.testing.assert_allclose(out[0, 0, 2:4], yolo.YOLOV5_ANCHORS[0, 0],
                               rtol=1e-6)


def test_scale_boxes_roundtrip():
    boxes = jnp.asarray([[100.0, 120.0, 200.0, 240.0]])
    out = np.asarray(yolo.scale_boxes_to_original(boxes, (480, 640), (640, 640)))
    # 640x480 frame -> scale 1.0, pad_y 80
    np.testing.assert_allclose(out[0], [100, 40, 200, 160], rtol=1e-5)


def test_e2e_pipeline_zoo_graph():
    """Full device pipeline: frames -> letterbox -> backbone -> decode ->
    NMS on a zoo yolov5n at small input."""
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    eng = Engine(g)

    in_name = eng.graph.inputs[0]
    fn, params = eng._fn, eng.params

    @jax.jit
    def pipeline(frames):
        lb = yolo.letterbox_uint8(frames, (64, 64))
        x = yolo.normalize_input_f32(lb)
        feats = fn(params, {in_name: x})
        feats = [feats[k] for k in eng.graph.outputs]
        pred = yolo.decode_heads(feats, strides=(8, 16, 32))
        boxes, scores, classes = yolo.parse_predictions(
            pred, 1.0, already_sigmoid=True)
        return yolo.nms_batched(boxes, scores, classes, max_dets=20)

    frames = np.random.default_rng(0).integers(
        0, 256, (2, 48, 64, 3), dtype=np.uint8)
    dets = pipeline(jnp.asarray(frames))
    assert dets.boxes.shape == (2, 20, 4)
    assert dets.valid.dtype == bool


def test_nv12_to_rgb(rng):
    """NV12 conversion vs a numpy BT.601 oracle."""
    h, w = 8, 8
    nv12 = rng.integers(0, 256, (1, h * 3 // 2, w), dtype=np.uint8)
    got = np.asarray(yolo.nv12_to_rgb(jnp.asarray(nv12), h, w))
    y = nv12[0, :h, :].astype(np.float64)
    uv = nv12[0, h:, :].reshape(h // 2, w // 2, 2).astype(np.float64)
    u = np.kron(uv[..., 0] - 128, np.ones((2, 2)))
    v = np.kron(uv[..., 1] - 128, np.ones((2, 2)))
    ref = np.stack([y + 1.402 * v,
                    y - 0.344136 * u - 0.714136 * v,
                    y + 1.772 * u], axis=-1)
    ref = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    diff = np.abs(got[0].astype(int) - ref.astype(int))
    assert diff.max() <= 1  # f32 vs f64 rounding at the boundary


def test_nv12_gray_roundtrip():
    """Neutral chroma (128) -> R=G=B=Y exactly."""
    h, w = 4, 4
    nv12 = np.full((1, h * 3 // 2, w), 128, np.uint8)
    nv12[0, :h] = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    got = np.asarray(yolo.nv12_to_rgb(jnp.asarray(nv12), h, w))
    for c in range(3):
        np.testing.assert_array_equal(got[0, :, :, c], nv12[0, :h])


def test_nms_crowded_scene_pool(rng):
    """Crowded scene: suppression must run over a pool deeper than
    max_dets, or survivors ranked below suppressed higher-scored boxes
    get dropped (the round-1 defect). 1k overlapping boxes vs the
    full-N host oracle."""
    n = 1000
    # 25 clusters of 40 boxes each: within a cluster heavy overlap
    centers = rng.uniform(80, 560, (25, 2))
    boxes = []
    for cx, cy in centers:
        for _ in range(40):
            boxes.append([cx + rng.uniform(-6, 6), cy + rng.uniform(-6, 6),
                          rng.uniform(40, 60), rng.uniform(40, 60)])
    boxes = np.asarray(boxes, np.float32)
    scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
    classes = rng.integers(0, 3, n).astype(np.int32)

    dets = yolo.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        conf_thresh=0.25, iou_thresh=0.45, max_dets=100, pre_nms=1000)
    got = sorted(
        (round(float(s), 5), int(c))
        for s, c, v in zip(np.asarray(dets.scores), np.asarray(dets.classes),
                           np.asarray(dets.valid)) if v)
    ref_idx = np_nms_oracle(boxes, scores, classes, 0.25, 0.45)
    ref = sorted((round(float(scores[i]), 5), int(classes[i]))
                 for i in ref_idx[:100])
    # full pool -> exact oracle agreement
    assert got == sorted(ref)

    # default 256-pool: every returned box is a true oracle survivor
    # (no suppressed box resurrected) and the top oracle boxes are kept
    dets2 = yolo.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        conf_thresh=0.25, iou_thresh=0.45, max_dets=100)
    got2 = {round(float(s), 5)
            for s, v in zip(np.asarray(dets2.scores),
                            np.asarray(dets2.valid)) if v}
    ref_scores = [round(float(scores[i]), 5) for i in ref_idx]
    assert got2 <= set(ref_scores)
    assert set(ref_scores[:40]) <= got2


def test_detect_postprocess_topk_matches_full_decode(rng):
    """Score->topk->decode-survivors == full decode + NMS (same pool)."""
    feats = [jnp.asarray((rng.normal(size=(2, s, s, 255)) * 18).astype(np.int8))
             for s in (16, 8, 4)]
    scales = [0.08, 0.09, 0.1]
    heads = [f.astype(jnp.float32) * s for f, s in zip(feats, scales)]
    boxes, conf, cls = yolo.decode_and_parse(heads)
    ref = yolo.nms_batched(boxes, conf, cls, conf_thresh=0.25,
                           iou_thresh=0.45, max_dets=50, pre_nms=256)
    got = yolo.detect_postprocess_topk(
        feats, scales=scales, conf_thresh=0.25, iou_thresh=0.45,
        max_dets=50, pre_nms=256)
    for b in range(2):
        rv = np.asarray(ref.valid[b]); gv = np.asarray(got.valid[b])
        assert rv.sum() == gv.sum()
        np.testing.assert_allclose(
            np.asarray(got.scores[b])[gv], np.asarray(ref.scores[b])[rv],
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got.boxes[b])[gv], np.asarray(ref.boxes[b])[rv],
            rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(
            np.asarray(got.classes[b])[gv], np.asarray(ref.classes[b])[rv])


def test_top_k_grouped_exact(rng):
    from thingino_accel_tpu.models.yolo import top_k_grouped
    # distinct values: must match lax.top_k exactly (values and indices)
    n = 25200
    s = jnp.asarray(rng.permutation(n).astype(np.float32))
    for k in (100, 256, 500):
        v, i = top_k_grouped(s, k)
        ve, ie = jax.lax.top_k(s, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ie))
    # ties + sparse zeros (the NMS masked-score shape): value sets match
    s2 = np.zeros(n, np.float32)
    idxs = rng.choice(n, 400, replace=False)
    s2[idxs] = rng.integers(1, 50, 400).astype(np.float32)  # heavy ties
    v, i = top_k_grouped(jnp.asarray(s2), 256)
    ve, _ = jax.lax.top_k(jnp.asarray(s2), 256)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ve))
    # returned indices must point at the returned values
    np.testing.assert_array_equal(np.asarray(v), s2[np.asarray(i)])
    # k >= n passthrough
    v, i = top_k_grouped(jnp.asarray(s2[:64]), 100)
    assert v.shape == (64,)
