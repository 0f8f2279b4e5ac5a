"""Engine end-to-end tests: bundled models + zoo graphs through the
whole load -> trace -> jit -> run path (the mars_test.c / mars_yolo_test.c
analog, SURVEY §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import reference_model
from thingino_accel_tpu.formats import mars as M
from thingino_accel_tpu.ir.graph import from_mars
from thingino_accel_tpu.runtime import Engine, EngineOptions
from thingino_accel_tpu.models import zoo


def test_tiny_f32_runs():
    eng = Engine.from_mars(reference_model("tiny_160_f32.mars"))
    x = np.random.default_rng(0).normal(
        size=(1, 160, 160, 3)).astype(np.float32)
    out = eng.run_np(x)
    (v,) = out.values()
    assert v.shape == (1, 154, 154, 64)
    assert np.isfinite(v).all()


def test_tiny_f32_matches_direct_conv():
    """Engine output == composing the three convs by hand in float64."""
    m = M.read_mars(reference_model("tiny_160_f32.mars"))
    g = from_mars(m)
    eng = Engine(g)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 160, 160, 3)).astype(np.float32)
    got = list(eng.run_np(x).values())[0]

    # hand path: VALID convs with OIHW weights from the IR + relus
    def conv(xx, w, b):
        o, i, kh, kw = w.shape
        n, h, wd, _ = xx.shape
        out = np.zeros((n, h - kh + 1, wd - kw + 1, o), np.float64)
        import itertools
        for dy, dx in itertools.product(range(kh), range(kw)):
            sl = xx[:, dy:h - kh + 1 + dy, dx:wd - kw + 1 + dx, :]
            out += np.einsum("nhwc,oc->nhwo", sl.astype(np.float64),
                             w[:, :, dy, dx].astype(np.float64))
        return out + b.astype(np.float64)

    consts = {n: t.data for n, t in g.tensors.items() if t.is_const}
    convs = [n for n in g.nodes if n.op == "CONV2D"]
    y = x.astype(np.float64)
    for i, node in enumerate(convs):
        w = consts[node.inputs[1]]
        b = consts[node.inputs[2]]
        y = conv(y, w, b)
        if i < 2:
            y = np.maximum(y, 0.0)
    np.testing.assert_allclose(got, y.astype(np.float32), rtol=2e-4, atol=2e-4)


def test_tiny_int8_runs_and_is_deterministic():
    eng = Engine.from_mars(reference_model("tiny_160_int8.mars"))
    x = np.random.default_rng(1).integers(
        -128, 128, (1, 160, 160, 3), dtype=np.int8)
    a = eng.run_np(x)
    b = eng.run_np(x)
    (ka,), (kb,) = a.values(), b.values()
    np.testing.assert_array_equal(ka, kb)
    assert ka.dtype == np.int8


def test_yolov5n_int8_backbone_runs():
    """The real yolov5n_int8 graph traces + executes up to the three
    detect convs (the in-file decode head is broken by the reference
    compiler's skipped ops — we re-target outputs there)."""
    from thingino_accel_tpu.formats import mars as MM
    from thingino_accel_tpu.models.yolo import find_detect_outputs
    g = from_mars(MM.read_mars(reference_model("yolov5n_int8.mars")))
    det = find_detect_outputs(g)
    assert len(det) == 3
    eng = Engine(g.with_outputs(det))
    x = np.zeros((1, 640, 640, 3), np.int8)
    out = eng.run_np(x)
    shapes = sorted(v.shape for v in out.values())
    assert shapes == [(1, 20, 20, 255), (1, 40, 40, 255), (1, 80, 80, 255)]
    for v in out.values():
        assert v.dtype == np.int8


def test_compat_mode_runs():
    opts = EngineOptions(mode="compat")
    eng = Engine.from_mars(reference_model("tiny_160_int8.mars"), opts)
    x = np.random.default_rng(2).integers(
        -128, 128, (1, 160, 160, 3), dtype=np.int8)
    out = eng.run_np(x)
    (v,) = out.values()
    assert v.dtype == np.int8


def test_zoo_tiny_matches_file_architecture():
    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(160, 160)))
    eng = Engine(g)
    x = np.random.default_rng(3).normal(
        size=(1, 160, 160, 3)).astype(np.float32)
    (v,) = eng.run_np(x).values()
    assert v.shape == (1, 154, 154, 64)


def test_zoo_yolov5n_small_input():
    """yolov5n graph at 64x64 input (fast trace) produces 3 head levels."""
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    eng = Engine(g)
    x = np.zeros((1, 64, 64, 3), np.int8)
    outs = eng.run_np(x)
    shapes = sorted(v.shape for v in outs.values())
    assert shapes == [(1, 2, 2, 255), (1, 4, 4, 255), (1, 8, 8, 255)]


def test_silu_fusion_reduces_nodes():
    m = M.read_mars(reference_model("yolov5n_int8.mars"))
    g = from_mars(m)
    from thingino_accel_tpu.ir.passes import fuse_silu_pairs
    fused = fuse_silu_pairs(g)
    n_silu = sum(1 for n in fused if n.op == "SILU_FUSED")
    assert n_silu >= 50  # 60 sigmoid+mul pairs; a few MULs pair differently
    assert len(fused) < len(g.nodes) - 40


def test_zoo_nanodet_depthwise_runs():
    """NanoDet-class depthwise detector through both dtypes (exercises
    the DEPTHWISE_CONV2D path the reference runtime left unimplemented)."""
    for dt in ("float32", "int8"):
        g = zoo.build_nanodet(zoo.ZooConfig(dtype=dt, in_hw=(64, 64)))
        eng = Engine(g)
        x = np.zeros((1, 64, 64, 3),
                     np.int8 if dt == "int8" else np.float32)
        out = eng.run_np(x)
        assert sorted(v.shape for v in out.values()) == [
            (1, 2, 2, 84), (1, 4, 4, 84), (1, 8, 8, 84)]


def test_engine_trace_returns_all_activations():
    g = zoo.build_tiny(zoo.ZooConfig(dtype="int8", in_hw=(32, 32)),
                       in_hw=(32, 32))
    eng = Engine(g)
    acts = eng.trace(np.zeros((1, 32, 32, 3), np.int8))
    # input + 3 conv outputs
    assert len(acts) == 4
    for v in acts.values():
        assert v.dtype == np.int8


def test_yolov5n_f32_backbone_runs():
    """The bundled f32 yolov5n through its detect heads (fp16-stored
    weights widened at import)."""
    from thingino_accel_tpu.formats import mars as MM
    from thingino_accel_tpu.models.yolo import find_detect_outputs
    g = from_mars(MM.read_mars(reference_model("yolov5n.mars")))
    det = find_detect_outputs(g)
    assert len(det) == 3
    eng = Engine(g.with_outputs(det))
    x = np.random.default_rng(0).normal(
        scale=0.5, size=(1, 640, 640, 3)).astype(np.float32)
    out = eng.run_np(x)
    for v in out.values():
        assert v.dtype == np.float32
        assert np.isfinite(v).all()
        assert float(np.abs(v).mean()) > 0


def test_yolov5nu_anchor_free_runs():
    """The bundled yolov5nu (anchor-free v8-style head, 252 layers) runs
    through its 6 detect convs; anchor-free DFL decode + NMS on top."""
    from thingino_accel_tpu.formats import mars as MM
    from thingino_accel_tpu.models import yolo
    g = from_mars(MM.read_mars(reference_model("yolov5nu.mars")))
    det = yolo.find_detect_outputs(g)
    assert len(det) == 6
    eng = Engine(g.with_outputs(det))
    x = np.random.default_rng(0).integers(
        -30, 30, (1, 320, 320, 3), dtype=np.int8)
    out = eng.run_np(x)
    # pair up box (64ch) and cls (80ch) heads by level
    by_level = {}
    for k, v in out.items():
        by_level.setdefault(v.shape[1], {})[v.shape[3]] = (k, v)
    box_feats, cls_feats, strides = [], [], []
    for hw in sorted(by_level, reverse=True):
        lvl = by_level[hw]
        assert 64 in lvl and 80 in lvl
        sc_b = g.tensors[lvl[64][0]].quant.scale
        sc_c = g.tensors[lvl[80][0]].quant.scale
        box_feats.append(jnp.asarray(
            lvl[64][1].astype(np.float32) * sc_b))
        cls_feats.append(jnp.asarray(
            lvl[80][1].astype(np.float32) * sc_c))
        strides.append(320 // hw)
    boxes, conf, classes = yolo.decode_anchor_free(
        box_feats, cls_feats, strides)
    assert boxes.shape[1] == 40 * 40 + 20 * 20 + 10 * 10
    dets = yolo.nms_batched(boxes, conf, classes, max_dets=20)
    assert dets.boxes.shape == (1, 20, 4)
    assert np.isfinite(np.asarray(boxes)).all()


def test_dequantize_shared_bias_cloned():
    """An int32 bias const shared by two convs with DIFFERENT input
    scales must be dequantized per conv (in*w units) — last-wins would
    scale the first conv's bias with the second conv's input scale."""
    import numpy as np
    from thingino_accel_tpu.ir.graph import (Graph, Node, TensorInfo,
                                             QuantInfo)
    from thingino_accel_tpu.ir import passes

    i8 = np.dtype(np.int8)
    ts = {
        "x": TensorInfo("x", (1, 4, 4, 2), i8, quant=QuantInfo(scale=0.1)),
        "m": TensorInfo("m", (1, 4, 4, 2), i8, quant=QuantInfo(scale=0.4)),
        "w1": TensorInfo("w1", (2, 2, 1, 1), i8, quant=QuantInfo(scale=0.02),
                         data=np.ones((2, 2, 1, 1), np.int8)),
        "w2": TensorInfo("w2", (2, 2, 1, 1), i8, quant=QuantInfo(scale=0.02),
                         data=np.ones((2, 2, 1, 1), np.int8)),
        "bsh": TensorInfo("bsh", (2,), np.dtype(np.int32),
                          data=np.array([100, 200], np.int32)),
        "y": TensorInfo("y", (1, 4, 4, 2), i8, quant=QuantInfo(scale=0.5)),
    }
    cattrs = dict(kernel=(1, 1), stride=(1, 1), padding="EXPLICIT",
                  explicit_pad=(0, 0, 0, 0), groups=1, activation="NONE")
    g = Graph(
        nodes=[Node("CONV2D", ["x", "w1", "bsh"], ["m"], dict(cattrs), "c1"),
               Node("CONV2D", ["m", "w2", "bsh"], ["y"], dict(cattrs), "c2")],
        tensors=ts, inputs=["x"], outputs=["y"], name="sharedbias")
    gd = passes.dequantize_graph(g)
    gd.validate()
    convs = [n for n in gd.nodes if n.op == "CONV2D"]
    b1 = gd.tensors[convs[0].inputs[2]].data
    b2 = gd.tensors[convs[1].inputs[2]].data
    np.testing.assert_allclose(
        b1, np.array([100, 200], np.float32) * 0.1 * 0.02, rtol=1e-6)
    np.testing.assert_allclose(
        b2, np.array([100, 200], np.float32) * 0.4 * 0.02, rtol=1e-6)


def test_run_accepts_dict_feed_and_rejects_unknown_names():
    """run()/run_np() accept a single name->array dict positionally (the
    shape run() itself returns) and reject unknown names cleanly."""
    eng = Engine.from_mars(reference_model("tiny_160_int8.mars"))
    x = np.random.default_rng(3).integers(
        -128, 128, (1, 160, 160, 3), dtype=np.int8)
    name = eng.graph.inputs[0]
    by_dict = eng.run_np({name: x})
    by_pos = eng.run_np(x)
    for k in by_pos:
        np.testing.assert_array_equal(by_dict[k], by_pos[k])
    with pytest.raises(KeyError, match="unknown input"):
        eng.run_np({"nope": x})
