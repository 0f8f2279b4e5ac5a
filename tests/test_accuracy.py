"""Detection-parity regression on the real-weight bundled model.

Small-scale version of examples/accuracy_report.py: the fast tier must
reproduce every f32-oracle detection (IoU > 0.5, same class) on the
reference's own test image. (Reference accuracy anchor:
``src/mars/mars_yolo_test.c:174-206`` — detections on a real JPEG.)
"""

import os

import numpy as np
import pytest

REF_IMG = "/root/reference/mgk-decompiler/test_detection.jpg"
REF_MARS = "/root/reference/models/yolov5n.mars"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_IMG) and os.path.exists(REF_MARS)),
    reason="reference assets absent")


@pytest.fixture(scope="module")
def real_graphs():
    from thingino_accel_tpu.formats.mars import read_mars
    from thingino_accel_tpu.ir.graph import Graph, from_mars
    from thingino_accel_tpu.models import yolo
    from thingino_accel_tpu.training import ptq

    g = from_mars(read_mars(open(REF_MARS, "rb").read()))
    det_outs = yolo.find_detect_outputs(g)
    assert len(det_outs) == 3
    gf = Graph(nodes=g.nodes, tensors=g.tensors, inputs=g.inputs,
               outputs=det_outs, name="yolov5n_real")
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import accuracy_report as AR
    img = np.asarray(__import__("PIL.Image", fromlist=["Image"])
                     .open(REF_IMG).convert("RGB"), np.uint8)
    calib = [AR._letterbox_np(a).astype(np.float32)[None] / 255.0
             for a in AR._augments(img, 4, seed=100)]
    gq = ptq.quantize_model(gf, ({gf.inputs[0]: c} for c in calib))
    return gf, gq, det_outs, img, AR


def test_fast_tier_matches_f32_oracle(real_graphs):
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    gf, gq, det_outs, img, AR = real_graphs
    lb = AR._letterbox_np(img)
    xf = jnp.asarray(lb.astype(np.float32)[None] / 255.0)
    in_scale = gq.tensors[gq.inputs[0]].quant.scale
    xq = jnp.asarray(np.clip(np.round(
        lb.astype(np.float32) / 255.0 / in_scale), -128, 127
    ).astype(np.int8)[None])

    eng_f = Engine(gf)
    oracle = AR._detections(eng_f, gf, det_outs, xf)
    assert len(oracle[0]) >= 1, "oracle found no detections at all"

    det_scales = [gq.tensors[o].quant.scale for o in det_outs]
    eng_fast = Engine(gq, EngineOptions(precision="fast",
                                        compute_dtype=jnp.bfloat16))
    got = AR._detections(eng_fast, gq, det_outs, xq, scales=det_scales)
    n_m, n_miss, n_extra, mean_iou, mae = AR.match_stats(oracle, got)
    assert n_miss == 0, f"fast tier missed {n_miss} oracle boxes"
    assert mean_iou > 0.6
    assert mae < 0.1   # 4-augment calibration is crude


def test_exact_tier_runs_real_weights(real_graphs):
    """The reference-semantics tier runs the real calibrated model and
    produces a plausible detection set (its absolute count may differ —
    intermediate activation quantization, see ACCURACY.md)."""
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    gf, gq, det_outs, img, AR = real_graphs
    lb = AR._letterbox_np(img)
    in_scale = gq.tensors[gq.inputs[0]].quant.scale
    xq = jnp.asarray(np.clip(np.round(
        lb.astype(np.float32) / 255.0 / in_scale), -128, 127
    ).astype(np.int8)[None])
    det_scales = [gq.tensors[o].quant.scale for o in det_outs]
    eng = Engine(gq, EngineOptions(precision="exact"))
    boxes, scores, classes = AR._detections(eng, gq, det_outs, xq,
                                            scales=det_scales)
    assert len(boxes) < 50          # not an explosion of garbage
    assert np.all(scores <= 1.0)
