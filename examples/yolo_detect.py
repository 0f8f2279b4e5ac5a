#!/usr/bin/env python3
"""End-to-end YOLO detection (the examples/yolo_detect.cpp +
src/mars/mars_yolo_test.c analog): model + image in, detections printed.

Usage: python examples/yolo_detect.py <model.mars> [image.jpg]
With no image, runs on a synthetic test pattern like the reference.
"""

import sys

import numpy as np


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    model_path = sys.argv[1]
    image_path = sys.argv[2] if len(sys.argv) > 2 else None

    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.models import yolo
    from thingino_accel_tpu.runtime import Engine
    from thingino_accel_tpu import native

    print(f"[1] Loading model: {model_path}")
    g = from_mars(M.read_mars(model_path))
    det_outs = yolo.find_detect_outputs(g)
    if det_outs:
        g = g.with_outputs(det_outs)
        print(f"    using {len(det_outs)} detect heads (raw-logit decode)")
    eng = Engine(g)
    in_t = eng.graph.tensors[eng.graph.inputs[0]]
    target = (in_t.shape[1], in_t.shape[2])
    print(f"    input {target}, {len(g.nodes)} nodes")

    print("[2] Loading image...")
    if image_path:
        with open(image_path, "rb") as f:
            img = native.decode_jpeg(f.read())
        print(f"    {img.shape[1]}x{img.shape[0]}")
    else:
        img = np.zeros((480, 640, 3), np.uint8)
        img[120:360, 160:480] = 180  # synthetic block
        print("    synthetic test pattern 640x480")

    print("[3] Running inference (device pipeline)...")
    in_name = eng.graph.inputs[0]
    scales = [eng.graph.tensors[o].quant.scale for o in eng.graph.outputs]
    is_int8 = np.issubdtype(in_t.dtype, np.signedinteger)
    body, params = eng._fn, eng.params

    @jax.jit
    def pipeline(frames):
        lb = yolo.letterbox_uint8(frames, target)
        x = (yolo.quantize_input_int8(lb) if is_int8
             else yolo.normalize_input_f32(lb))
        feats = body(params, {in_name: x})
        if det_outs:
            f32 = [feats[k].astype(jnp.float32) * jnp.float32(s)
                   for k, s in zip(eng.graph.outputs, scales)]
            pred = yolo.decode_heads(f32)
            b, s, c = yolo.parse_predictions(pred, 1.0, already_sigmoid=True)
        else:
            (o,) = feats.values()
            b, s, c = yolo.parse_predictions(o, scales[0])
        return yolo.nms_batched(b, s, c, max_dets=50)

    dets = pipeline(jnp.asarray(img[None]))
    boxes = np.asarray(yolo.scale_boxes_to_original(
        dets.boxes, img.shape[:2], target))

    n = int(np.asarray(dets.num)[0])
    print(f"[4] {n} detections:")
    sc = np.asarray(dets.scores)
    cl = np.asarray(dets.classes)
    va = np.asarray(dets.valid)
    for i in range(dets.boxes.shape[1]):
        if not va[0, i]:
            continue
        name = (yolo.COCO_CLASSES[cl[0, i]]
                if cl[0, i] < len(yolo.COCO_CLASSES) else "?")
        x0, y0, x1, y1 = boxes[0, i]
        print(f"  [{i:2d}] {name:<14} {sc[0,i]*100:5.1f}%  "
              f"({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")
    print("Done.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
