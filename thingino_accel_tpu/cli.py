"""Command-line tools.

Covers the roles of the reference's offline CLIs and device test
programs:

- ``summary``  — model inspection (``mars_print_summary`` /
  ``src/mars/mars_test.c``)
- ``run``      — load + run on random/zero/npy input, print output stats
  (``src/mars/mars_yolo_test.c`` without the detection head)
- ``detect``   — full YOLO detection on an image
  (``examples/yolo_detect.cpp`` / ``mars_yolo_test.c``)
- ``compile``  — ONNX -> `.mars` (``mars-compiler`` CLI,
  ``mars-compiler/src/main.rs:48-73``)
- ``decompile``— `.mgk` -> metadata/weights dump (``mgk-decompiler`` CLI)
- ``bench``    — micro/e2e benchmarks (``examples/mars_*_bench.c``)

Usage: ``python -m thingino_accel_tpu.cli <command> ...``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_image(path: str) -> np.ndarray:
    """Decode an image file to HWC uint8 RGB (stb_image's role)."""
    if path.endswith(".npy"):
        arr = np.load(path)
        return np.asarray(arr, np.uint8)
    try:
        from PIL import Image
    except ImportError as e:
        raise SystemExit(
            "image decoding needs Pillow; pass a .npy file instead") from e
    return np.asarray(Image.open(path).convert("RGB"), np.uint8)


def cmd_summary(args) -> int:
    from thingino_accel_tpu.formats import mars as M
    m = M.read_mars(args.model)
    print(m.summary())
    return 0


def cmd_run(args) -> int:
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    opts = EngineOptions(mode=args.mode)
    eng = Engine.from_mars(args.model, opts)
    print(eng.summary())
    rng = np.random.default_rng(args.seed)
    feed = {}
    for name in eng.input_names:
        t = eng.graph.tensors[name]
        shape = (args.batch,) + tuple(t.shape[1:])
        if args.input:
            arr = np.load(args.input).astype(t.dtype)
            if tuple(arr.shape[1:]) != tuple(t.shape[1:]):
                print(f"error: --input shape {arr.shape} does not match "
                      f"{name} {t.shape} (batch-free dims)",
                      file=sys.stderr)
                return 1
        elif np.issubdtype(t.dtype, np.integer):
            arr = rng.integers(-128, 128, shape).astype(t.dtype)
        else:
            arr = rng.normal(size=shape).astype(t.dtype)
        feed[name] = arr
    t0 = time.perf_counter()
    out = eng.run_np(**feed)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = eng.run_np(**feed)
    run_s = (time.perf_counter() - t0) / max(args.iters, 1)
    for k, v in out.items():
        print(f"output {k}: shape={v.shape} dtype={v.dtype} "
              f"min={v.min()} max={v.max()} mean={float(np.mean(v)):.4f}")
    fed_batch = next(iter(feed.values())).shape[0]
    print(f"first call (incl. compile): {compile_s*1e3:.1f} ms; "
          f"steady-state: {run_s*1e3:.2f} ms "
          f"({fed_batch/run_s:.1f} inf/s)")
    return 0


def cmd_detect(args) -> int:
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.models import yolo
    from thingino_accel_tpu.runtime import Engine

    g = from_mars(M.read_mars(args.model))
    det_outs = yolo.find_detect_outputs(g)
    if det_outs:
        g = g.with_outputs(det_outs)
    eng = Engine(g)
    in_name = eng.graph.inputs[0]
    in_t = eng.graph.tensors[in_name]
    target = (in_t.shape[1], in_t.shape[2])
    is_int8 = np.issubdtype(in_t.dtype, np.signedinteger)
    scales = [eng.graph.tensors[o].quant.scale for o in eng.graph.outputs]

    img = _load_image(args.image)
    frames = jnp.asarray(img[None])

    body, params = eng._fn, eng.params

    @jax.jit
    def pipeline(frames_u8):
        lb = yolo.letterbox_uint8(frames_u8, target)
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
        return yolo.nms_batched(
            b, s, c, conf_thresh=args.conf, iou_thresh=args.iou,
            max_dets=args.max_dets)

    dets = pipeline(frames)
    boxes = np.asarray(yolo.scale_boxes_to_original(
        dets.boxes, img.shape[:2], target))
    n = int(np.asarray(dets.num)[0])
    print(f"{n} detections:")
    sc, cl, va = map(np.asarray, (dets.scores, dets.classes, dets.valid))
    for i in range(dets.boxes.shape[1]):
        if not va[0, i]:
            continue
        name = (yolo.COCO_CLASSES[cl[0, i]]
                if cl[0, i] < len(yolo.COCO_CLASSES) else "?")
        x0, y0, x1, y1 = boxes[0, i]
        print(f"  {name:<14} {sc[0, i]*100:5.1f}%  "
              f"({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f})")
    return 0


def cmd_compile(args) -> int:
    from thingino_accel_tpu.formats import onnx as O
    from thingino_accel_tpu.formats import mars_export
    graph = O.import_onnx(
        args.input, float32=args.float32, nhwc=args.nhwc,
        verbose=args.verbose)
    mars_export.export_mars(graph, args.output)
    print(f"wrote {args.output}")
    return 0


def cmd_decompile(args) -> int:
    from thingino_accel_tpu.formats import mgk

    # OEM IVS wrappers (e.g. libpersonDet_inf.so) embed a jzdl network
    # instead of a magik container — route those to the jzdl decompiler
    try:
        from thingino_accel_tpu.formats import jzdl
        model = jzdl.load_so(args.input)
    except (ValueError, OSError):
        model = None
    if model is not None:
        c, h, w = model.input_chw
        print(f"jzdl embedded network: input {c}x{h}x{w}, "
              f"{len(model.layers)} layers, {model.n_blobs} blobs")
        for i, l in enumerate(model.layers):
            tag = jzdl.LAYER_NAMES.get(l.ltype, f"type{l.ltype}")
            extra = ""
            if l.is_conv:
                extra = (f" cin={l.in_channels} cout={l.out_channels}"
                         f" k={l.kernel} s={l.stride}"
                         f" w={l.weight_size}B")
            print(f"  L{i:2d} {tag:9s} {l.bottoms}->{l.tops}{extra}")
        if args.extract_weights:
            import numpy as np
            arrs = {}
            for i, l in enumerate(model.conv_layers()):
                arrs[f"L{i}_weights"] = l.weights
                for f in ("bias", "scales", "q31_mult", "q_shift",
                          "quant_a", "quant_packed"):
                    v = getattr(l, f)
                    if v is not None:
                        arrs[f"L{i}_{f}"] = v
            np.savez(args.extract_weights, **arrs)
            print(f"weights -> {args.extract_weights}")
        return 0

    info = mgk.inspect_mgk(args.input)
    print(json.dumps(info, indent=2, default=str))
    if args.extract_weights:
        mgk.extract_weights(args.input, args.extract_weights)
        print(f"weights -> {args.extract_weights}")
    if getattr(args, "onnx", None):
        with open(args.onnx, "wb") as f:
            f.write(mgk.mgk_to_onnx(args.input))
        print(f"onnx -> {args.onnx}")
    return 0


def cmd_gen_test(args) -> int:
    """Generate a minimal single-conv test `.mars` (the
    tools/mars_gen_test.py role)."""
    from thingino_accel_tpu.formats import mars as M
    rng = np.random.default_rng(args.seed)
    h, w, cin, cout = args.height, args.width, args.channels, args.out_channels
    weights = rng.integers(-128, 128, (cout, 3, 3, cin), dtype=np.int8)
    bias = np.zeros((cout,), np.int32)
    tensors = [
        M.MarsTensor(0, "input", M.DType.INT8, M.Format.NHWC,
                     (1, h, w, cin), scale=1.0),
        M.MarsTensor(1, "conv1_weight", M.DType.INT8, M.Format.OHWI,
                     (cout, 3, 3, cin), scale=0.01),
        M.MarsTensor(2, "conv1_bias", M.DType.INT32, M.Format.D1, (cout,)),
        M.MarsTensor(3, "output", M.DType.INT8, M.Format.NHWC,
                     (1, h, w, cout), scale=1.0),
    ]
    layers = [M.MarsLayer(0, M.LayerType.CONV2D, (0,), (3,),
                          M.ConvParams(kernel_h=3, kernel_w=3,
                                       padding=M.Padding.SAME,
                                       activation=M.Activation.RELU,
                                       weight_tensor_id=1,
                                       bias_tensor_id=2))]
    model = M.build_mars(tensors, layers, [0], [3],
                         {1: weights, 2: bias})
    M.write_mars(model, args.output)
    print(f"wrote {args.output}: 1 conv layer, {h}x{w}x{cin} -> {cout}ch")
    return 0


def cmd_quantize(args) -> int:
    """PTQ: f32 model (.onnx or .mars) -> calibrated int8 .mars.

    The in-framework role of the reference's offline
    ``scripts/quantize_onnx.py`` -> QDQ ONNX -> mars-compiler chain:
    one command, per-channel weight scales, percentile or MSE
    activation calibration (training/ptq.py).
    """
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.formats import mars_export
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.training import ptq

    if args.input.endswith(".onnx"):
        from thingino_accel_tpu.formats import onnx as O
        graph = O.import_onnx(args.input, float32=True)
    else:
        graph = from_mars(M.read_mars(args.input))
    in_name = graph.inputs[0]
    shape = graph.tensors[in_name].shape

    def batches():
        if args.images:
            import glob as _glob
            from PIL import Image
            files = sorted(
                f for f in _glob.glob(os.path.join(args.images, "*"))
                if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
            )[:args.batches]
            if not files:
                raise SystemExit(f"no images in {args.images}")
            for f in files:
                img = Image.open(f).convert("RGB").resize(
                    (shape[2], shape[1]))
                x = np.asarray(img, np.float32)[None] / 255.0
                yield {in_name: x}
        elif args.calib:
            arr = np.load(args.calib)
            if hasattr(arr, "files"):           # npz: first array
                arr = arr[arr.files[0]]
            arr = np.asarray(arr, np.float32)
            if arr.ndim == len(shape) - 1:
                arr = arr[None]
            for i in range(min(len(arr), args.batches)):
                yield {in_name: arr[i:i + 1]}
        else:
            rng = np.random.default_rng(args.seed)
            for _ in range(args.batches):
                yield {in_name: rng.uniform(
                    0, 1, (1,) + tuple(shape[1:])).astype(np.float32)}

    q = ptq.quantize_model(graph, batches(),
                           percentile=args.percentile,
                           method=args.method)
    mars_export.export_mars(q, args.output)
    in_scale = q.tensors[q.inputs[0]].quant.scale
    print(f"wrote {args.output} (int8, input scale {in_scale:.6f}, "
          f"method {args.method})")
    return 0


def cmd_export_onnx(args) -> int:
    """.mars -> float32 ONNX (dequantized weights), the reverse of
    ``compile`` — lets models leave the ecosystem for other runtimes
    (the decompiler's generic builder, ``formats/onnx_export.py``)."""
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.formats.onnx_export import ir_to_onnx
    from thingino_accel_tpu.ir.graph import from_mars
    graph = from_mars(M.read_mars(args.input))
    blob = ir_to_onnx(graph)
    with open(args.output, "wb") as f:
        f.write(blob)
    print(f"wrote {args.output} ({len(blob)} bytes)")
    return 0


def cmd_bench(args) -> int:
    # bench.py lives at the repo root, not in the package — resolve it
    # relative to this file so the subcommand works from any cwd
    import importlib.util
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bp = os.path.join(root, "bench.py")
    if not os.path.exists(bp):
        print(f"error: bench.py not found at {bp}", file=sys.stderr)
        return 1
    spec = importlib.util.spec_from_file_location("bench", bp)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="thingino-accel-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("summary", help="print model structure")
    s.add_argument("model")
    s.set_defaults(fn=cmd_summary)

    s = sub.add_parser("run", help="load and run a model")
    s.add_argument("model")
    s.add_argument("--input", help=".npy input file")
    s.add_argument("--batch", type=int, default=1)
    s.add_argument("--iters", type=int, default=3)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--mode", choices=["full", "compat"], default="full")
    s.set_defaults(fn=cmd_run)

    s = sub.add_parser("detect", help="YOLO detection on an image")
    s.add_argument("model")
    s.add_argument("image")
    s.add_argument("--conf", type=float, default=0.25)
    s.add_argument("--iou", type=float, default=0.45)
    s.add_argument("--max-dets", type=int, default=100)
    s.set_defaults(fn=cmd_detect)

    s = sub.add_parser("compile", help="ONNX -> .mars")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("-o", "--output", required=True)
    s.add_argument("--float32", action="store_true")
    s.add_argument("--nhwc", action="store_true")
    s.add_argument("-v", "--verbose", action="store_true")
    s.set_defaults(fn=cmd_compile)

    s = sub.add_parser("decompile", help=".mgk -> metadata/weights/onnx")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("--extract-weights", metavar="DIR")
    s.add_argument("--onnx", metavar="OUT.onnx",
                   help="export the decompiled model as ONNX")
    s.set_defaults(fn=cmd_decompile)

    s = sub.add_parser("gen-test", help="generate a test .mars model")
    s.add_argument("-o", "--output", default="test_model.mars")
    s.add_argument("--height", type=int, default=64)
    s.add_argument("--width", type=int, default=64)
    s.add_argument("--channels", type=int, default=3)
    s.add_argument("--out-channels", type=int, default=16)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_gen_test)

    s = sub.add_parser("quantize", help="PTQ: f32 .onnx/.mars -> int8 .mars")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("-o", "--output", required=True)
    s.add_argument("--images", metavar="DIR",
                   help="calibration image dir (resized, x/255)")
    s.add_argument("--calib", metavar="NPY",
                   help="calibration batches (.npy/.npz, NHWC float)")
    s.add_argument("--batches", type=int, default=8)
    s.add_argument("--method", choices=["percentile", "mse"],
                   default="percentile")
    s.add_argument("--percentile", type=float, default=99.99)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_quantize)

    s = sub.add_parser("export-onnx", help=".mars -> float32 ONNX")
    s.add_argument("-i", "--input", required=True)
    s.add_argument("-o", "--output", required=True)
    s.set_defaults(fn=cmd_export_onnx)

    s = sub.add_parser("bench", help="run the headline benchmark")
    s.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
