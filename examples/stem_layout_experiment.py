#!/usr/bin/env python3
"""Measure variants of the bench pipeline's input-edge layout handling.

The profiled tail has a 9 us/frame relayout copy at the stem conv's
input: the letterbox+quantize fusion writes [B,640,640,3] bf16 in the
default row-major layout, and XLA's chosen stem emitter
(EmitInputBatchInLanes) wants {0,3,2,1} (batch in lanes). Variants:

  base    — current pipeline
  lc      — jax.experimental.layout.with_layout_constraint on the
            quantized input, forcing the batch-minor layout at the
            producer so the copy fuses/disappears
  inlay   — device_put the uint8 frames with the batch-minor layout
            (the "camera DMA writes the ingest layout" framing) and
            let jit consume it natively
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(pipeline, frames, iters=30):
    import jax
    out = pipeline(frames)
    jax.block_until_ready(out)
    out = pipeline(frames)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return frames.shape[0] * iters / dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import layout as XL

    import bench
    from thingino_accel_tpu.models import yolo, zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    bench._enable_compile_cache()
    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))

    pipeline, frames = bench.build_pipeline(batch, "s")
    fps = measure(pipeline, frames)
    print(f"base : {fps:,.1f} fps")

    cfg = zoo.ZooConfig(dtype="int8", in_hw=(640, 640))
    graph = zoo.build_yolov5("s", cfg)
    eng = Engine(graph, EngineOptions(
        precision="fast", accum_dtype=jnp.bfloat16,
        quantize_outputs=False))
    in_name = eng.graph.inputs[0]
    out_names = list(eng.graph.outputs)
    body, params = eng._fn, eng.params

    # variant lc: force the batch-minor layout at the quantize output
    from jax.sharding import SingleDeviceSharding
    sds = SingleDeviceSharding(jax.devices()[0])
    in_lay = XL.Layout(major_to_minor=(1, 2, 3, 0))
    # copy.147's target: {0,2,3,1} minor-to-major -> (1,3,2,0) major-to-minor
    head_lay = XL.Layout(major_to_minor=(1, 3, 2, 0))

    def make_pipe(in_lc=False, head_lc=False):
        @jax.jit
        def pipe(frames_u8):
            lb = yolo.letterbox_uint8(frames_u8, (640, 640))
            x = yolo.quantize_input_int8(lb, dtype=jnp.bfloat16)
            if in_lc:
                x = XL.with_layout_constraint(x, in_lay)
            feats = body(params, {in_name: x})
            heads = [feats[k] for k in out_names]
            if head_lc:
                heads = [XL.with_layout_constraint(h, head_lay)
                         for h in heads]
            boxes, scores, classes = yolo.decode_and_parse(
                heads, scales=None)
            dets = yolo.nms_batched(boxes, scores, classes, max_dets=100)
            return dets.boxes, dets.scores, dets.classes, dets.valid
        return pipe

    fr2 = jax.device_put(
        np.asarray(frames), XL.Format(in_lay, sds))

    for label, pipe, fr in [
        ("lc-in        ", make_pipe(in_lc=True), frames),
        ("head-lc      ", make_pipe(head_lc=True), frames),
        ("inlay+head-lc", make_pipe(head_lc=True), fr2),
        ("inlay        ", make_pipe(), fr2),
    ]:
        try:
            fps = measure(pipe, fr)
            print(f"{label}: {fps:,.1f} fps")
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
