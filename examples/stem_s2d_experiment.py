#!/usr/bin/env python3
"""Full-pipeline measurement of the space-to-depth stem ingest.

The stem conv (6x6 s2 cin=3) + fused quantize is the single biggest op
in the fast-tier program (27.3 us/frame of 225 at b128). A fixed camera
feed can DMA the same bytes in space-to-depth order ([B,320,320,12],
2x2 pixel blocks flattened into channels) during the H2D transfer, so
the device sees a 3x3 s1 cin=12 conv — identical FLOPs and im2col
width (108), but denser loads and no strided 6x6 window walk.

Variant `s2d` rewrites the zoo graph's stem node (kernel/stride/pad +
reshaped weights) and ingests s2d frames batch-minor.
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
    return frames.shape[0] * iters / (time.perf_counter() - t0), out


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from thingino_accel_tpu.models import yolo, zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.runtime.ingest import ingest

    bench._enable_compile_cache()
    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))

    pipeline, frames = bench.build_pipeline(batch, "s")
    fps, base_out = measure(pipeline, frames)
    print(f"base: {fps:,.1f} fps")

    # --- s2d variant ---------------------------------------------------
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(640, 640))
    graph = zoo.build_yolov5("s", cfg)
    in_name = graph.inputs[0]
    stem = next(n for n in graph.nodes
                if n.op == "CONV2D" and n.inputs[0] == in_name)
    wname = stem.inputs[1]
    wt = graph.tensors[wname]
    w = wt.data                       # OIHW [32, 3, 6, 6]
    o, ci, kh, kw = w.shape
    assert (kh, kw) == (6, 6) and stem.attrs["stride"] == (2, 2), stem
    # OIHW 6x6c3 -> 3x3c12: split each 6-tap axis into (3 blocks, 2 phase)
    w12 = w.reshape(o, ci, 3, 2, 3, 2).transpose(0, 3, 5, 1, 2, 4) \
        .reshape(o, 12, 3, 3)
    wt.data = np.ascontiguousarray(w12)
    wt.shape = tuple(w12.shape)
    stem.attrs["kernel"] = (3, 3)
    stem.attrs["stride"] = (1, 1)
    in_t = graph.tensors[in_name]
    in_t.shape = (in_t.shape[0], 320, 320, 12)

    eng = Engine(graph, EngineOptions(
        precision="fast", accum_dtype=jnp.bfloat16, quantize_outputs=False))
    out_names = list(eng.graph.outputs)
    body, params = eng._fn, eng.params

    @jax.jit
    def pipe_s2d(frames_s2d_u8):
        x = yolo.quantize_input_int8(frames_s2d_u8, dtype=jnp.bfloat16)
        feats = body(params, {in_name: x})
        heads = [feats[k] for k in out_names]
        boxes, scores, classes = yolo.decode_and_parse(heads, scales=None)
        dets = yolo.nms_batched(boxes, scores, classes, max_dets=100)
        return dets.boxes, dets.scores, dets.classes, dets.valid

    raw = np.asarray(frames)          # [B, 640, 640, 3] u8
    s2d = np.ascontiguousarray(
        raw.reshape(batch, 320, 2, 320, 2, 3)
        .transpose(0, 1, 3, 2, 4, 5).reshape(batch, 320, 320, 12))
    fr = ingest(s2d)
    fps, s2d_out = measure(pipe_s2d, fr)
    print(f"s2d : {fps:,.1f} fps")

    # detection parity vs base (bf16 conv rounding may flip borderline
    # boxes; compare top-confidence boxes loosely)
    b0 = np.asarray(base_out[1])      # scores
    b1 = np.asarray(s2d_out[1])
    print("score parity: max|d|", np.abs(b0 - b1).max(),
          "mean", np.abs(b0 - b1).mean())


if __name__ == "__main__":
    main()
