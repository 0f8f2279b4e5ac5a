#!/usr/bin/env python3
"""Measure per-anchor split detect heads (ir/passes.split_detect_heads
+ models.yolo.decode_and_parse_split) against the packed-head bench
default.

Packed [B,H,W,255] heads pay a ~10 us/frame relayout copy where
decode's (3, 85) reshape splits the lane dim; per-anchor 85-channel
heads decode with plain channel slices. Counter-risk: if XLA keeps
C-minor layouts for the 85-wide outputs, the physical lane pad
(85 -> 128) adds +50% head HBM vs the packed 255 (-> 2x128).
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
    from thingino_accel_tpu.ir.passes import (
        split_detect_heads, stem_space_to_depth)
    from thingino_accel_tpu.models import yolo, zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.runtime.ingest import ingest

    bench._enable_compile_cache()
    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))

    pipeline, frames = bench.build_pipeline(batch, "s")
    fps, base_out = measure(pipeline, frames)
    print(f"base (s2d, packed heads): {fps:,.1f} fps", flush=True)

    cfg = zoo.ZooConfig(dtype="int8", in_hw=(640, 640))
    graph = zoo.build_yolov5("s", cfg)
    stem_space_to_depth(graph)
    groups = split_detect_heads(graph)
    assert len(groups) == 3 and all(len(g) == 3 for g in groups)

    eng = Engine(graph, EngineOptions(
        precision="fast", accum_dtype=jnp.bfloat16, quantize_outputs=False))
    in_name = eng.graph.inputs[0]
    body, params = eng._fn, eng.params

    @jax.jit
    def pipe_split(frames_u8):
        x = yolo.quantize_input_int8(frames_u8, dtype=jnp.bfloat16)
        feats = body(params, {in_name: x})
        fg = [[feats[n] for n in g] for g in groups]
        boxes, conf, cls = yolo.decode_and_parse_split(fg)
        dets = yolo.nms_batched(boxes, conf, cls, max_dets=100)
        return dets.boxes, dets.scores, dets.classes, dets.valid

    fps, split_out = measure(pipe_split, ingest(np.asarray(frames)))
    print(f"split heads (3x85):       {fps:,.1f} fps", flush=True)
    d = np.abs(np.asarray(base_out[1]) - np.asarray(split_out[1]))
    print(f"score parity vs base: max|d| {d.max():.6f}", flush=True)


if __name__ == "__main__":
    main()
