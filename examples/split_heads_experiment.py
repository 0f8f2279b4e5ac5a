#!/usr/bin/env python3
"""Split the detect convs per anchor: 3x [B,H,W,85] heads instead of
one [B,H,W,255].

The remaining e2e tail has a 10 us/frame relayout copy on the 80x80
head: the detect conv writes C-minor, decode's (3, 85) lane-splitting
reshape wants B-minor. Per-anchor 85-channel heads need NO reshape —
and an 85-wide conv output may get the batch-in-lanes emitter (B-minor
output), which is exactly the layout decode wants.

Risk: if XLA keeps C-minor for the 85-wide heads, the physical lane
pad (85 -> 128) costs +50% head HBM vs the packed 255 (-> 2x128).
Measure, don't guess.
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
    from thingino_accel_tpu.ir.graph import Node, TensorInfo
    from thingino_accel_tpu.ir.passes import stem_space_to_depth
    from thingino_accel_tpu.models import yolo, zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.runtime.ingest import ingest

    bench._enable_compile_cache()
    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))

    pipeline, frames = bench.build_pipeline(batch, "s")
    fps, _ = measure(pipeline, frames)
    print(f"base (s2d, packed heads): {fps:,.1f} fps", flush=True)

    # --- split-head variant -------------------------------------------
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(640, 640))
    graph = zoo.build_yolov5("s", cfg)
    stem_space_to_depth(graph)

    a, step = 3, 85
    new_outputs = []
    for out_name in list(graph.outputs):
        node = next(n for n in graph.nodes if out_name in n.outputs)
        wt = graph.tensors[node.inputs[1]]
        w = wt.data                      # OIHW [255, C, 1, 1]
        bias_name = node.inputs[2] if len(node.inputs) > 2 else None
        out_t = graph.tensors[out_name]
        b_, h, wdt, _ = out_t.shape
        for anc in range(a):
            sl = slice(anc * step, (anc + 1) * step)
            wn = f"{node.inputs[1]}_a{anc}"
            graph.tensors[wn] = TensorInfo(
                name=wn, shape=(step,) + wt.shape[1:], dtype=wt.dtype,
                quant=wt.quant, data=np.ascontiguousarray(w[sl]))
            ins = [node.inputs[0], wn]
            if bias_name is not None:
                bn = f"{bias_name}_a{anc}"
                bt = graph.tensors[bias_name]
                graph.tensors[bn] = TensorInfo(
                    name=bn, shape=(step,), dtype=bt.dtype,
                    data=np.ascontiguousarray(bt.data[sl]))
                ins.append(bn)
            on = f"{out_name}_a{anc}"
            graph.tensors[on] = TensorInfo(
                name=on, shape=(b_, h, wdt, step), dtype=out_t.dtype,
                quant=out_t.quant)
            graph.nodes.append(Node(
                op="CONV2D", inputs=ins, outputs=[on],
                attrs=dict(node.attrs)))
            new_outputs.append(on)
    graph.outputs = new_outputs
    graph.nodes = [n for n in graph.nodes
                   if not (set(n.outputs) & set(
                       o[:-3] for o in new_outputs))]
    graph.validate()

    eng = Engine(graph, EngineOptions(
        precision="fast", accum_dtype=jnp.bfloat16, quantize_outputs=False))
    in_name = eng.graph.inputs[0]
    body, params = eng._fn, eng.params
    anchors, strides = yolo.YOLOV5_ANCHORS, yolo.YOLOV5_STRIDES

    @jax.jit
    def pipe_split(frames_u8):
        x = yolo.quantize_input_int8(frames_u8, dtype=jnp.bfloat16)
        feats = body(params, {in_name: x})
        all_boxes, all_conf, all_cls = [], [], []
        for lvl in range(3):
            anc_b, anc_c, anc_k = [], [], []
            for anc in range(a):
                f = feats[new_outputs[lvl * a + anc]]
                bq, h, wdt, _ = f.shape
                x5 = f[..., 0:5].astype(jnp.float32)
                sig5 = jax.nn.sigmoid(x5)
                gy = jax.lax.broadcasted_iota(jnp.float32, (h, wdt), 0)
                gx = jax.lax.broadcasted_iota(jnp.float32, (h, wdt), 1)
                grid = jnp.stack([gx, gy], axis=-1)
                xy = (sig5[..., 0:2] * 2.0 - 0.5 + grid) * \
                    jnp.float32(strides[lvl])
                wh = jnp.square(sig5[..., 2:4] * 2.0) * \
                    jnp.asarray(anchors[lvl][anc], jnp.float32)
                obj = sig5[..., 4]
                cls_logits = f[..., 5:]
                best = jnp.max(cls_logits, axis=-1).astype(jnp.float32)
                cls = jnp.argmax(cls_logits, axis=-1).astype(jnp.int32)
                conf = obj * jax.nn.sigmoid(best)
                hw = h * wdt
                anc_b.append(jnp.concatenate([xy, wh], -1)
                             .reshape(bq, hw, 4))
                anc_c.append(conf.reshape(bq, hw))
                anc_k.append(cls.reshape(bq, hw))
            n = hw * a
            all_boxes.append(jnp.stack(anc_b, axis=2).reshape(bq, n, 4))
            all_conf.append(jnp.stack(anc_c, axis=2).reshape(bq, n))
            all_cls.append(jnp.stack(anc_k, axis=2).reshape(bq, n))
        boxes = jnp.concatenate(all_boxes, 1)
        conf = jnp.concatenate(all_conf, 1)
        cls = jnp.concatenate(all_cls, 1)
        dets = yolo.nms_batched(boxes, conf, cls, max_dets=100)
        return dets.boxes, dets.scores, dets.classes, dets.valid

    raw = np.asarray(frames)
    fps, _ = measure(pipe_split, ingest(raw))
    print(f"split heads (3x85):       {fps:,.1f} fps", flush=True)


if __name__ == "__main__":
    main()
