#!/usr/bin/env python3
"""Measure the BASELINE.json progression configs on hardware.

Configs (BASELINE.md "Build target"):
  1. tiny_160_f32.mars        — single-conv-stack f32 net @160
  2. tiny_160_int8.mars       — int8 stack with requantization
  3. nanodet-320 architecture — depthwise detector (not bundled as
     .mars; zoo-built with generated weights, like the yolov5s bench)
  4. yolov5n_int8.mars        — bundled real-weight model, full e2e
  5. yolov5s e2e              — the headline bench (bench.py)

Prints a table of frames/sec/chip (fast tier, batch where sensible).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fps_of(fn, xs, batch, iters=20):
    import jax
    for x in xs:
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(xs[i % len(xs)])
    jax.block_until_ready(out)
    return batch * iters / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from thingino_accel_tpu.models import yolo, zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.ir.graph import from_mars

    rng = np.random.default_rng(0)
    rows = []

    def run_model(tag, graph, batch, in_hw, cin=3, dtype=np.int8,
                  precision="fast"):
        opts = EngineOptions(precision=precision,
                             accum_dtype=jnp.bfloat16) \
            if precision == "fast" else EngineOptions(precision=precision)
        eng = Engine(graph, opts)
        name = eng.graph.inputs[0]
        outs = list(eng.graph.outputs)
        body, params = eng._fn, eng.params

        @jax.jit
        def fwd(x):
            return body(params, {name: x})[outs[0]]

        xs = [jnp.asarray(rng.integers(-128, 128,
                                       (batch,) + in_hw + (cin,),
                                       dtype=dtype))
              if dtype == np.int8 else
              jnp.asarray(rng.normal(size=(batch,) + in_hw + (cin,))
                          .astype(np.float32))
              for _ in range(3)]
        f = fps_of(fwd, xs, batch)
        rows.append((tag, batch, f))
        print(f"  {tag:<42} b{batch:<4} {f:10,.0f} fps")

    mdir = "/root/reference/models"
    if os.path.exists(f"{mdir}/tiny_160_f32.mars"):
        g = from_mars(M.read_mars(f"{mdir}/tiny_160_f32.mars"))
        run_model("1. tiny_160_f32.mars (bundled)", g, 256, (160, 160),
                  dtype=np.float32, precision="fast")
        g = from_mars(M.read_mars(f"{mdir}/tiny_160_int8.mars"))
        run_model("2. tiny_160_int8.mars (bundled)", g, 256, (160, 160))
        run_model("2b. tiny_160_int8 exact tier", g, 256, (160, 160),
                  precision="exact")

    g = zoo.build_nanodet(zoo.ZooConfig(dtype="int8", in_hw=(320, 320)))
    run_model("3. nanodet-320 (zoo, depthwise)", g, 256, (320, 320))

    if os.path.exists(f"{mdir}/yolov5n_int8.mars"):
        g = from_mars(M.read_mars(f"{mdir}/yolov5n_int8.mars"))
        outs = __import__(
            "thingino_accel_tpu.models.yolo", fromlist=["yolo"]
        ).find_detect_outputs(g)
        if outs:
            g = g.with_outputs(outs)
        run_model("4. yolov5n_int8.mars (bundled, real wts)", g, 128,
                  (640, 640))

    print("  5. yolov5s e2e incl. decode+NMS = bench.py (4,009 fps)")


if __name__ == "__main__":
    main()
