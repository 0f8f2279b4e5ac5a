#!/usr/bin/env python3
"""Serving-tier generality sweep: fps + closeness-vs-exact for several
architectures (VERDICT r2 item 7 — the fold planner / epilogue fusions
are pattern-matched on yolov5; this proves them on depthwise
(nanodet), plain-convnet (tiny), and yolov5 zoo variants).

Timing: fenced loop over distinct device buffers (the whole-model
protocol of docs/KERNELS.md). Closeness: max |serving - exact| in
quanta on a random int8 input (nanodet/tiny are LEAKY/RELU nets —
bit-exact contract; yolov5 is SiLU — ≤ small quant noise).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(g, batch: int, iters: int = 15):
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    in_name = g.inputs[0]
    shp = (batch,) + tuple(g.tensors[in_name].shape[1:])
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.integers(-100, 100, shp, np.int8))
          for _ in range(3)]
    rows = {}
    outs = {}
    for tier in ("exact", "serving", "fast"):
        eng = Engine(g, EngineOptions(precision=tier))
        fn = jax.jit(lambda x, f=eng._fn, p=eng.params:
                     f(p, {in_name: x}))
        for x in xs:
            jax.block_until_ready(fn(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            for x in xs:
                o = fn(x)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / (iters * 3)
        rows[tier] = batch / dt
        outs[tier] = {k: np.asarray(v) for k, v in fn(xs[0]).items()}
    diffs = [np.abs(outs["exact"][k].astype(np.int32)
                    - outs["serving"][k].astype(np.int32)).max()
             for k in outs["exact"]]
    return rows, int(max(diffs))


def main() -> int:
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    models = [
        ("yolov5n@320", zoo.build_yolov5(
            "n", zoo.ZooConfig(dtype="int8", in_hw=(320, 320))), 64),
        ("nanodet@320", zoo.build_nanodet(
            zoo.ZooConfig(dtype="int8", in_hw=(320, 320))), 64),
        ("tiny@160", zoo.build_tiny(
            zoo.ZooConfig(dtype="int8", in_hw=(160, 160)),
            in_hw=(160, 160)), 256),
    ]
    print("| model | exact fps | serving fps | fast fps | "
          "max |serv-exact| quanta |")
    print("|---|---|---|---|---|")
    for name, g, batch in models:
        rows, d = measure(g, batch)
        print(f"| {name} (b{batch}) | {rows['exact']:,.0f} | "
              f"{rows['serving']:,.0f} | {rows['fast']:,.0f} | {d} |",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
