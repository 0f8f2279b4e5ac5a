#!/usr/bin/env python3
"""Batched multi-stream serving demo: S camera streams through one
engine with double-buffered feeding, fps + latency report.

The scale-out story the single-process reference can't express
(SURVEY §2.7): one device, many streams, one jitted program.
"""

import sys

import numpy as np


def main() -> int:
    import jax
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.runtime.serving import (
        MultiStreamBatcher, StreamServer,
    )

    streams, frames_each, batch = 4, 8, 8
    hw = (96, 96)
    n_dev = len(jax.devices())
    print(f"[1] Engine: yolov5n int8 (fast tier) @ {hw} "
          f"({n_dev} device{'s' if n_dev > 1 else ''})")
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=hw))
    eng = Engine(g, EngineOptions(precision="fast"))
    in_name = g.inputs[0]
    if n_dev > 1 and batch % n_dev == 0:
        # multi-chip: dp-shard each served batch over the mesh
        # (collective-free postprocess — docs/SCALING.md)
        from thingino_accel_tpu.parallel import (
            make_mesh, make_sharded_forward,
        )
        mesh = make_mesh(dp=n_dev)
        sfn, sparams = make_sharded_forward(eng, mesh)
        fn = lambda x: sfn(sparams, {in_name: x})  # noqa: E731
    else:
        body, params = eng._fn, eng.params
        fn = jax.jit(lambda x: body(params, {in_name: x}))

    print(f"[2] {streams} streams x {frames_each} frames, batch {batch}")
    rng = np.random.default_rng(0)

    def stream(_):
        for _ in range(frames_each):
            yield rng.integers(-128, 128, (*hw, 3), dtype=np.int8)

    # warm up (compile) outside the timed run — through the tunneled
    # runtime the first dispatch costs minutes, not microseconds
    warm = rng.integers(-128, 128, (batch, *hw, 3), dtype=np.int8)
    jax.block_until_ready(fn(warm))

    batcher = MultiStreamBatcher(streams, batch)
    from thingino_accel_tpu.runtime.ingest import batch_minor_format
    server = StreamServer(fn, depth=2, ingest_format=batch_minor_format())
    n_out = sum(1 for _ in server.run(
        batcher.batches([stream(s) for s in range(streams)])))

    print(f"[3] {n_out} batches served")
    print("    " + server.stats.summary())
    ok = server.stats.frames >= streams * frames_each
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
