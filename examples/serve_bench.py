#!/usr/bin/env python3
"""Sustained serving benchmark: host->device ingest overlapped with compute.

``bench.py``'s fenced loop times the compiled program over
DEVICE-RESIDENT buffers — the program-time ceiling. Production serving
must also FEED the device every batch. This bench runs the identical
e2e pipeline (letterbox + quantize + backbone + decode + NMS) through
``StreamServer`` with distinct HOST batches cycling through the feed,
at pipeline depth 1 (serialized H2D -> compute) vs 2 and 3
(double-/triple-buffered), and prints sustained fps + batch latency
per depth, plus the device-resident ceiling from the same pipeline.

How to read the numbers:
- The depth-1 -> depth-2 RATIO is the framework claim: H2D transfer of
  batch N+1 overlaps device compute of batch N (the TPU analog of the
  reference's ping-pong NNDMA descriptor feed,
  ``soc-nna/soc_nna_main.c:320-426``).
- On the tunneled dev chip the ABSOLUTE sustained fps can be bound by
  the tunnel's network H2D bandwidth, which a production host-attached
  chip does not have; the ceiling row tells you which regime you're in.
- Frames are uint8 camera bytes (1 B/px), pre-packed in s2d block
  order when the stem rewrite is on — the camera-DMA write order
  (docs/KERNELS.md "Space-to-depth stem ingest").

Env knobs: the TAT_BENCH_* family (bench.py), plus
  TAT_SERVE_ITERS   batches per depth measurement (default 20)
  TAT_SERVE_DEPTHS  comma list (default "1,2,3")
"""

import os
import sys
import time

import numpy as np

# bench.py lives at the repo root, not in examples/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import bench

    bench._wait_for_backend()
    bench._enable_compile_cache()

    import jax
    from thingino_accel_tpu.runtime.ingest import batch_minor_format
    from thingino_accel_tpu.runtime.serving import StreamServer

    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))
    size = os.environ.get("TAT_BENCH_MODEL", "s")
    iters = int(os.environ.get("TAT_SERVE_ITERS", "20"))
    depths = [int(d) for d in
              os.environ.get("TAT_SERVE_DEPTHS", "1,2,3").split(",")]

    pipeline, frames, raw = bench.build_pipeline(batch, size,
                                                 return_raw=True)
    out = pipeline(frames)            # compile + warmup
    jax.block_until_ready(out)

    # device-resident ceiling (same protocol as bench.measure)
    out = pipeline(frames)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(frames)
    jax.block_until_ready(out)
    ceiling = batch * iters / (time.perf_counter() - t0)
    print(f"device-resident ceiling: {ceiling:.1f} fps "
          f"(batch {batch} x {iters})")

    # distinct host buffers so every submit is a real H2D transfer
    pool = [raw, raw.copy(), raw.copy()]
    mb = raw.nbytes / 1e6

    for depth in depths:
        server = StreamServer(pipeline, depth=depth,
                              ingest_format=batch_minor_format())
        for _ in server.run(pool[i % len(pool)] for i in range(iters)):
            pass
        s = server.stats
        print(f"depth {depth}: {s.fps:.1f} fps sustained "
              f"({s.fps / ceiling * 100:.0f}% of ceiling; "
              f"{mb:.0f} MB/batch H2D; "
              f"p50 {s.latency_ms(50):.1f} ms / "
              f"p99 {s.latency_ms(99):.1f} ms batch latency)")
        if s.errors:
            print(f"  !! {s.errors} failed batches")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
