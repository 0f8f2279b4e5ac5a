#!/usr/bin/env python3
"""Multi-device serving scaling: fps of the e2e sharded detector
(``parallel.make_sharded_detector``) vs device count.

Hardware context: this environment exposes ONE physical TPU chip, so
the committed numbers come from the virtual CPU mesh
(``--xla_force_host_platform_device_count``) — they measure the
SPMD *program structure* (weak scaling at fixed per-device batch;
collective-free per tests/test_parallel.py), not ICI silicon. The same
script runs unchanged on a real multi-chip slice.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/scaling_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_dev: int, per_dev_batch: int, hw, iters: int = 8) -> float:
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.parallel import make_mesh, make_sharded_detector
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    mesh = make_mesh(dp=n_dev, devices=jax.devices()[:n_dev])
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=hw))
    eng = Engine(g, EngineOptions(precision="fast"))
    fn, sp = make_sharded_detector(eng, mesh, max_dets=10)
    b = n_dev * per_dev_batch
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (b, hw[0] - 16, hw[1], 3), dtype=np.uint8))
    jax.block_until_ready(fn(sp, frames))          # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(sp, frames)
    jax.block_until_ready(out)
    return b * iters / (time.perf_counter() - t0)


def main() -> int:
    import jax
    avail = len(jax.devices())
    per_dev_batch = int(os.environ.get("TAT_SCALE_BATCH", "4"))
    hw = (96, 96)
    counts = [n for n in (1, 2, 4, 8) if n <= avail]
    print(f"devices available: {avail} ({jax.devices()[0].platform}); "
          f"per-device batch {per_dev_batch}, yolov5n@{hw[0]}")
    base = None
    print("| devices | total batch | fps | speedup | efficiency |")
    print("|---|---|---|---|---|")
    for n in counts:
        fps = measure(n, per_dev_batch, hw)
        base = base or fps
        print(f"| {n} | {n * per_dev_batch} | {fps:,.0f} | "
              f"{fps / base:.2f}x | {fps / base / n * 100:.0f}% |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
