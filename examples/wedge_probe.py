#!/usr/bin/env python3
"""Characterize the post-failure device wedge with a program ladder.

Observed (2026-08-19): after a big program fails with the opaque
execute-time INVALID_ARGUMENT, subsequent BIG programs (e.g. the plain
yolov5s b128 pipeline that passes on a healthy device) also fail, while
a tiny ``ones((2,2)).sum()`` probe PASSES — so hw_queue's
probe-and-wait declared the device healthy when it wasn't. This ladder
finds the smallest program class that detects the wedge, so the
recovery probe can use it.

Each rung runs in a separate subprocess (the ladder itself must not
accumulate wedge state in one client). Rungs:

  tiny       ones((2,2)).sum()
  alloc-2g   fill + reduce a ~2 GiB HBM buffer
  matmul     8k x 8k bf16 dot chain (MXU, ~1 GiB)
  pallas     small pallas add kernel
  conv       one large bf16 conv (b128 x 80x80x128, 3x3)
  v5s-b128   the full headline pipeline via bench.build_pipeline

Usage: python examples/wedge_probe.py [--rung NAME]   (no arg = ladder)
"""

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUNGS = ["tiny", "alloc-2g", "matmul", "pallas", "conv", "v5s-b128"]


def run_rung(name: str) -> int:
    import jax
    import jax.numpy as jnp
    if name == "tiny":
        jnp.ones((2, 2)).sum().block_until_ready()
    elif name == "alloc-2g":
        x = jnp.ones((1024, 1024, 512), jnp.float32)      # 2 GiB
        float(jax.jit(lambda a: (a * 2).sum())(x))
    elif name == "matmul":
        x = jnp.ones((8192, 8192), jnp.bfloat16)

        @jax.jit
        def f(x):
            for _ in range(4):
                x = (x @ x) * 1e-4
            return x.sum()
        float(f(x))
    elif name == "pallas":
        from jax.experimental import pallas as pl

        def k(a_ref, o_ref):
            o_ref[...] = a_ref[...] + 1.0
        x = jnp.ones((256, 256), jnp.float32)
        y = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        jax.block_until_ready(y)
    elif name == "conv":
        x = jnp.ones((128, 80, 80, 128), jnp.bfloat16)
        w = jnp.ones((3, 3, 128, 128), jnp.bfloat16)
        y = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))(x, w)
        jax.block_until_ready(y)
    elif name == "v5s-b128":
        import bench
        from thingino_accel_tpu.utils.cache import enable_compile_cache
        enable_compile_cache()
        pipeline, frames = bench.build_pipeline(128, "s")
        jax.block_until_ready(pipeline(frames))
    else:
        raise SystemExit(f"unknown rung {name}")
    print(f"rung {name}: PASS")
    return 0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--rung":
        return run_rung(sys.argv[2])
    for name in RUNGS:
        t0 = time.monotonic()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--rung", name],
                cwd=ROOT, capture_output=True, text=True, timeout=900)
            ok = p.returncode == 0
            tail = (p.stdout + p.stderr).strip().splitlines()
            detail = tail[-1] if tail else ""
        except subprocess.TimeoutExpired:
            ok, detail = False, "timeout"
        print(f"{name:10} {'PASS' if ok else 'FAIL':4} "
              f"({time.monotonic() - t0:5.1f}s)  {detail[:120]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
