#!/usr/bin/env python3
"""Whole-model timing-protocol A/B: repeat-dispatch vs in-jit scan chain.

docs/KERNELS.md (round-2 "Measurement protocol") established that
through this relay, ``block_until_ready`` can return before
materialization and repeat calls with identical args can pipeline
misleadingly — micro-benches must chain iterations inside one jit with
a data dependency and subtract the empty-chain baseline. The round-4
mxu_ceiling_probe reproduced the failure mode at kernel scale
(up to 11x-over-peak "throughput" from the repeat loop).

bench.py's headline, however, still uses the repeat-dispatch loop at
WHOLE-MODEL scale (~29 ms device time per call at b128), where dispatch
pipelining should be negligible relative to execution. This A/B
validates that assumption by timing the same yolov5s pipeline both
ways:

  repeat   bench.py's protocol: N dispatches, block on the last output
  chained  N iterations inside one jit via lax.scan; each iteration
           pokes one input pixel with (sum(valid) & 1) so XLA cannot
           reorder or elide any pipeline call; scalar return; empty-
           chain (length=0) baseline subtracted

Agreement within ~5% validates the headline protocol (and every
BENCH_LKG row); a large gap means the headline numbers are inflated
and bench.py must switch to the chained protocol.

Run on TPU: python examples/bench_fence_ab.py [batch] [iters]
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import bench as B
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    pipeline, frames = B.build_pipeline(batch, "s")

    # --- (a) repeat-dispatch, bench.py style --------------------------------
    out = pipeline(frames)
    jax.block_until_ready(out)
    out = pipeline(frames)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(frames)
    jax.block_until_ready(out)
    dt_repeat = time.perf_counter() - t0
    fps_repeat = batch * iters / dt_repeat

    # --- (b) in-jit scan chain with a data dependency -----------------------
    def chained(n):
        @jax.jit
        def g(fr):
            def body(c, _):
                _boxes, _scores, _classes, valid = pipeline(c)
                poke = (jnp.sum(valid).astype(jnp.int32) & 1).astype(c.dtype)
                c = c.at[(0,) * c.ndim].add(poke)
                return c, None
            y, _ = jax.lax.scan(body, fr, None, length=n)
            # scalar read of the poked element: depends on every
            # iteration's pipeline output, so nothing can be elided
            return y[(0,) * y.ndim].astype(jnp.float32)
        return g

    g0, gN = chained(0), chained(iters)
    for g in (g0, gN):
        float(g(frames))          # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g0(frames))
    base = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(gN(frames))
    full = (time.perf_counter() - t0) / reps
    dt_chain = max(full - base, 1e-9)
    fps_chain = batch * iters / dt_chain

    ratio = fps_repeat / fps_chain
    print(f"# yolov5s b{batch}, {iters} iters")
    print(f"repeat-dispatch: {fps_repeat:8.1f} fps   "
          f"({dt_repeat / iters * 1e3:.2f} ms/call)")
    print(f"scan-chained:    {fps_chain:8.1f} fps   "
          f"({dt_chain / iters * 1e3:.2f} ms/call, "
          f"baseline {base * 1e3:.1f} ms)")
    print(f"ratio repeat/chained = {ratio:.3f}  -> "
          + ("protocol VALIDATED (within 5%)" if abs(ratio - 1) < 0.05
             else "headline protocol INFLATED/OFF — switch bench.py to "
                  "the chained protocol"))
    return 0


if __name__ == "__main__":
    sys.exit(main())
