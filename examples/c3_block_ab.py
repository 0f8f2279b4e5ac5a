#!/usr/bin/env python3
"""Isolated C3-block A/B: XLA bf16 fusion vs the fused Pallas int8 path.

Companion to examples/mxu_ceiling_probe.py for the round-3 verdict's
falsification item: the whole-model numbers (fast 4,389 fps vs serving
2,252) mix kernel rate with glue; this isolates ONE C3 block — the
structure the megakernel argument is about (1x1 -> [1x1 -> 3x3 (+add)]
x n -> concat -> 1x1) — at the two yolov5s@640 shapes where the fast
tier spends most of its conv time. The serving engine runs the C3
bottlenecks as fused Pallas chains with VMEM-resident intermediates
(ops/fused_kernels.bottleneck_int8_fused, incl. the round-3 pair
fusion), i.e. exactly the "multi-layer fused megakernel" whose isolated
rate the verdict asked for.

Interpretation: if serving's fused chains beat XLA bf16 here, the
whole-model gap is glue and deeper whole-stage fusion moves the
ceiling; if XLA wins even isolated, the megakernel path cannot reach
10k and the bf16 fast tier stands (falsification attempted, survived).

Run on TPU: python examples/c3_block_ab.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_c3_graph(hw: int, c: int, n: int, dtype: str):
    from thingino_accel_tpu.models import zoo
    cfg = zoo.ZooConfig(dtype=dtype, in_hw=(hw, hw))
    b = zoo.GraphBuilder(f"c3_{hw}x{c}", cfg)
    x = b.input("input", (1, hw, hw, c))
    y = zoo._c3(b, x, c, n, shortcut=True)
    return b.finish([y])


def bench(graph, precision: str, batch: int, iters: int = 30):
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    accum = jnp.bfloat16 if precision == "fast" else None
    eng = Engine(graph, EngineOptions(
        precision=precision, accum_dtype=accum,
        quantize_outputs=(precision != "fast")))
    in_name = graph.inputs[0]
    shape = (batch,) + tuple(graph.tensors[in_name].shape[1:])
    rng = np.random.default_rng(0)
    if precision == "fast":
        xs = [jnp.asarray(rng.integers(-100, 100, shape), jnp.bfloat16)
              for _ in range(3)]
    else:
        xs = [jnp.asarray(rng.integers(-100, 100, shape), jnp.int8)
              for _ in range(3)]
    # round-2 protocol (docs/KERNELS.md): in-jit scan chain with a data
    # dependency (C3 preserves shape+dtype, so the block output IS the
    # next input), scalar return, empty-chain baseline subtracted. The
    # repeat-dispatch loop this replaced can return before
    # materialization through the relay.
    def chained(n):
        @jax.jit
        def g(x):
            def body(c, _):
                out = eng._fn(eng.params, {in_name: c})
                return next(iter(out.values())), None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(jnp.abs(y.astype(jnp.float32)))
        return g

    g0, gN = chained(0), chained(iters)
    for g in (g0, gN):
        float(g(xs[0]))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g0(xs[0]))
    base = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(gN(xs[0]))
    full = (time.perf_counter() - t0) / reps
    us = max(full - base, 1e-9) / iters / batch * 1e6
    return us


def main() -> int:
    import jax
    from thingino_accel_tpu.ir.graph import count_macs
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print(f"# one C3 block, batch {batch}, fenced-loop us/frame "
          f"(v5s@640 shapes; n = block depth)")
    print(f"{'shape':>16} {'GFLOP/f':>8} {'fast bf16':>10} "
          f"{'serving int8':>13} {'fast T/s':>9} {'serv T/s':>9}")
    for hw, c, n in ((80, 128, 2), (40, 256, 3)):
        g8 = build_c3_graph(hw, c, n, "int8")
        macs = count_macs(g8)
        flops = 2.0 * macs / 1e9
        t_fast = bench(build_c3_graph(hw, c, n, "int8"), "fast", batch)
        t_serv = bench(g8, "serving", batch)
        print(f"{hw}x{hw}x{c} n={n:>2} {flops:>8.3f} {t_fast:>9.2f}u "
              f"{t_serv:>12.2f}u "
              f"{flops * 1e3 / t_fast:>8.1f}T {flops * 1e3 / t_serv:>8.1f}T")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
