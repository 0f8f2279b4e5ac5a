#!/usr/bin/env python3
"""MXU issue-rate ceiling probe: chained VMEM-resident dots.

The round-3 verdict asked for one serious falsification attempt at the
"XLA conv roofline" ceiling (fast tier: ~186 of 225 us/frame is XLA's
bf16 conv time; 10k fps needs int8-rate MXU throughput). The serving
tier's int8 Pallas kernels average ~65 T/s at whole-model scale vs
XLA bf16's ~88 T/s — yet the chip's int8 peak (394 TOPS) is 2x bf16
(197 TFLOPS). Question: is the int8 MXU rate reachable AT ALL from
Pallas/Mosaic on this chip, or is the observed rate an issue-width
limit that no kernel restructuring can beat?

This probe removes every other variable: x stays in VMEM, L weight
matrices stay in VMEM, the kernel issues L chained dots per grid cell
with the cheapest possible inter-dot glue (shift + int8 cast, or bf16
cast). Zero HBM traffic in the timed loop beyond the first tile load.
Whatever T/s this reports is the ceiling ANY fused megakernel
(bottleneck, C3, whole-stage) could reach with the same dot shapes.

Decision rule (docs/KERNELS.md gets the numbers either way):
- chained int8 >> chained bf16  -> the serving tier's gap is kernel
  structure; a C3 megakernel with these layouts is worth building.
- chained int8 <= chained bf16  -> int8 MXU rate is not reachable via
  Mosaic dots here; the bf16 fast tier IS the right design and the
  roofline argument stands (falsification attempted, survived).

Run on TPU: python examples/mxu_ceiling_probe.py
CPU check:  TAT_INTERPRET=1 python examples/mxu_ceiling_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get("TAT_INTERPRET") == "1"


def _chain_kernel_int8(x_ref, w_ref, out_ref, *, L: int):
    """L chained int8 dots; inter-dot glue = >>7 + int8 cast (VPU)."""
    x = x_ref[...]
    for i in range(L):
        acc = jax.lax.dot_general(
            x, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = (acc >> 7).astype(jnp.int8)
    out_ref[...] = x


def _chain_kernel_bf16(x_ref, w_ref, out_ref, *, L: int):
    """Same chain in bf16 (f32 accum, bf16 stage exits)."""
    x = x_ref[...]
    for i in range(L):
        acc = jax.lax.dot_general(
            x, w_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = (acc * (1.0 / 128.0)).astype(jnp.bfloat16)
    out_ref[...] = x


def _chain_kernel_int4w(x_ref, w_ref, out_ref, *, L: int):
    """int8 activations x int4 weights (the reference platform's own
    weight width; v5e int4 peak ~794 TOPS)."""
    x = x_ref[...]
    for i in range(L):
        acc = jax.lax.dot_general(
            x, w_ref[i].astype(jnp.int4), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        x = (acc >> 5).astype(jnp.int8)
    out_ref[...] = x


def _chain_kernel_int8_in_bf16_dot(x_ref, w_ref, out_ref, *, L: int):
    """int8 storage, bf16 MXU compute (the round-3 serving experiment
    at zero-glue conditions)."""
    x = x_ref[...]
    for i in range(L):
        acc = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w_ref[i].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = jnp.clip(acc * (1.0 / 128.0), -127, 127).astype(jnp.int8)
    out_ref[...] = x


def build(kind: str, m: int, k: int, L: int, grid: int):
    if kind == "int8":
        kernel, xdt, wdt = _chain_kernel_int8, jnp.int8, jnp.int8
    elif kind == "bf16":
        kernel, xdt, wdt = _chain_kernel_bf16, jnp.bfloat16, jnp.bfloat16
    elif kind == "int4w":
        kernel, xdt, wdt = _chain_kernel_int4w, jnp.int8, jnp.int8
    else:
        kernel, xdt, wdt = _chain_kernel_int8_in_bf16_dot, jnp.int8, jnp.int8
    fn = pl.pallas_call(
        functools.partial(kernel, L=L),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (i, 0)),
            pl.BlockSpec((L, k, k), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((m, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m * grid, k), xdt),
        interpret=INTERPRET,
    )
    rng = np.random.default_rng(0)
    if kind == "bf16":
        x = jnp.asarray(rng.normal(size=(m * grid, k)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(L, k, k)) * 0.05, jnp.bfloat16)
    else:
        x = jnp.asarray(rng.integers(-100, 100, (m * grid, k)), jnp.int8)
        w = jnp.asarray(rng.integers(-100, 100, (L, k, k)), jnp.int8)
    return jax.jit(fn), x, w


def xla_chain(m: int, k: int, L: int, grid: int):
    """XLA bf16 baseline: the same chained matmuls, no pallas."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(m * grid, k)), jnp.bfloat16)
    ws = jnp.asarray(rng.normal(size=(L, k, k)) * 0.05, jnp.bfloat16)

    @jax.jit
    def f(x, ws):
        def body(x, w):
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return (acc * (1.0 / 128.0)).astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, ws)
        return y
    return f, x, ws


def xla_int8_chain(m: int, k: int, L: int, grid: int):
    """XLA int8 chain, no pallas: the exact tier's shift+matmul MXU
    path (ops/reference.py:conv2d_int8_raw) at zero-glue conditions.
    If THIS reaches int8 rate, a turbo-int8 tier (int8 storage, XLA
    dots, cheap requant) halves the fast tier's HBM bytes without
    Mosaic kernel authorship."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (m * grid, k)), jnp.int8)
    ws = jnp.asarray(rng.integers(-100, 100, (L, k, k)), jnp.int8)

    @jax.jit
    def f(x, ws):
        def body(x, w):
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (acc >> 7).astype(jnp.int8), None
        y, _ = jax.lax.scan(body, x, ws)
        return y
    return f, x, ws


def measure(fn, args, tops_per_call: float, iters: int = 30) -> float:
    """Round-2 protocol (docs/KERNELS.md "Measurement protocol"): chain
    iterations inside ONE jit via lax.scan with a data dependency
    between them, return a scalar, and subtract the empty-chain
    baseline. The first landed version of this probe used the
    repeat-dispatch loop instead and reported up-to-11x-over-peak
    numbers (block_until_ready through the relay returns before
    materialization) — those are void."""
    x, w = args

    def chained(n):
        @jax.jit
        def g(x, w):
            def body(c, _):
                return fn(c, w), None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(jnp.abs(y.astype(jnp.float32)))
        return g

    g0, gN = chained(0), chained(iters)
    for g in (g0, gN):            # compile + one warm run each
        float(g(x, w))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g0(x, w))
    base = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(gN(x, w))
    full = (time.perf_counter() - t0) / reps
    dt = max(full - base, 1e-9)
    return tops_per_call * iters / dt


def main() -> int:
    m, L, grid = 1024, 8, 32
    iters = 5 if INTERPRET else 30
    print(f"# chain probe: M={m}/tile x {grid} tiles, L={L} dots, "
          f"K=N swept; T/s = 2*M*K*N*L*grid / time")
    print(f"{'K=N':>6} {'pallas-int8':>12} {'pallas-bf16':>12} "
          f"{'i8-store/bf16-dot':>18} {'int4-w':>8} {'xla-bf16':>10} "
          f"{'xla-int8':>10}")
    for k in ((128, 256, 512) if not INTERPRET else (128,)):
        ops = 2.0 * m * k * k * L * grid / 1e12
        row = []
        for kind in ("int8", "bf16", "mixed", "int4w"):
            try:
                fn, x, w = build(kind, m, k, L, grid)
                row.append(measure(fn, (x, w), ops, iters))
            except Exception as e:   # int4 dots may be unsupported
                print(f"# {kind} K={k} failed: "
                      f"{type(e).__name__}: {str(e)[:80]}",
                      file=sys.stderr)
                row.append(float("nan"))
        fn, x, w = xla_chain(m, k, L, grid)
        row.append(measure(fn, (x, w), ops, iters))
        fn, x, w = xla_int8_chain(m, k, L, grid)
        row.append(measure(fn, (x, w), ops, iters))
        print(f"{k:>6} {row[0]:>11.1f}T {row[1]:>11.1f}T "
              f"{row[2]:>17.1f}T {row[3]:>7.1f}T {row[4]:>9.1f}T "
              f"{row[5]:>9.1f}T")
    print("# peaks, one v5e: int8 394 T/s, bf16 197 T/s, int4 ~794 T/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
