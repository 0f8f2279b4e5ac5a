#!/usr/bin/env python3
"""Price the int8 C3 megakernel BEFORE building it.

The fixed-protocol ceiling probe (examples/mxu_ceiling_probe.py,
2026-08-19) measured chained VMEM-resident int8 dots at 463 T/s
(K=N=256) vs bf16 207 T/s — the committed decision rule's branch 1:
"the serving gap is kernel structure; build the deeper C3/whole-stage
megakernel". But the production C3 chain (examples/c3_block_ab.py)
reaches only 84.8 T/s at 40x40x256 — a 5.5x gap to the ceiling made of
exactly two structural costs, priced SEPARATELY here at ceiling
conditions (M~1024-row tiles, K=N, everything VMEM-resident):

  epilogue   the production per-channel requant epilogue
             (fused_kernels._epilogue: int32 acc + bias, f32
             per-channel scale, activation, half-away-from-zero round,
             clamp, int8 cast) instead of the probe's >>7 glue.
             Three activation flavors isolate the transcendental cost:
             SILU (sigmoid = exp + divide), SILU_FAST (polynomial),
             RELU (max only).
  taps       3x3 conv as 9 shifted-window dots on a VMEM tile — the
             halo structure every spatial conv in a megakernel needs.
             VALID-shrink chaining (each stage consumes a 1-px halo;
             Pallas TPU has no dynamic_update_slice so the first
             version's SAME-repad chain did not lower); the XLA-level
             repad between scan iterations costs ~bytes/819GB/s,
             subtracted via the empty-chain baseline... no — included,
             but it is <2% of a stage's MXU time at these shapes.

First hardware result (2026-08-19, before the 3x3 fix): the SILU
epilogue alone cuts chained int8 from 361 T/s to 120 T/s at K=512 —
the epilogue, not the taps, is the leading suspect for the serving
tier's structure gap.

Contenders (fenced-loop, empty-chain baseline subtracted):
  i8-shift-1x1       control == ceiling probe int8
  i8-rq-silu-1x1     + production epilogue, SiLU
  i8-rq-siluf-1x1    + production epilogue, polynomial sigmoid
  i8-rq-relu-1x1     + production epilogue, RELU
  i8-shift-3x3       3x3 taps, >>7 glue
  i8-rq-silu-3x3     3x3 taps + SiLU epilogue
  bf16-3x3           same tap structure in bf16 (the bf16 bound)
  i8-c3-round        1x1 + 3x3 + fused residual, SiLU epilogues — the
                     megakernel's actual per-round cost model

Decision rule (committed in advance, recorded in docs/KERNELS.md):
  i8-c3-round >= ~2x the XLA bf16 model-shape rate (147 T/s at
  40x40x256) -> build the C3 megakernel; below ~1.3x -> the
  epilogue/tap structure eats the int8 advantage and the bf16 fast
  tier stands (falsification attempted, survived again).

Run on TPU: python examples/megakernel_probe.py
CPU check:  TAT_INTERPRET=1 python examples/megakernel_probe.py
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

from thingino_accel_tpu.ops.fused_kernels import _epilogue

INTERPRET = os.environ.get("TAT_INTERPRET") == "1"

# tile geometry: H*W == 1024 interior rows == the ceiling probe's M
H = W = 32
L = 4              # chain depth (3x3 weights are 9x the 1x1's VMEM)
GRID = 16
PAD = L            # valid-shrink halo consumed over the whole chain


def _requant(acc, cs_row, *, act):
    """The production epilogue at probe conditions (bias row zero,
    per-channel scale row, activation, round-half-away, clamp, int8)."""
    return _epilogue(acc, jnp.zeros((1, acc.shape[1]), jnp.int32),
                     cs_row, act=act, inv_out=1.0 / 32.0, alpha=0.01)


# --------------------------- 1x1 chains ---------------------------

def _k_shift_1x1(x_ref, w_ref, o_ref, *, k):
    x = x_ref[...].reshape(-1, k)
    for i in range(L):
        acc = jax.lax.dot_general(x, w_ref[i, 0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        x = (acc >> 7).astype(jnp.int8)
    o_ref[...] = x.reshape(o_ref.shape)


def _k_requant_1x1(x_ref, w_ref, cs_ref, o_ref, *, k, act):
    x = x_ref[...].reshape(-1, k)
    for i in range(L):
        acc = jax.lax.dot_general(x, w_ref[i, 0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        x = _requant(acc, cs_ref[...], act=act)
    o_ref[...] = x.reshape(o_ref.shape)


# ------------------- valid-shrink 3x3 chains ----------------------

def _taps(x, w_i, k, e, dtype):
    """VALID 3x3 over the (e, e, C) tile: 9 shifted-window dots, [MxC]
    accumulator out at extent e-2."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = x[dy:dy + e - 2, dx:dx + e - 2, :].reshape(
                (e - 2) * (e - 2), k)
            p = jax.lax.dot_general(t, w_i[dy * 3 + dx],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=dtype)
            acc = p if acc is None else acc + p
    return acc


def _k_shift_3x3(x_ref, w_ref, o_ref, *, k):
    x = x_ref[0]
    for i in range(L):
        e = H + 2 * (L - i)
        acc = _taps(x, w_ref[i], k, e, jnp.int32)
        x = (acc >> 7).astype(jnp.int8).reshape(e - 2, e - 2, k)
    o_ref[...] = x[None]


def _k_requant_3x3(x_ref, w_ref, cs_ref, o_ref, *, k, act):
    x = x_ref[0]
    for i in range(L):
        e = H + 2 * (L - i)
        acc = _taps(x, w_ref[i], k, e, jnp.int32)
        x = _requant(acc, cs_ref[...], act=act).reshape(e - 2, e - 2, k)
    o_ref[...] = x[None]


def _k_bf16_3x3(x_ref, w_ref, o_ref, *, k):
    x = x_ref[0]
    for i in range(L):
        e = H + 2 * (L - i)
        acc = _taps(x, w_ref[i], k, e, jnp.float32)
        x = (acc * (1.0 / 128.0)).astype(jnp.bfloat16).reshape(
            e - 2, e - 2, k)
    o_ref[...] = x[None]


def _k_c3_round(x_ref, w1_ref, w3_ref, cs_ref, o_ref, *, k):
    """Bottleneck rounds: 1x1 (full current extent) -> requant -> 3x3
    taps -> requant with fused residual — the megakernel inner loop."""
    x = x_ref[0]
    for i in range(L):
        e = H + 2 * (L - i)
        m = jax.lax.dot_general(
            x.reshape(-1, k), w1_ref[i, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        m = _requant(m, cs_ref[...], act="SILU").reshape(e, e, k)
        acc = _taps(m, w3_ref[i], k, e, jnp.int32)
        res = x[1:e - 1, 1:e - 1, :].reshape((e - 2) * (e - 2), k)
        y = _epilogue(acc, jnp.zeros((1, k), jnp.int32), cs_ref[...],
                      act="SILU", inv_out=1.0 / 32.0, alpha=0.01,
                      res=res, res_scale=0.5)
        x = y.reshape(e - 2, e - 2, k)
    o_ref[...] = x[None]


# ----------------------------- build ------------------------------

def _ops_3x3(k):
    return sum(2.0 * (H + 2 * (L - i) - 2) ** 2 * 9 * k * k
               for i in range(L)) * GRID / 1e12


def _ops_c3(k):
    return sum(2.0 * (H + 2 * (L - i)) ** 2 * k * k
               + 2.0 * (H + 2 * (L - i) - 2) ** 2 * 9 * k * k
               for i in range(L)) * GRID / 1e12


def build(kind: str, k: int):
    rng = np.random.default_rng(0)
    spatial = kind.endswith("3x3") or kind == "i8-c3-round"
    bf16 = kind.startswith("bf16")
    wdt = jnp.bfloat16 if bf16 else jnp.int8

    def wgen(taps):
        if bf16:
            return jnp.asarray(rng.normal(size=(L, taps, k, k)) * 0.05, wdt)
        return jnp.asarray(rng.integers(-100, 100, (L, taps, k, k)), wdt)

    cs = jnp.asarray(rng.uniform(0.5, 2.0, (1, k)), jnp.float32)

    if not spatial:
        m = H * W
        xs = (m, k)
        x = jnp.asarray(rng.integers(-100, 100, (GRID * m, k)), jnp.int8)
        xspec = pl.BlockSpec(xs, lambda i: (i, 0))
        oshape = jax.ShapeDtypeStruct(x.shape, x.dtype)
        ops = 2.0 * m * k * k * L * GRID / 1e12
        common = dict(grid=(GRID,), out_specs=xspec, out_shape=oshape,
                      interpret=INTERPRET)
        if kind == "i8-shift-1x1":
            fn = pl.pallas_call(
                functools.partial(_k_shift_1x1, k=k),
                in_specs=[xspec, pl.BlockSpec((L, 1, k, k),
                                              lambda i: (0, 0, 0, 0))],
                **common)
            return jax.jit(fn), (x, wgen(1)), ops
        act = {"i8-rq-silu-1x1": "SILU", "i8-rq-siluf-1x1": "SILU_FAST",
               "i8-rq-relu-1x1": "RELU"}[kind]
        fn = pl.pallas_call(
            functools.partial(_k_requant_1x1, k=k, act=act),
            in_specs=[xspec,
                      pl.BlockSpec((L, 1, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((1, k), lambda i: (0, 0))],
            **common)
        return jax.jit(lambda x_, w_: fn(x_, w_, cs)), (x, wgen(1)), ops

    # spatial kinds: 4D (GRID, e0, e0, C) in, (GRID, H, W, C) out,
    # XLA-level repad keeps the scan carry shape-stable
    e0 = H + 2 * PAD
    if bf16:
        x = jnp.asarray(rng.normal(size=(GRID, e0, e0, k)), jnp.bfloat16)
    else:
        x = jnp.asarray(rng.integers(-100, 100, (GRID, e0, e0, k)),
                        jnp.int8)
    xspec = pl.BlockSpec((1, e0, e0, k), lambda i: (i, 0, 0, 0))
    ospec = pl.BlockSpec((1, H, W, k), lambda i: (i, 0, 0, 0))
    oshape = jax.ShapeDtypeStruct((GRID, H, W, k), x.dtype)
    common = dict(grid=(GRID,), out_specs=ospec, out_shape=oshape,
                  interpret=INTERPRET)

    if kind == "i8-c3-round":
        inner = pl.pallas_call(
            functools.partial(_k_c3_round, k=k),
            in_specs=[xspec,
                      pl.BlockSpec((L, 1, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((L, 9, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((1, k), lambda i: (0, 0))],
            **common)
        w = (wgen(1), wgen(9))

        def fn(x_, w_):
            y = inner(x_, w_[0], w_[1], cs)
            return jnp.pad(y, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
        return jax.jit(fn), (x, w), _ops_c3(k)

    if kind == "i8-shift-3x3":
        kern, extra = functools.partial(_k_shift_3x3, k=k), []
    elif kind == "i8-rq-silu-3x3":
        kern = functools.partial(_k_requant_3x3, k=k, act="SILU")
        extra = [pl.BlockSpec((1, k), lambda i: (0, 0))]
    else:  # bf16-3x3
        kern, extra = functools.partial(_k_bf16_3x3, k=k), []
    inner = pl.pallas_call(
        kern,
        in_specs=[xspec,
                  pl.BlockSpec((L, 9, k, k), lambda i: (0, 0, 0, 0))]
                 + extra,
        **common)
    w = wgen(9)

    def fn(x_, w_):
        y = inner(x_, w_, cs) if extra else inner(x_, w_)
        return jnp.pad(y, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)))
    return jax.jit(fn), (x, w), _ops_3x3(k)


def measure(fn, args, tops_per_call: float, iters: int = 20) -> float:
    """Fenced-loop protocol (docs/KERNELS.md): scan-chained iterations
    inside one jit, scalar result, empty-chain baseline subtracted."""
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
    for g in (g0, gN):
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
    return tops_per_call * iters / max(full - base, 1e-9)


KINDS = ("i8-shift-1x1", "i8-rq-silu-1x1", "i8-rq-siluf-1x1",
         "i8-rq-relu-1x1", "i8-shift-3x3", "i8-rq-silu-3x3",
         "bf16-3x3", "i8-c3-round")


def main() -> int:
    iters = 2 if INTERPRET else 20
    ks = (256,) if INTERPRET else (256, 512)
    print(f"# megakernel pricing: {H}x{W} interior (M={H*W}), L={L} "
          f"stages, grid={GRID}; T/s effective")
    print(f"{'K=N':>6} " + " ".join(f"{k:>15}" for k in KINDS))
    for k in ks:
        row = []
        for kind in KINDS:
            try:
                fn, args, ops = build(kind, k)
                row.append(measure(fn, args, ops, iters))
            except Exception as e:
                print(f"# {kind} K={k} failed: {type(e).__name__}: "
                      f"{str(e)[:90]}", file=sys.stderr)
                row.append(float("nan"))
        print(f"{k:>6} " + " ".join(f"{v:>14.1f}T" for v in row),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
