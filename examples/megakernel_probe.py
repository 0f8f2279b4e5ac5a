#!/usr/bin/env python3
"""Price the int8 C3 megakernel BEFORE building it.

The fixed-protocol ceiling probe (examples/mxu_ceiling_probe.py,
2026-08-19) measured chained VMEM-resident int8 dots at 463 T/s
(K=N=256) vs bf16 207 T/s — the committed decision rule's branch 1:
"the serving gap is kernel structure; build the deeper C3/whole-stage
megakernel". But the production C3 chain (examples/c3_block_ab.py)
reaches only 84.8 T/s at 40x40x256 — a 5.5x gap to the ceiling made of
exactly two structural costs. This probe prices them SEPARATELY at
ceiling conditions (M=1024-row tiles, K=N=256, everything VMEM-
resident), so the megakernel's reachable rate is known before the
engineering is spent:

  epilogue   the production per-channel requant epilogue
             (fused_kernels._epilogue: int32 acc + bias, f32
             per-channel scale, SiLU, half-away-from-zero round,
             clamp, int8 cast) instead of the probe's >>7 glue
  taps       3x3 conv as 9 shifted-window dots on an (H+2, W+2, C)
             VMEM tile (the halo structure every spatial conv in a
             megakernel needs) instead of flat [M, K] 1x1 dots

Contenders (all fenced-loop measured, empty-chain baseline subtracted):
  i8-shift-1x1      control == ceiling probe int8 (expect ~463 T/s)
  i8-requant-1x1    + real epilogue (SiLU)          -> epilogue cost
  i8-shift-3x3      3x3 taps, >>7 glue              -> tap cost
  i8-requant-3x3    3x3 taps + real epilogue        -> both
  bf16-3x3          same tap structure in bf16      -> the bf16 bound
  i8-c3-round       1x1 + 3x3 + residual add, real epilogues — the
                    megakernel's actual per-round cost model

Decision rule (committed in advance, recorded in docs/KERNELS.md):
  i8-requant-3x3 >= ~2x the XLA bf16 model-shape rate (147 T/s at
  40x40x256) -> build the C3 megakernel; anything below ~1.3x means
  the epilogue/tap structure eats the int8 advantage and the bf16
  fast tier stands (falsification attempted, survived again).

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

# tile geometry: H*W == 1024 rows == the ceiling probe's M
H = W = 32
L = 4              # chain depth (3x3 weights are 9x the 1x1's VMEM)
GRID = 16


def _requant(acc, cs_row, *, act="SILU"):
    """The production epilogue at probe conditions (bias row zero,
    per-channel scale row, SiLU, round-half-away, clamp, int8)."""
    return _epilogue(acc, jnp.zeros((1, acc.shape[1]), jnp.int32),
                     cs_row, act=act, inv_out=1.0 / 32.0, alpha=0.01)


def _k_shift_1x1(x_ref, w_ref, o_ref, *, k):
    x = x_ref[...].reshape(-1, k)
    for i in range(L):
        acc = jax.lax.dot_general(x, w_ref[i, 0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        x = (acc >> 7).astype(jnp.int8)
    o_ref[...] = x.reshape(o_ref.shape)


def _k_requant_1x1(x_ref, w_ref, cs_ref, o_ref, *, k):
    x = x_ref[...].reshape(-1, k)
    for i in range(L):
        acc = jax.lax.dot_general(x, w_ref[i, 0], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        x = _requant(acc, cs_ref[...])
    o_ref[...] = x.reshape(o_ref.shape)


def _taps(x, w_i, k):
    """SAME 3x3 over the (H+2, W+2, C) tile's interior: 9 shifted-
    window dots accumulating int32, [H*W, C] out."""
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = x[dy:dy + H, dx:dx + W, :].reshape(H * W, k)
            p = jax.lax.dot_general(t, w_i[dy * 3 + dx],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
    return acc


def _k_shift_3x3(x_ref, w_ref, o_ref, *, k):
    x = x_ref[...]
    for i in range(L):
        y = (_taps(x, w_ref[i], k) >> 7).astype(jnp.int8)
        x = jax.lax.dynamic_update_slice(x, y.reshape(H, W, k), (1, 1, 0))
    o_ref[...] = x


def _k_requant_3x3(x_ref, w_ref, cs_ref, o_ref, *, k):
    x = x_ref[...]
    for i in range(L):
        y = _requant(_taps(x, w_ref[i], k), cs_ref[...])
        x = jax.lax.dynamic_update_slice(x, y.reshape(H, W, k), (1, 1, 0))
    o_ref[...] = x


def _k_bf16_3x3(x_ref, w_ref, o_ref, *, k):
    x = x_ref[...]
    for i in range(L):
        acc = None
        for dy in range(3):
            for dx in range(3):
                t = x[dy:dy + H, dx:dx + W, :].reshape(H * W, k)
                p = jax.lax.dot_general(t, w_ref[i, dy * 3 + dx],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        y = (acc * (1.0 / 128.0)).astype(jnp.bfloat16)
        x = jax.lax.dynamic_update_slice(x, y.reshape(H, W, k), (1, 1, 0))
    o_ref[...] = x


def _k_c3_round(x_ref, w1_ref, w3_ref, cs_ref, o_ref, *, k):
    """Bottleneck rounds: 1x1 (full padded extent) -> requant -> 3x3
    taps -> requant with fused residual — the megakernel's inner loop."""
    x = x_ref[...]
    for i in range(L):
        m = jax.lax.dot_general(
            x.reshape(-1, k), w1_ref[i, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        m = _requant(m, cs_ref[...]).reshape(x.shape)
        acc = _taps(m, w3_ref[i], k)
        res = x[1:1 + H, 1:1 + W, :].reshape(H * W, k)
        y = _epilogue(acc, jnp.zeros((1, k), jnp.int32), cs_ref[...],
                      act="SILU", inv_out=1.0 / 32.0, alpha=0.01,
                      res=res, res_scale=0.5)
        x = jax.lax.dynamic_update_slice(x, y.reshape(H, W, k), (1, 1, 0))
    o_ref[...] = x


def build(kind: str, k: int):
    rng = np.random.default_rng(0)
    xs = (H + 2, W + 2, k)
    if kind.startswith("bf16"):
        x = jnp.asarray(rng.normal(size=(GRID * xs[0],) + xs[1:]),
                        jnp.bfloat16)
    else:
        x = jnp.asarray(rng.integers(-100, 100, (GRID * xs[0],) + xs[1:]),
                        jnp.int8)
    wdt = jnp.bfloat16 if kind.startswith("bf16") else jnp.int8

    def wgen(taps):
        if wdt == jnp.bfloat16:
            return jnp.asarray(rng.normal(size=(L, taps, k, k)) * 0.05, wdt)
        return jnp.asarray(rng.integers(-100, 100, (L, taps, k, k)), wdt)

    cs = jnp.asarray(rng.uniform(0.5, 2.0, (1, k)), jnp.float32)
    xspec = pl.BlockSpec(xs, lambda i: (i, 0, 0))
    oshape = jax.ShapeDtypeStruct(x.shape, x.dtype)
    # per-call MACs: 1x1 stages act on the full padded extent rows;
    # 3x3 stages on H*W interior rows x 9 taps
    m_pad = xs[0] * xs[1]
    ops_1x1 = 2.0 * m_pad * k * k * L * GRID / 1e12
    ops_3x3 = 2.0 * H * W * 9 * k * k * L * GRID / 1e12

    common = dict(grid=(GRID,), out_specs=xspec, out_shape=oshape,
                  interpret=INTERPRET)
    if kind == "i8-shift-1x1":
        fn = pl.pallas_call(
            functools.partial(_k_shift_1x1, k=k),
            in_specs=[xspec, pl.BlockSpec((L, 1, k, k),
                                          lambda i: (0, 0, 0, 0))],
            **common)
        return jax.jit(fn), (x, wgen(1)), ops_1x1
    if kind == "i8-requant-1x1":
        fn = pl.pallas_call(
            functools.partial(_k_requant_1x1, k=k),
            in_specs=[xspec,
                      pl.BlockSpec((L, 1, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((1, k), lambda i: (0, 0))],
            **common)
        w = wgen(1)
        return jax.jit(lambda x_, w_: fn(x_, w_, cs)), (x, w), ops_1x1
    if kind == "i8-shift-3x3":
        fn = pl.pallas_call(
            functools.partial(_k_shift_3x3, k=k),
            in_specs=[xspec, pl.BlockSpec((L, 9, k, k),
                                          lambda i: (0, 0, 0, 0))],
            **common)
        return jax.jit(fn), (x, wgen(9)), ops_3x3
    if kind == "i8-requant-3x3":
        fn = pl.pallas_call(
            functools.partial(_k_requant_3x3, k=k),
            in_specs=[xspec,
                      pl.BlockSpec((L, 9, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((1, k), lambda i: (0, 0))],
            **common)
        w = wgen(9)
        return jax.jit(lambda x_, w_: fn(x_, w_, cs)), (x, w), ops_3x3
    if kind == "bf16-3x3":
        fn = pl.pallas_call(
            functools.partial(_k_bf16_3x3, k=k),
            in_specs=[xspec, pl.BlockSpec((L, 9, k, k),
                                          lambda i: (0, 0, 0, 0))],
            **common)
        return jax.jit(fn), (x, wgen(9)), ops_3x3
    if kind == "i8-c3-round":
        fn = pl.pallas_call(
            functools.partial(_k_c3_round, k=k),
            in_specs=[xspec,
                      pl.BlockSpec((L, 1, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((L, 9, k, k), lambda i: (0, 0, 0, 0)),
                      pl.BlockSpec((1, k), lambda i: (0, 0))],
            **common)
        w1, w3 = wgen(1), wgen(9)
        return (jax.jit(lambda x_, w_: fn(x_, w_[0], w_[1], cs)),
                (x, (w1, w3)), ops_1x1 + ops_3x3)
    raise ValueError(kind)


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


KINDS = ("i8-shift-1x1", "i8-requant-1x1", "i8-shift-3x3",
         "i8-requant-3x3", "bf16-3x3", "i8-c3-round")


def main() -> int:
    iters = 2 if INTERPRET else 20
    ks = (256,) if INTERPRET else (128, 256, 512)
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
