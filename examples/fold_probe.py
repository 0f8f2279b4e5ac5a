#!/usr/bin/env python3
"""Price a fold-to-depth rewrite of the thin-channel early stages.

v5s profile (2026-08-19): conv time averages 57% bf16 MFU while the
40x40x256 C3 measures 75% — the early thin-K layers (160x160 C=64,
320x320 C=32) drag the average: XLA pads K to the 128 MXU contraction
width, wasting 2-4x. A space-to-depth fold of those REGIONS (not just
the stem, which ir/passes.stem_space_to_depth already handles) would
run them at K=128/256:

  A) 3x3 s1 conv at 160x160x64->64 (P2 C3 bodies)
     folded: 80x80x256 input, FOUR 2x2 convs (one per output parity,
     K=256 -> 64 each), channel-concat back to the folded layout.
     1.78x the MACs, but at K=256 instead of K=64.
  B) 3x3 s2 conv 320x320x32 -> 160x160x64 (the stage-2 downsample)
     folded: ONE 2x2 s1 conv on 160x160x128 -> 64 (even-origin 3x3
     windows == 2x2 folded taps). SAME MACs, K=128 instead of K=32.

This probe measures both forms in pure XLA (bf16, SiLU epilogues,
fenced-loop protocol) and reports us/frame at b128. Decision: folded
form >=1.4x faster on (A) -> build the region-fold IR pass; otherwise
record the negative and stop (the pass is invasive: SiLU/residual/
concat handling inside the folded region).

Run on TPU: python examples/fold_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("TAT_FOLD_B", "128"))


def silu(x):
    return x * jax.nn.sigmoid(x)


def plain_a(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return silu(y).astype(jnp.bfloat16)


def folded_a(x, ws):
    # x: [B, 80, 80, 256]; ws: [4] of [2,2,256,64] -> concat to 256
    parts = []
    for p in range(4):
        y = jax.lax.conv_general_dilated(
            x, ws[p], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        parts.append(y)
    return silu(jnp.concatenate(parts, -1)).astype(jnp.bfloat16)


def plain_b(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return silu(y).astype(jnp.bfloat16)


def folded_b(x, w):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return silu(y).astype(jnp.bfloat16)


def measure(fn, x, w, iters=20):
    """Fenced scan-chain, empty-chain baseline subtracted; us/frame."""
    def chained(n):
        @jax.jit
        def g(x, w):
            def body(c, _):
                y = fn(c, w)
                # keep carry shape/dtype: fold the output back in via a
                # scalar so the chain stays data-dependent
                bump = (jnp.float32(1e-6)
                        * jnp.sum(y.astype(jnp.float32))).astype(c.dtype)
                return c + bump, None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))
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
    return (full - base) / iters / B * 1e6


def main():
    rng = np.random.default_rng(0)

    def t(shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape) * scale, jnp.bfloat16)

    rows = []
    # A: 3x3 s1 @160x160x64
    xa = t((B, 160, 160, 64), 1.0)
    wa = t((3, 3, 64, 64))
    ua = measure(plain_a, xa, wa)
    xaf = t((B, 80, 80, 256), 1.0)
    waf = t((4, 2, 2, 256, 64))
    uaf = measure(folded_a, xaf, waf)
    rows.append(("A 3x3s1 160x160x64", ua, uaf))
    # B: 3x3 s2 320x320x32 -> 160x160x64
    xb = t((B, 320, 320, 32), 1.0)
    wb = t((3, 3, 32, 64))
    ub = measure(plain_b, xb, wb)
    xbf = t((B, 160, 160, 128), 1.0)
    wbf = t((2, 2, 128, 64))
    ubf = measure(folded_b, xbf, wbf)
    rows.append(("B 3x3s2 320x320x32->64", ub, ubf))
    print(f"# fold-to-depth probe, b{B}, us/frame (bf16+SiLU, fenced)")
    print(f"{'layer':<26} {'plain':>9} {'folded':>9} {'speedup':>8}")
    for name, u, uf in rows:
        print(f"{name:<26} {u:>8.2f}u {uf:>8.2f}u {u/uf:>7.2f}x",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
