#!/usr/bin/env python3
"""Stem-conv experiments for the serving tier.

The YOLO stem (6x6/2, C=3 -> 32 @640) through the XLA-bf16 path costs
~86 us/frame at batch 128 (conv 17 + f32 relayout copy 39 + requant
fold 24 + input convert 6). Variants measured here:

  V0  current: conv2d_int8_stem_fused (XLA bf16 conv, f32 epilogue)
  V1  XLA patchify (per-px 36 slices -> [*,108] int8) + fused matmul
      with W-fold-by-4 block-diagonal weights (K=512 pad, N=128)
  V2  fold-view patchify (12 group slices -> [*,288] int8) + fused
      matmul (K=384 pad) — same math, 4x fewer slices, smaller K

All variants produce the identical folded int8 output
[N, 320, 80, 128] (f_out=4) and are checked against the exact
reference conv before timing.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variants():
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.ops import fused_kernels as FK

    kh = kw = 6
    s = 2
    c, o = 3, 32
    f_out = 4
    pad = 2

    def v0(x, w, b, in_s, w_s, out_s):
        return FK.conv2d_int8_stem_fused(
            x, w, b, (320, 320), (s, s), ((pad, pad), (pad, pad)),
            in_s, w_s, out_s, act="SILU", f_out=f_out)

    def make_v1(w, b, in_s, w_s, out_s):
        import jax.numpy as jnp
        w_np = np.asarray(w)
        # weight matrix: K = 4 phases x 108 pad 128 -> 512
        wm = np.zeros((512, f_out * o), np.int8)
        for p in range(f_out):
            for dy in range(kh):
                for dx in range(kw):
                    for cc in range(c):
                        k = p * 128 + dy * (kw * c) + dx * c + cc
                        wm[k, p * o:(p + 1) * o] = w_np[dy, dx, cc]
        wm_j = jnp.asarray(wm)
        b0 = b if b is not None else jnp.zeros((o,), jnp.int32)
        ws = jnp.asarray(w_s, jnp.float32)
        if ws.ndim == 0:
            ws = jnp.full((o,), ws, jnp.float32)

        def run(x):
            nb = x.shape[0]
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad + 2), (0, 0)))
            cols = []
            for dy in range(kh):
                for dx in range(kw):
                    sl = jax.lax.slice(
                        xp, (0, dy, dx, 0),
                        (nb, dy + 639, dx + 639, c), (1, s, s, 1))
                    cols.append(sl)
            patches = jnp.concatenate(cols, axis=-1)   # [N,320,320,108]
            patches = jnp.pad(patches, ((0, 0), (0, 0), (0, 0), (0, 20)))
            pf = patches.reshape(nb, 320, 80, 512)
            out = FK.matmul_int8_fused(
                pf.reshape(nb * 320 * 80, 512), wm_j,
                jnp.tile(b0, f_out), in_s, jnp.tile(ws, f_out), out_s,
                act="SILU", keep_phys=True, block_m=2048)
            return out.reshape(nb, 320, 80, 128)
        return run

    def make_v2(w, b, in_s, w_s, out_s):
        import jax.numpy as jnp
        w_np = np.asarray(w)
        # fold-view patches: group g = s*f_out = 8 px = 24 values; per
        # output group j the window is rows dy(6) x cols [24j, 24j+48)
        # (pad_left=2px=6 absorbed). lanes: dy*48 + u (u in 0..47),
        # K = 6*48 = 288 -> pad 384.
        # weight row for output (p, o): tap (dy, dx, cc) reads padded
        # col 24j + 6*p + 3*dx + cc - 6 + 6 = 24j + 6p + 3dx + cc
        wm = np.zeros((384, f_out * o), np.int8)
        for p in range(f_out):
            for dy in range(kh):
                for dx in range(kw):
                    for cc in range(c):
                        u = 6 * p + 3 * dx + cc
                        wm[dy * 48 + u, p * o:(p + 1) * o] = w_np[dy, dx, cc]
        wm_j = jnp.asarray(wm)
        b0 = b if b is not None else jnp.zeros((o,), jnp.int32)
        ws = jnp.asarray(w_s, jnp.float32)
        if ws.ndim == 0:
            ws = jnp.full((o,), ws, jnp.float32)

        def run(x):
            nb = x.shape[0]
            # pad: top/bottom 2 rows; left 2 px (6 vals) folded into the
            # group origin; right to cover group 80's 48-wide window
            xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad + 4), (0, 0)))
            xf = xp.reshape(nb, 644, 81, 24)            # free fold view
            rows = []
            for dy in range(kh):
                g0 = jax.lax.slice(xf, (0, dy, 0, 0),
                                   (nb, dy + 639, 80, 24), (1, s, 1, 1))
                g1 = jax.lax.slice(xf, (0, dy, 1, 0),
                                   (nb, dy + 639, 81, 24), (1, s, 1, 1))
                rows.append(g0)
                rows.append(g1)
            patches = jnp.concatenate(rows, axis=-1)    # [N,320,80,288]
            patches = jnp.pad(patches, ((0, 0), (0, 0), (0, 0), (0, 96)))
            out = FK.matmul_int8_fused(
                patches.reshape(nb * 320 * 80, 384), wm_j,
                jnp.tile(b0, f_out), in_s, jnp.tile(ws, f_out), out_s,
                act="SILU", keep_phys=True, block_m=2048)
            return out.reshape(nb, 320, 80, 128)
        return run

    return v0, make_v1, make_v2


def main():
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from thingino_accel_tpu.ops import fused_kernels as FK

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = int(os.environ.get("TAT_STEM_BATCH", "128" if on_tpu else "2"))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (batch, 640, 640, 3),
                                 dtype=np.int8))
    w = jnp.asarray(rng.integers(-64, 64, (6, 6, 3, 32), dtype=np.int8))
    b = jnp.asarray(rng.integers(-1000, 1000, (32,), dtype=np.int32))
    in_s, w_s, out_s = 0.02, 0.015, 0.05

    v0, make_v1, make_v2 = build_variants()
    f0 = jax.jit(lambda x: v0(x, w, b, in_s, w_s, out_s))
    f1 = jax.jit(make_v1(w, b, in_s, w_s, out_s))
    f2 = jax.jit(make_v2(w, b, in_s, w_s, out_s))

    # correctness: all variants agree with V0 (exact int epilogue)
    xs = x[:2]
    o0 = np.asarray(f0(xs))
    for name, f in (("V1", f1), ("V2", f2)):
        oo = np.asarray(f(xs))
        diff = np.abs(oo.astype(np.int32) - o0.astype(np.int32))
        print(f"{name} vs V0: max|diff| = {diff.max()} "
              f"({'OK' if diff.max() <= 1 else 'MISMATCH'})")

    if not on_tpu:
        print("cpu run: correctness only")
        return

    for name, f in (("V0", f0), ("V1", f1), ("V2", f2)):
        out = f(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt / batch * 1e6:7.1f} us/frame")


if __name__ == "__main__":
    main()
