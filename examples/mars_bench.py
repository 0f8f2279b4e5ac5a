#!/usr/bin/env python3
"""Micro-benchmarks with built-in verification (the examples/
mars_conv_bench.c + mars_layer_bench.c + mars_nna_bench.c analog):
every timed kernel is first checked against the scalar/numpy oracle,
then timed with dependency chaining — compute printed as GFLOP/s and
GB/s, PASS/FAIL per case.
"""

import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.ops import reference as R
    from thingino_accel_tpu.utils.timing import time_fn_chained

    rng = np.random.default_rng(0)
    failures = 0

    print("== conv2d int8 (MXU path) — shapes from mars_conv_bench.c ==")
    for (h, c_in, c_out) in [(10, 8, 8), (14, 16, 16), (20, 16, 32),
                             (20, 32, 32), (80, 64, 64)]:
        x = jnp.asarray(rng.integers(-128, 128, (1, h, h, c_in),
                                     dtype=np.int8))
        w = jnp.asarray(rng.integers(-128, 128, (3, 3, c_in, c_out),
                                     dtype=np.int8))
        args = ((h, h), (1, 1), (1, 1), ((1, 1), (1, 1)), 0.1, 0.01, 0.1)
        fn = jax.jit(lambda x: R.conv2d_int8(x, w, None, *args))
        out = np.asarray(fn(x))
        # verify vs int64 numpy accumulate
        acc = np.zeros((h, h, c_out), np.int64)
        xp = np.pad(np.asarray(x, np.int64)[0], ((1, 1), (1, 1), (0, 0)))
        for dy in range(3):
            for dx in range(3):
                acc += np.einsum("hwc,co->hwo",
                                 xp[dy:dy + h, dx:dx + h],
                                 np.asarray(w, np.int64)[dy, dx])
        cs = np.float32(np.float32(0.1) * np.float32(0.01)) / np.float32(0.1)
        sc = acc.astype(np.int32).astype(np.float32) * cs
        ref = np.clip(np.trunc(sc + np.where(sc >= 0, 0.5, -0.5)),
                      -128, 127).astype(np.int8)
        ok = (out[0] == ref).all()
        failures += not ok
        step = jax.jit(lambda x: (fn(x) ^ 1).astype(jnp.int8)[:, :, :, :c_in]
                       if c_out >= c_in else fn(x).astype(jnp.int8))
        dt = time_fn_chained(lambda x: fn(x), x, iters=5)  # fence timing
        gflops = 2 * h * h * 9 * c_in * c_out / dt / 1e9
        print(f"  {h}x{h}x{c_in}->{c_out}: {dt*1e6:8.1f} us  "
              f"{gflops:8.1f} GFLOP/s  [{'PASS' if ok else 'FAIL'}]")

    print("== elementwise f32 (VPU) — mars_nna_bench.c sizes ==")
    for n in (1024, 16384, 262144):
        a = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))
        for name, fn in [("add", lambda a, b: a + b),
                         ("mul", lambda a, b: a * b),
                         ("relu", lambda a, b: jnp.maximum(a, 0))]:
            jf = jax.jit(fn)
            out = np.asarray(jf(a, b))
            ref = {"add": np.asarray(a) + np.asarray(b),
                   "mul": np.asarray(a) * np.asarray(b),
                   "relu": np.maximum(np.asarray(a), 0)}[name]
            ok = np.allclose(out, ref, rtol=1e-6)
            failures += not ok
            dt = time_fn_chained(lambda x: jf(x, b), a, iters=10)
            gbs = n * 4 * 3 / dt / 1e9
            print(f"  {name:<5} n={n:<8} {dt*1e6:8.1f} us  {gbs:7.2f} GB/s"
                  f"  [{'PASS' if ok else 'FAIL'}]")

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
