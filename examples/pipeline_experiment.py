#!/usr/bin/env python3
"""Lagged-epilogue software pipelining experiment.

KERNELS.md roofline: halo-conv grid cells execute DMA + MXU tap-dots +
VPU epilogue serially (~160 T/s vs the 394 int8 peak). This experiment
breaks the dot->epilogue dependency by lagging the epilogue one grid
cell: cell ti computes dots into a 2-slot int32 VMEM accumulator and
applies the requant/activation epilogue to cell ti-1's slot, so Mosaic
can overlap VPU epilogue work with MXU dots.

Shape: 3x3/1 c128->o128 @80x80, batch 128 (the bread-and-butter C3
conv) + a 1x1 matmul variant. Checks bit-exactness vs the baseline
kernel, then times both on hardware.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch=128, h=80, c=128, o=128, tile_h=16, act="SILU"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from thingino_accel_tpu.ops import fused_kernels as FK
    from thingino_accel_tpu.ops.pallas_kernels import _PL_ELEMENT

    kh = kw = 3
    pads = ((1, 1), (1, 1))
    in_s, w_s, out_s = 0.05, 0.01, 0.05

    def baseline(x, w, b):
        return FK.conv2d_int8_folded(
            x, w, b, (h, h), 1, pads, in_s, w_s, out_s,
            act=act, f_out=1, tile_h=tile_h, keep_phys=True)

    # ---- lagged-epilogue variant (stride 1, fold 1, no W-fold) ----
    def _kernel(x_ref, w_ref, bias_ref, cs_ref, out_ref, acc2, *,
                n_tiles, th, ow, kh, qw, inv_out, alpha):
        ti = pl.program_id(2)
        slot = jax.lax.rem(ti, 2)
        prev = jax.lax.rem(ti + 1, 2)

        @pl.when(ti < n_tiles)
        def _():
            slab = x_ref[0]                    # [halo, 1, Wq, C]
            cq = slab.shape[3]
            acc = None
            for dy in range(kh):
                for qx in range(qw):
                    sl = slab[dy:dy + th, 0, qx:qx + ow, :]
                    p = jax.lax.dot_general(
                        sl.reshape(th * ow, cq), w_ref[dy * qw + qx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc = p if acc is None else acc + p
            acc2[slot] = acc

        @pl.when(ti > 0)
        def _():
            q = FK._epilogue(acc2[prev], bias_ref[:], cs_ref[:],
                             act=act, inv_out=inv_out, alpha=alpha)
            out_ref[:] = q.reshape(1, th, ow, -1)

    def lagged(x, w, b):
        # x: [N, H, W, C] int8; stride 1, pad 1 -> same-shaped output
        n = x.shape[0]
        qw = kw
        n_tiles = h // tile_h
        halo = tile_h + kh - 1
        need_w = (h - 1) + qw
        xp = jnp.pad(x, ((0, 0), (1, 0), (1, need_w - h - 1), (0, 0)))
        need_rows = (n_tiles - 1) * tile_h + halo
        if xp.shape[1] < need_rows:
            xp = jnp.pad(xp, ((0, 0), (0, need_rows - xp.shape[1]),
                              (0, 0), (0, 0)))
        wq = xp.shape[2]
        x5 = xp.reshape(n, xp.shape[1], 1, wq, c)
        wk = jnp.asarray(w).reshape(kh * kw, c, o)
        bb, cs, inv_out = FK._scale_rows(b, w_s, in_s, out_s, act, o, o)

        kernel = functools.partial(
            _kernel, n_tiles=n_tiles, th=tile_h, ow=h, kh=kh, qw=qw,
            inv_out=inv_out, alpha=0.01)
        nt1 = n_tiles + 1
        out = pl.pallas_call(
            kernel,
            grid=(n, 1, nt1),
            in_specs=[
                pl.BlockSpec(
                    (_PL_ELEMENT(1), _PL_ELEMENT(halo), _PL_ELEMENT(1),
                     _PL_ELEMENT(wq), _PL_ELEMENT(c)),
                    lambda ni, oi, ti: (
                        ni, jnp.minimum(ti, n_tiles - 1) * tile_h,
                        0, 0, 0)),
                pl.BlockSpec((kh * kw, c, o), lambda ni, oi, ti: (0, 0, 0)),
                pl.BlockSpec((1, o), lambda ni, oi, ti: (0, 0)),
                pl.BlockSpec((1, o), lambda ni, oi, ti: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_h, h, o),
                lambda ni, oi, ti: (ni, jnp.maximum(ti - 1, 0), 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (n, n_tiles * tile_h, h, o), jnp.int8),
            scratch_shapes=[pltpu.VMEM((2, tile_h * h, o), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x5, wk, bb, cs)
        return out

    return baseline, lagged


def main():
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 128 if on_tpu else 2
    h, c, o, tile_h = 80, 128, 128, 16
    act = os.environ.get("TAT_PIPE_ACT", "SILU")

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-64, 64, (3, 3, c, o), dtype=np.int8))
    b = jnp.asarray(rng.integers(-1000, 1000, (o,), dtype=np.int32))
    baseline, lagged = build(batch, h, c, o, tile_h, act)
    f0 = jax.jit(lambda x: baseline(x, w, b))
    f1 = jax.jit(lambda x: lagged(x, w, b))

    xs = [jnp.asarray(rng.integers(-128, 128, (batch, h, h, c),
                                   dtype=np.int8)) for _ in range(4)]
    o0 = np.asarray(f0(xs[0][:2]))
    o1 = np.asarray(f1(xs[0][:2]))
    diff = np.abs(o0.astype(np.int32) - o1.astype(np.int32))
    print(f"lagged vs baseline: max|diff| = {diff.max()} "
          f"({'OK' if diff.max() == 0 else 'MISMATCH'})")

    if not on_tpu:
        return

    flops = 2 * batch * h * h * 9 * c * o
    for name, f in (("baseline", f0), ("lagged", f1)):
        for x in xs:
            jax.block_until_ready(f(x))
        t0 = time.perf_counter()
        iters = 50
        for i in range(iters):
            out = f(xs[i % 4])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e6:8.1f} us  {flops / dt / 1e12:6.1f} T/s")


if __name__ == "__main__":
    main()
