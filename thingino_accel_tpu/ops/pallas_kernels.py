"""Pallas/Mosaic TPU kernels: fused int8 conv + requantize.

The reference's hot loop is a hand-written MXU int8 kernel with the
requantize epilogue inlined per output pixel (``src/mars/mxu_conv.c``:
S4MACSSB MAC loop + scale/round/clamp at ``:222-248``). The TPU analog:
a Pallas matmul kernel that keeps the int32 accumulator in VMEM across
the K loop and applies the scale/round/clamp epilogue before writing
int8 back to HBM — one HBM round-trip for the whole conv instead of
(accumulate, requantize) passes.

Convs are expressed as matmuls (im2col-free): 1x1 stride-1 convs are a
pure ``[N*H*W, C] @ [C, O]``; KxK convs decompose into K*K shifted 1x1s
accumulated in the same VMEM tile (grid dim over taps).

Tiling: lane dim 128, int8 sublane 32 (pallas_guide: min tile (32,128)).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thingino_accel_tpu.ops.quant import RoundMode

# Element-indexed block dimension (overlapping halo tiles). Public alias
# when available, else the internal core type.
try:
    _PL_ELEMENT = pl.Element          # type: ignore[attr-defined]
except AttributeError:
    from jax._src.pallas.core import Element as _PL_ELEMENT


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def dot_i8(a, b, dims=(((1,), (0,)), ((), ()))):
    """int8 x int8 -> int32 dot for Mosaic kernels.

    Pins Precision.DEFAULT: a global jax_default_matmul_precision of
    'highest' would annotate fp32 contract precision on int8 tpu.matmul,
    which Mosaic rejects ("Bad lhs type"). Every int8 dot in a pallas
    kernel must go through here.

    ``a`` may arrive as qbf16 (integer VALUES carried in bf16 from the
    XLA stem stage — executor's ``stem_emit``): the in-VMEM cast is
    exact for integers in [-128, 127] (bf16 has an 8-bit mantissa) and
    replaces a whole-tensor HBM quantize pass at the stage exit."""
    if a.dtype != jnp.int8:
        a = a.astype(jnp.int8)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)


def dot_bf16(a, b, dims=(((1,), (0,)), ((), ()))):
    """bf16 x bf16 -> f32 dot for Mosaic kernels.

    The serving tier's ``compute="bf16"`` mode: operands carry int8
    VALUES (cast in VMEM — exact, bf16's 8-bit significand covers
    [-128, 127]) and the MXU MACs them on the f32 accumulator, where
    each int8 x int8 product is exact and sums stay exact while
    |acc| < 2^24 (K*K*C <= 1024 worst-case). I/O to HBM stays int8;
    only the MXU issue rate differs from :func:`dot_i8` (197 vs 394
    TOP/s peak on v5e) — but bf16 operands skip Mosaic's int8
    vector-op widening on misaligned tap loads, which is what holds
    the int8 kernels far below even the bf16 peak (docs/KERNELS.md
    round-3 anatomy)."""
    if a.dtype != jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
    if b.dtype != jnp.bfloat16:
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# Fused int8 matmul + requant (the 1x1-conv / FC kernel)
# ---------------------------------------------------------------------------


def _mm_requant_kernel(x_ref, w_ref, bias_ref, out_ref, acc_ref, *,
                       n_k: int, combined_scale: float, round_mode: RoundMode,
                       relu: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += dot_i8(
        x_ref[:], w_ref[:])

    @pl.when(k == n_k - 1)
    def _():
        acc = acc_ref[:] + bias_ref[:].astype(jnp.int32)
        scaled = acc.astype(jnp.float32) * jnp.float32(combined_scale)
        if round_mode == RoundMode.HALF_AWAY:
            shifted = scaled + jnp.where(
                scaled >= 0, jnp.float32(0.5), jnp.float32(-0.5))
        else:
            shifted = scaled + jnp.float32(0.5)
        q = jnp.clip(jnp.trunc(shifted), -128, 127)
        if relu:
            q = jnp.maximum(q, 0.0)
        out_ref[:] = q.astype(jnp.int8)


def matmul_int8_requant(
    x: jax.Array,            # [M, K] int8
    w: jax.Array,            # [K, N] int8
    bias: Optional[jax.Array],   # [N] int32
    combined_scale: float,
    round_mode: RoundMode = RoundMode.HALF_AWAY,
    relu: bool = False,
    block_m: int = 512,
    block_n: int = 256,
    block_k: int = 512,
) -> jax.Array:
    """Fused ``clamp(round((x@w + b) * s))`` -> int8, accumulator resident
    in VMEM across the K loop."""
    m, k = x.shape
    _, n = w.shape
    mp, np_, kp = _round_up(m, 32), _round_up(n, 128), _round_up(k, 128)
    # compiled Mosaic requires lane-dim blocks in multiples of 128 and
    # sublane in multiples of 8 (or the whole padded dim)
    block_m = min(_round_up(block_m, 8), mp)
    block_n = min(_round_up(block_n, 128), np_)
    block_k = min(_round_up(block_k, 128), kp)
    # K must pad to a multiple of block_k: the grid walks kp/block_k full
    # blocks, so a ragged last block would read past the padded array
    # (undefined data into the accumulator).
    kp = _round_up(kp, block_k)
    if (m, n, k) != (mp, np_, kp):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    b = bias if bias is not None else jnp.zeros((n,), jnp.int32)
    b = jnp.pad(b, (0, np_ - n)).reshape(1, np_)

    n_k = _cdiv(kp, block_k)
    grid = (_cdiv(mp, block_m), _cdiv(np_, block_n), n_k)
    kernel = functools.partial(
        _mm_requant_kernel, n_k=n_k, combined_scale=float(combined_scale),
        round_mode=round_mode, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w, b)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Halo-read KxK int8 conv: one input fetch per output tile
# ---------------------------------------------------------------------------
#
# The tap-accumulation path below materializes the K*K shifted input
# views in HBM (K^2x activation traffic). This kernel instead reads each
# output row-tile's input slab (tile_h*stride + K - 1 rows, the "halo")
# into VMEM once via the BlockSpec pipeline and slices the taps from
# VMEM, so HBM sees the input exactly once.


def _halo_kernel(x_ref, w_ref, bias_ref, out_ref, *,
                 kh: int, kw: int, stride: int, tile_h: int, ow: int,
                 combined_scale: float, round_mode: RoundMode, relu: bool):
    # x_ref: [1, tile_h*stride + kh - 1, Wp, C] (halo slab, VMEM)
    # w_ref: [kh*kw, C, block_n]   bias_ref: [1, block_n]
    # out_ref: [1, tile_h, ow, block_n]
    c = x_ref.shape[3]
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = jax.lax.slice(
                x_ref[0],
                (dy, dx, 0),
                (dy + (tile_h - 1) * stride + 1,
                 dx + (ow - 1) * stride + 1, c),
                (stride, stride, 1))                     # [tile_h, ow, C]
            p = dot_i8(
                sl.reshape(tile_h * ow, c), w_ref[dy * kw + dx])
            acc = p if acc is None else acc + p
    acc = acc + bias_ref[:].astype(jnp.int32)
    scaled = acc.astype(jnp.float32) * jnp.float32(combined_scale)
    if round_mode == RoundMode.HALF_AWAY:
        shifted = scaled + jnp.where(
            scaled >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    else:
        shifted = scaled + jnp.float32(0.5)
    q = jnp.clip(jnp.trunc(shifted), -128, 127)
    if relu:
        q = jnp.maximum(q, 0.0)
    out_ref[:] = q.reshape(1, tile_h, ow, -1).astype(jnp.int8)


def conv2d_int8_halo(
    x: jax.Array,            # [N, H, W, C] int8
    w_hwio: jax.Array,       # [KH, KW, C, O] int8
    bias_i32: Optional[jax.Array],
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale: float, out_scale: float,
    round_mode: RoundMode = RoundMode.HALF_AWAY,
    relu: bool = False,
    tile_h: int = 8,
    block_n: int = 256,
) -> jax.Array:
    """Fused int8 conv with halo input tiles (stride must be square;
    dilation 1). Input crosses HBM once; taps are VMEM slices."""
    if stride[0] != stride[1]:
        raise ValueError("halo kernel needs square stride")
    s = stride[0]
    n, h, wd, c = x.shape
    kh, kw, _, o = w_hwio.shape
    oh, ow = out_hw
    cs = float(np.float32(np.float32(in_scale) * np.float32(w_scale))
               / np.float32(out_scale))
    (pt, pb), (pl_, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    # pad channels to the int8 lane tile and O to block_n
    cp = _round_up(c, 128)
    op = _round_up(o, 128)
    block_n = min(block_n, op)
    if cp != c:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    wk = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, cp - c), (0, op - o)))
    wk = wk.reshape(kh * kw, cp, op)
    b = bias_i32 if bias_i32 is not None else jnp.zeros((o,), jnp.int32)
    b = jnp.pad(b, (0, op - o)).reshape(1, op)

    tile_h = min(tile_h, oh)
    n_tiles_h = _cdiv(oh, tile_h)
    # pad rows so every tile's halo slab is in-bounds
    need_rows = (n_tiles_h * tile_h - 1) * s + kh
    if xp.shape[1] < need_rows:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - xp.shape[1]),
                          (0, 0), (0, 0)))
    halo_rows = (tile_h - 1) * s + kh
    wp_cols = xp.shape[2]

    grid = (n, n_tiles_h, _cdiv(op, block_n))
    kernel = functools.partial(
        _halo_kernel, kh=kh, kw=kw, stride=s, tile_h=tile_h, ow=ow,
        combined_scale=cs, round_mode=round_mode, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # overlapping halo slabs: the row dim uses Element indexing
            # (index map yields an element start, ti * tile_h * stride)
            # while the block spans halo_rows — adjacent tiles overlap by
            # the kernel halo, and the input crosses HBM once per tile.
            # Mosaic requires every dim of an Element-indexed BlockSpec
            # to be Element; index map entries are element offsets.
            pl.BlockSpec(
                (_PL_ELEMENT(1), _PL_ELEMENT(halo_rows),
                 _PL_ELEMENT(wp_cols), _PL_ELEMENT(cp)),
                lambda ni, ti, oi, _s=s: (ni, ti * tile_h * _s, 0, 0)),
            pl.BlockSpec((kh * kw, cp, block_n),
                         lambda ni, ti, oi: (0, 0, oi)),
            pl.BlockSpec((1, block_n), lambda ni, ti, oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow, block_n),
            lambda ni, ti, oi: (ni, ti, 0, oi)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles_h * tile_h, ow, op), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(xp, wk, b)
    return out[:, :oh, :, :o]


# ---------------------------------------------------------------------------
# Fused KxK int8 conv: tap-accumulation grid
# ---------------------------------------------------------------------------


def conv2d_int8(
    x: jax.Array,            # [N, H, W, C] int8
    w_hwio: jax.Array,       # [KH, KW, C, O] int8
    bias_i32: Optional[jax.Array],
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    dilation: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float,
    w_scale: float,
    out_scale: float,
    round_mode: RoundMode = RoundMode.HALF_AWAY,
    relu: bool = False,
) -> jax.Array:
    """Pallas-fused int8 conv. 1x1 stride-1 goes straight to the matmul
    kernel; KxK lowers to K*K shifted matmuls whose int32 accumulation
    lives in one VMEM scratch tile (grid's innermost 'arbitrary' dim walks
    the taps), with the requant epilogue on the final tap."""
    n, h, wd, c = x.shape
    kh, kw, _, o = w_hwio.shape
    oh, ow = out_hw
    cs = float(
        np.float32(np.float32(in_scale) * np.float32(w_scale))
        / np.float32(out_scale))

    if kh == kw == 1 and stride == (1, 1) and pads == ((0, 0), (0, 0)):
        out = matmul_int8_requant(
            x.reshape(n * h * wd, c), w_hwio.reshape(c, o), bias_i32, cs,
            round_mode, relu)
        return out.reshape(n, h, wd, o)

    if stride == (1, 1) and dilation == (1, 1):
        # halo-tile kernel: input crosses HBM once (the tap-stack
        # fallback below writes K*K shifted copies first). Stride > 1
        # needs strided VMEM slices, which Mosaic does not lower —
        # those convs take the tap path.
        return conv2d_int8_halo(
            x, w_hwio, bias_i32, out_hw, stride, pads,
            in_scale, w_scale, out_scale, round_mode, relu)

    (pt, pb), (pl_, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    # Gather the K*K shifted views once (XLA fuses the slices), stack as a
    # tap axis, then run a single pallas kernel with taps in the grid.
    taps = []
    for dy in range(kh):
        for dx in range(kw):
            ys, xs = dy * dilation[0], dx * dilation[1]
            sl = jax.lax.slice(
                xp, (0, ys, xs, 0),
                (n, ys + (oh - 1) * stride[0] + 1,
                 xs + (ow - 1) * stride[1] + 1, c),
                (1, stride[0], stride[1], 1))
            taps.append(sl.reshape(n * oh * ow, c))
    xt = jnp.stack(taps)                                 # [T, M, C]
    wt = w_hwio.reshape(kh * kw, c, o)                   # [T, C, O]

    out = _tapconv_call(xt, wt, bias_i32, cs, round_mode, relu, o)
    return out.reshape(n, oh, ow, o)


def _tapconv_kernel(x_ref, w_ref, bias_ref, out_ref, acc_ref, *,
                    n_steps: int, combined_scale: float,
                    round_mode: RoundMode, relu: bool):
    s = pl.program_id(2)   # taps*k steps, innermost

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += dot_i8(
        x_ref[0], w_ref[0])

    @pl.when(s == n_steps - 1)
    def _():
        acc = acc_ref[:] + bias_ref[:].astype(jnp.int32)
        scaled = acc.astype(jnp.float32) * jnp.float32(combined_scale)
        if round_mode == RoundMode.HALF_AWAY:
            shifted = scaled + jnp.where(
                scaled >= 0, jnp.float32(0.5), jnp.float32(-0.5))
        else:
            shifted = scaled + jnp.float32(0.5)
        q = jnp.clip(jnp.trunc(shifted), -128, 127)
        if relu:
            q = jnp.maximum(q, 0.0)
        out_ref[:] = q.astype(jnp.int8)


def _tapconv_call(xt, wt, bias, cs, round_mode, relu, n_out,
                  block_m: int = 1024, block_n: int = 256):
    t, m, c = xt.shape
    _, _, o = wt.shape
    mp = _round_up(m, 32)
    cp = _round_up(c, 128)
    op = _round_up(o, 128)
    block_m = min(block_m, mp)
    block_n = min(block_n, op)
    if (m, c, o) != (mp, cp, op):
        xt = jnp.pad(xt, ((0, 0), (0, mp - m), (0, cp - c)))
        wt = jnp.pad(wt, ((0, 0), (0, cp - c), (0, op - o)))
    b = bias if bias is not None else jnp.zeros((o,), jnp.int32)
    b = jnp.pad(b, (0, op - o)).reshape(1, op)

    grid = (_cdiv(mp, block_m), _cdiv(op, block_n), t)
    kernel = functools.partial(
        _tapconv_kernel, n_steps=t, combined_scale=cs,
        round_mode=round_mode, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_m, cp), lambda i, j, s: (s, i, 0)),
            pl.BlockSpec((1, cp, block_n), lambda i, j, s: (s, 0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, op), jnp.int8),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xt, wt, b)
    return out[:m, :n_out]
