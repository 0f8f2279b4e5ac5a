"""Serving-tier fused int8 Pallas kernels: conv/matmul with the whole
post-conv chain (bias + per-channel scale + activation + requantize)
executed in VMEM before the single int8 HBM write.

This is the TPU analog of the reference's inner MAC loop with the
requantize epilogue inlined per output pixel (``src/mars/mxu_conv.c:
144-252``), extended with what the reference's format *declares* but its
runtime never fuses: per-layer activations (``include/mars.h:82-91``)
and per-channel scales.

Key design points (see docs/KERNELS.md):

- int8 x int8 -> int32 ``dot_general`` runs at the MXU's full int8 rate
  (~2x bf16; measured ~263 TOP/s on a v5e for the halo kernel) — the
  serving tier therefore keeps activations int8 end to end.
- Epilogue math: ``q = clamp(round(act(acc * pre_scale) * inv_out))``
  where ``pre_scale = in_scale * w_scale`` (scalar or per-channel) and
  ``inv_out = 1/out_scale``. For linear/RELU activations this folds to
  the reference's single combined-scale multiply; SiLU / LeakyReLU are
  computed on the f32 pre-activation, which the int8 interpreter cannot
  express without an intermediate quantization.
- Strided convs are phase-decomposed (space-to-depth) OUTSIDE the
  kernel: a KxK/s conv becomes a ceil(K/s)^2 stride-1 conv over s^2*C
  channels, which the halo kernel handles and which *raises* MXU lane
  utilization. Mosaic has no strided VMEM slices, so this is also the
  only way to run downsample convs through the halo pipeline.
- Thin-input convs (C < 16, e.g. a 6x6/2 stem on RGB) go through an
  explicit im2col so the matmul contraction dim is K*K*C (e.g. 108)
  instead of C (3) — lane utilization 84% instead of 2%.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thingino_accel_tpu.ops.pallas_kernels import (
    _PL_ELEMENT, _cdiv, _round_up, dot_bf16, dot_i8,
)

ACTS = ("NONE", "RELU", "LEAKY_RELU", "SILU", "SILU_FAST")

COMPUTES = ("int8", "bf16")


def _compute_mode(compute: Optional[str]) -> str:
    """Resolve the MXU compute dtype for the serving kernels.

    ``int8`` (default): int8 x int8 -> int32 MACs — always exact.
    ``bf16``: int8 VALUES cast to bf16 in VMEM, MACed on the f32
    accumulator — exact while K*K*C <= 1024 (|acc| < 2^24); HBM I/O
    stays int8 either way, so tensors/scales/fold plans are
    unchanged. Selected per call or process-wide via
    ``TAT_SERVING_COMPUTE`` (resolved at trace time, like
    ``TAT_FAST_SILU``)."""
    if compute is None:
        from thingino_accel_tpu.utils import config
        compute = config.get("TAT_SERVING_COMPUTE")
    assert compute in COMPUTES, compute
    return compute


def _dot_c(a, b, compute: str):
    """Tap/matmul dot in the tier's compute dtype (see _compute_mode).
    ``b`` (weights) is pre-cast outside the kernel in bf16 mode; ``a``
    is cast here, in VMEM — the cast is the entire dequantization
    (scales ride in the epilogue rows either way)."""
    if compute == "bf16":
        return dot_bf16(a, b)
    return dot_i8(a, b)


def _sigmoid_fast(x):
    """Rational (Pade) sigmoid — no transcendentals on the VPU.

    ``sigmoid(x) = 0.5 * (1 + tanh(x/2))`` with the [5/4] Pade tanh
    ``tanh(y) ~ y*(945 + 105 y^2 + y^4) / (945 + 420 y^2 + 15 y^4)``
    on ``y = x/2`` clamped to +-3.6333 — the point where the
    approximant crosses exactly +-1, so |x| >= 7.27 yields sigmoid
    exactly 0/1 and ``silu(x) = x`` there (true residual x*e^-x <
    5e-3). Measured absolute error: |sigmoid err| < 8e-4, |silu err|
    < 6e-3 over all x (tests/test_fused_kernels.py) — under a tenth
    of an int8 quantum for out_scale >= 0.06, so requantized outputs
    differ from the exp path only on exact rounding boundaries.
    Motivation: the exp-based SiLU epilogue costs ~8 us/frame over
    RELU at 80x80c128 (docs/KERNELS.md round 3 anatomy); this is
    pure mul/add/div VPU work."""
    y = jnp.clip(x * jnp.float32(0.5), -3.6333, 3.6333)
    y2 = y * y
    y4 = y2 * y2
    num = y * (jnp.float32(945.0) + jnp.float32(105.0) * y2 + y4)
    den = (jnp.float32(945.0) + jnp.float32(420.0) * y2
           + jnp.float32(15.0) * y4)
    try:
        # in-kernel: hardware approximate reciprocal + one Newton step
        # (exact f32 division is the slow op on the VPU; den is well
        # conditioned in [945, 9103] so one refinement reaches ~1e-6
        # relative, preserving the documented silu bound)
        r = pl.reciprocal(den, approx=True)
        r = r * (jnp.float32(2.0) - den * r)
        t = num * r
    except NotImplementedError:     # outside a pallas kernel
        t = num / den
    return jnp.float32(0.5) + jnp.float32(0.5) * t


def _named(kernel, name: str):
    """Give a kernel partial a real ``__name__`` so the Mosaic custom
    call (and hence the profiler trace) carries the op's shape instead
    of an anonymous ``fn.NN`` — the profiling that found round 2's
    hotspots needed manual HLO cross-referencing without this."""
    def fn(*args, **kwargs):
        return kernel(*args, **kwargs)
    fn.__name__ = "".join(c if c.isalnum() or c == "_" else "_"
                          for c in name)
    return fn


def _epilogue(acc, bias_row, cs_row, *, act: str, inv_out: float,
              alpha: float, res=None, res_scale: float = 1.0):
    """Accumulator tile -> int8, entirely in registers/VMEM.

    acc: [M, N] int32 (int8 compute) or f32 (bf16 compute);
    bias_row/cs_row: [1, N] (broadcast rows).
    Round rule: half away from zero (the reference conv rule,
    ``src/mars/mxu_conv.c:222-229``).

    ``res``: optional int8 residual tile added AFTER the activation on
    the f32 value (serving-tier fused ADD — one fewer intermediate
    quantization than the interpreter's conv->requant->add chain).
    """
    if acc.dtype == jnp.int32:
        acc = acc + bias_row.astype(jnp.int32)
        pre = acc.astype(jnp.float32) * cs_row
    else:
        # bf16-compute path: acc is the f32 MXU accumulator carrying
        # the same integer value as the int32 path (exact while
        # |acc| < 2^24), so the epilogue arithmetic below is
        # bit-identical between compute modes in that range
        pre = (acc + bias_row.astype(jnp.float32)) * cs_row
    return _act_requant(pre, act=act, inv_out=inv_out, alpha=alpha,
                        res=res, res_scale=res_scale)


def _act_requant(pre, *, act: str, inv_out: float, alpha: float,
                 res=None, res_scale: float = 1.0):
    """Activation + requantize on the real-valued pre-activation tile
    (the tail of :func:`_epilogue`, shared with the per-part-scale
    branch of the virtual-concat kernel so both implement the same
    reference semantics — notably LEAKY_RELU's post-quantization
    int-domain alpha)."""
    if act == "RELU":
        pre = jnp.maximum(pre, 0.0)
    elif act == "SILU":
        pre = pre * jax.nn.sigmoid(pre)
    elif act == "SILU_FAST":
        pre = pre * _sigmoid_fast(pre)
    if res is not None:
        assert act != "LEAKY_RELU", \
            "leaky applies post-quantization; no fused residual"
        pre = pre + res.astype(jnp.float32) * jnp.float32(res_scale)
    scaled = pre * jnp.float32(inv_out)
    shifted = scaled + jnp.where(
        scaled >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    q = jnp.clip(jnp.trunc(shifted), -128, 127)
    if act == "LEAKY_RELU":
        # the reference applies alpha AFTER requantization + clamp, on
        # the int8 value with C float->int truncation
        # (src/mars/mars_runtime.c:1078-1082; ops.reference.leaky_relu)
        # — applying it on the f32 pre-activation diverges by up to
        # alpha*|clamp range| / out_scale quanta on saturated negatives
        # (found via the nanodet serving-vs-exact sweep, round 3)
        neg = jnp.maximum(jnp.trunc(q * jnp.float32(alpha)), -128.0)
        q = jnp.where(q > 0, q, neg)
    return q.astype(jnp.int8)


def _scale_rows(
    bias: Optional[jax.Array], w_scale, in_scale: float, out_scale: float,
    act: str, n: int, np_: int,
) -> Tuple[jax.Array, jax.Array, float]:
    """Build the [1, Np] bias and combined-scale rows + inv_out scalar.

    Linear/RELU: cs = in*w/out, inv_out = 1 (single multiply, matching
    the reference combined-scale path bit for bit when w_scale is a
    scalar). Nonlinear: cs = in*w, inv_out = 1/out (two-step).

    The scale arithmetic runs on the HOST in numpy: the reference
    computes combined_scale on the host CPU in IEEE f32
    (``src/mars/mxu_conv.c:153``), and TPU f32 division is 1 ulp off
    IEEE (reciprocal + refine) — computing ``cs / out_scale`` on
    device flipped ~0.1% of outputs at rounding ties on hardware
    vs the exact tier / interpret mode (found by the round-3 hardware
    suite; tests/test_fused_kernels.py bottleneck oracle)."""
    ws = np.asarray(w_scale, np.float32)
    if ws.ndim == 0:
        ws = np.full((n,), ws, np.float32)
    cs = (np.float32(in_scale) * ws).astype(np.float32)
    if act in ("NONE", "RELU", "LEAKY_RELU"):
        # LEAKY quantizes on the linear path first (alpha applies on
        # the int8 domain in _epilogue, matching the reference)
        cs = (cs / np.float32(out_scale)).astype(np.float32)
        inv_out = 1.0
    else:
        inv_out = float(1.0 / np.float32(out_scale))
    cs = jnp.asarray(np.pad(cs, (0, np_ - n)).reshape(1, np_))
    b = bias if bias is not None else jnp.zeros((n,), jnp.int32)
    b = jnp.pad(b, (0, np_ - n)).reshape(1, np_)
    return b, cs, inv_out


# ---------------------------------------------------------------------------
# Fused matmul (1x1 convs, FC, im2col'd convs)
# ---------------------------------------------------------------------------


def _mm_kernel(x_ref, w_ref, bias_ref, cs_ref, out_ref, acc_ref, *,
               n_k: int, act: str, inv_out: float, alpha: float,
               compute: str = "int8"):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += _dot_c(
        x_ref[:], w_ref[:], compute)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = _epilogue(acc_ref[:], bias_ref[:], cs_ref[:],
                               act=act, inv_out=inv_out, alpha=alpha)


def matmul_int8_fused(
    x: jax.Array,                # [M, K] int8
    w: jax.Array,                # [K, N] int8
    bias: Optional[jax.Array],   # [N] int32
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    block_m: Optional[int] = None,
    block_n: int = 256,
    block_k: int = 512,
    keep_phys: bool = False,
    compute: Optional[str] = None,
) -> jax.Array:
    """``int8 = requant(act((x@w + b) * s))`` with per-channel ``w_scale``
    support; accumulator resident in VMEM across the K loop.

    ``block_m`` defaults adaptively: serving-batch 1x1 convs reach
    M ~ 1.6M rows, where per-grid-cell overhead (~0.5 us/cell) dwarfs
    the memory-bound dots — bigger M-tiles cut the cell count (measured
    14-22 -> ~6 us/frame per 160x160 1x1 at batch 128)."""
    m, k = x.shape
    _, n = w.shape
    if block_m is None:
        block_m = 512 if m < (1 << 17) else \
            2048 if m < (1 << 19) else 4096
    mp, np_, kp = _round_up(m, 32), _round_up(n, 128), _round_up(k, 128)
    block_m = min(_round_up(block_m, 8), mp)
    block_n = min(_round_up(block_n, 128), np_)
    block_k = min(_round_up(block_k, 128), kp)
    kp = _round_up(kp, block_k)   # grid walks full K blocks only
    if (m, n, k) != (mp, np_, kp):
        x = jnp.pad(x, ((0, mp - m), (0, kp - k)))
        w = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    compute = _compute_mode(compute)
    if compute == "bf16":
        # weights pre-cast OUTSIDE the kernel: blocks are fetched once
        # per pallas_call (revisit detection) but the kernel body runs
        # per grid cell — an in-kernel cast would convert per cell
        w = w.astype(jnp.bfloat16)
    b, cs, inv_out = _scale_rows(
        bias, w_scale, in_scale, out_scale, act, n, np_)

    n_k = _cdiv(kp, block_k)
    grid = (_cdiv(mp, block_m), _cdiv(np_, block_n), n_k)
    kernel = _named(functools.partial(
        _mm_kernel, n_k=n_k, act=act, inv_out=inv_out, alpha=alpha,
        compute=compute),
        f"mm_{m}x{n}x{k}_{act}")
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        scratch_shapes=[pltpu.VMEM(
            (block_m, block_n),
            jnp.float32 if compute == "bf16" else jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w, b, cs)
    if keep_phys:
        return out[:m] if mp != m else out
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Multi-input fused matmul: conv over a channel-concat WITHOUT
# materializing the concat (1x1 convs: cv3(concat(a, b)) = a@Wa + b@Wb),
# with an optional fused residual add (the C3 bottleneck's
# x + conv(...) — the add runs in the epilogue before the single int8
# write instead of as a separate dequant/add/requant pass over HBM).
# ---------------------------------------------------------------------------


def _mm_multi_kernel(*refs, n_parts: int, same_scale: bool,
                     part_scales, bias_scale: float, act: str,
                     inv_out: float, alpha: float,
                     has_res: bool, res_scale: float,
                     compute: str = "int8"):
    xs = refs[:n_parts]
    ws = refs[n_parts:2 * n_parts]
    bias_ref = refs[2 * n_parts]
    cs_ref = refs[2 * n_parts + 1]
    res_ref = refs[2 * n_parts + 2] if has_res else None
    out_ref = refs[2 * n_parts + 2 + int(has_res)]

    def dot(i):
        return _dot_c(
            xs[i][:], ws[i][:], compute)

    if same_scale:
        acc = dot(0)
        for i in range(1, n_parts):
            acc = acc + dot(i)
        out_ref[:] = _epilogue(
            acc, bias_ref[:], cs_ref[:], act=act, inv_out=inv_out,
            alpha=alpha, res=res_ref[:] if has_res else None,
            res_scale=res_scale)
    else:
        # per-part input scales: combine partial sums in f32.
        # bias is int32 in units bias_scale * w_scale (the conv input
        # tensor's scale) — scale it into real pre-w units before the
        # shared w/out multiply.
        accf = dot(0).astype(jnp.float32) * jnp.float32(part_scales[0])
        for i in range(1, n_parts):
            accf = accf + dot(i).astype(jnp.float32) * \
                jnp.float32(part_scales[i])
        accf = (accf + bias_ref[:].astype(jnp.float32)
                * jnp.float32(bias_scale)) * cs_ref[:]
        out_ref[:] = _act_requant(
            accf, act=act, inv_out=inv_out, alpha=alpha,
            res=res_ref[:] if has_res else None, res_scale=res_scale)


def matmul_int8_fused_multi(
    xs,                           # list of [M, K_i] int8
    ws,                           # list of [K_i, N] int8
    bias: Optional[jax.Array],    # [N] int32
    in_scales,                    # list of floats, one per part
    w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    residual: Optional[jax.Array] = None,   # [M, >=N] int8
    res_scale: float = 1.0,
    bias_scale: Optional[float] = None,     # bias units (default s_0)
    block_m: Optional[int] = None,
    block_n: int = 256,
    keep_phys: bool = False,
    compute: Optional[str] = None,
) -> jax.Array:
    """``requant(act((sum_i x_i @ w_i) * s) [+ r*sr])`` — the fused
    lowering of CONCAT -> 1x1 CONV [-> ADD]. Parts' K dims are padded
    to 128 independently; no K-grid (1x1 conv K <= a few hundred).
    ``bias`` is int32 in units ``bias_scale * w_scale`` (the conv input
    tensor's scale; defaults to the first part's scale)."""
    m = xs[0].shape[0]
    n = ws[0].shape[1]
    n_parts = len(xs)
    assert len(ws) == n_parts and len(in_scales) == n_parts
    if block_m is None:
        block_m = 512 if m < (1 << 17) else \
            2048 if m < (1 << 19) else 4096
    mp, np_ = _round_up(m, 32), _round_up(n, 128)
    block_m = min(_round_up(block_m, 8), mp)
    block_n = min(_round_up(block_n, 128), np_)

    compute = _compute_mode(compute)
    xs_p, ws_p = [], []
    for x, w in zip(xs, ws):
        k = x.shape[1]
        kp = _round_up(k, 128)
        xs_p.append(jnp.pad(x, ((0, mp - m), (0, kp - k)))
                    if (m, k) != (mp, kp) else x)
        wp = jnp.pad(w, ((0, kp - k), (0, np_ - n))) \
            if (k, n) != (kp, np_) else w
        ws_p.append(wp.astype(jnp.bfloat16) if compute == "bf16" else wp)

    if bias_scale is None:
        bias_scale = float(in_scales[0])
    same_scale = (len(set(float(np.float32(s)) for s in in_scales)) == 1
                  and float(np.float32(bias_scale))
                  == float(np.float32(in_scales[0])))
    if same_scale:
        b, cs, inv_out = _scale_rows(
            bias, w_scale, in_scales[0], out_scale, act, n, np_)
    else:
        # cs row = w_scale only; per-part in_scales applied in-kernel.
        # Host numpy math — TPU f32 division is 1 ulp off IEEE (see
        # _scale_rows).
        ws_v = np.asarray(w_scale, np.float32)
        if ws_v.ndim == 0:
            ws_v = np.full((n,), ws_v, np.float32)
        if act in ("NONE", "RELU", "LEAKY_RELU"):
            # LEAKY quantizes on the linear path first (int-domain
            # alpha in _act_requant) — single host-combined multiply,
            # consistent with _scale_rows
            cs_v = (ws_v / np.float32(out_scale)).astype(np.float32)
            inv_out = 1.0
        else:
            cs_v, inv_out = ws_v, float(1.0 / np.float32(out_scale))
        cs = jnp.asarray(np.pad(cs_v, (0, np_ - n)).reshape(1, np_))
        b0 = bias if bias is not None else jnp.zeros((n,), jnp.int32)
        b = jnp.pad(b0, (0, np_ - n)).reshape(1, np_)
    if act in ("NONE", "RELU", "LEAKY_RELU"):
        # keep in lockstep with _scale_rows' single-multiply tuple
        # (res + LEAKY is rejected in _act_requant either way)
        res_scale_eff = float(np.float32(res_scale) / np.float32(out_scale))
    else:
        res_scale_eff = float(np.float32(res_scale))

    has_res = residual is not None
    inputs = list(xs_p) + list(ws_p) + [b, cs]
    in_specs = (
        [pl.BlockSpec((block_m, xp.shape[1]), lambda i, j: (i, 0))
         for xp in xs_p]
        + [pl.BlockSpec((wp.shape[0], block_n), lambda i, j: (0, j))
           for wp in ws_p]
        + [pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
           pl.BlockSpec((1, block_n), lambda i, j: (0, j))]
    )
    if has_res:
        r = residual
        if r.shape[1] < np_:
            r = jnp.pad(r, ((0, 0), (0, np_ - r.shape[1])))
        elif r.shape[1] > np_:
            r = r[:, :np_]
        if r.shape[0] != mp:
            r = jnp.pad(r, ((0, mp - r.shape[0]), (0, 0)))
        inputs.append(r)
        in_specs.append(pl.BlockSpec((block_m, block_n),
                                     lambda i, j: (i, j)))

    kernel = _named(functools.partial(
        _mm_multi_kernel, n_parts=n_parts, same_scale=same_scale,
        part_scales=[float(s) for s in in_scales],
        bias_scale=float(bias_scale), act=act,
        inv_out=inv_out, alpha=alpha, has_res=has_res,
        res_scale=res_scale_eff, compute=compute),
        f"mmc_{m}x{n}_{n_parts}p_{act}{'_res' if has_res else ''}")
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=(_cdiv(mp, block_m), _cdiv(np_, block_n)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(*inputs)
    if keep_phys:
        return out[:m] if mp != m else out
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Fused halo conv — any square stride, zero data shuffles
# ---------------------------------------------------------------------------
#
# Stride handling without strided VMEM slices (Mosaic has none on tiled
# dims) and without space-to-depth transposes (XLA transposes of thin
# int8 tensors are HBM-padding catastrophes):
#
# - W stride: fold the W phase into channels with a FREE reshape —
#   [N, H, W, C] -> [N, H, W/s, s*C] is layout-identical (W*C minor
#   order groups s adjacent pixels). Weights repack to
#   [KH, ceil(KW/s), s*C, O] at load time.
# - H stride: the halo row-slab arrives in VMEM; rows are an UNTILED
#   dim (tiling covers the last two dims only), so the kernel reshapes
#   the slab rows -> (rows/s, s, ...) for free and indexes the phase
#   statically. No strided access anywhere.


def _halo_kernel(*refs, kh: int, qw: int, s: int, tile_h: int, ow: int,
                 act: str, inv_out: float, alpha: float,
                 has_res: bool = False, res_scale: float = 1.0,
                 compute: str = "int8"):
    # refs: x, w, bias, cs, [res], out
    # x_ref: [1, halo_pairs, s, Wq, Cq] — rows pre-split into (row/s, s)
    # phases by a FREE reshape outside the kernel (untiled dims).
    # w_ref: [kh*qw, Cq, block_n]; bias/cs: [1, block_n]
    x_ref, w_ref, bias_ref, cs_ref = refs[:4]
    res_ref = refs[4] if has_res else None
    out_ref = refs[4 + int(has_res)]
    cq = x_ref.shape[4]
    slab = x_ref[0]                                    # [pairs, s, Wq, Cq]
    if compute == "bf16":
        # one whole-slab cast; taps then slice bf16 data (weights
        # arrive pre-cast) — avoids kh*qw redundant converts of the
        # overlapping tap windows
        slab = slab.astype(jnp.bfloat16)
    acc = None
    for dy in range(kh):
        qy, py = divmod(dy, s)
        for qx in range(qw):
            sl = slab[qy:qy + tile_h, py, qx:qx + ow, :]   # [tile_h, ow, Cq]
            p = _dot_c(
                sl.reshape(tile_h * ow, cq), w_ref[dy * qw + qx], compute)
            acc = p if acc is None else acc + p
    res = res_ref[0].reshape(tile_h * ow, -1) if has_res else None
    q = _epilogue(acc, bias_ref[:], cs_ref[:],
                  act=act, inv_out=inv_out, alpha=alpha,
                  res=res, res_scale=res_scale)
    out_ref[:] = q.reshape(1, tile_h, ow, -1)


def repack_weights_wfold(w_hwio, s: int):
    """[KH, KW, C, O] -> [KH, ceil(KW/s), s*C, O]: W-phase px of tap dx
    lands in channel block px*C (matching the free [W/s, s*C] input
    reshape). Pure pad + reshape — traceable on device weights."""
    kh, kw, c, o = w_hwio.shape
    qw = _cdiv(kw, s)
    if qw * s != kw:
        w_hwio = jnp.pad(w_hwio, ((0, 0), (0, qw * s - kw),
                                  (0, 0), (0, 0)))
    return w_hwio.reshape(kh, qw, s * c, o)


def conv2d_int8_halo_fused(
    x: jax.Array,                # [N, H, W, C] int8
    w_hwio: jax.Array,           # [KH, KW, C, O] int8
    bias: Optional[jax.Array],
    out_hw: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    stride: int = 1,
    tile_h: Optional[int] = None,
    block_n: int = 256,
    w_pre_packed: Optional[jax.Array] = None,
) -> jax.Array:
    """KxK int8 conv (square stride s >= 1), halo-tiled: each output
    row-tile's input slab crosses HBM exactly once; taps are static VMEM
    slices; the epilogue (bias / per-channel scale / activation /
    requantize) runs before the single int8 write.

    ``w_pre_packed``: [KH, ceil(KW/s), s*C, O] from
    :func:`repack_weights_wfold`, to skip the per-call repack."""
    s = stride
    n, h, wd, c = x.shape
    if w_pre_packed is not None:
        kh, qw, sc, o = w_pre_packed.shape
    else:
        kh, kw, _, o = w_hwio.shape
        qw, sc = _cdiv(kw, s), s * c
    oh, ow = out_hw
    (pt, pb), (pl_, pr) = pads
    # pad W so the folded width covers every tap: need (ow-1) + qw cols
    # of s*C each -> (ow - 1 + qw) * s pixels
    need_w = (ow - 1 + qw) * s
    pr = max(pr, need_w - (wd + pl_))
    xp = jnp.pad(x, ((0, 0), (pt, 0), (pl_, pr), (0, 0)))
    # FREE reshape: fold W phases into channels
    wq_cols = xp.shape[2] // s
    xr = xp[:, :, :wq_cols * s, :].reshape(n, xp.shape[1], wq_cols, sc)

    cp = _round_up(sc, 128)
    op = _round_up(o, 128)
    block_n = min(block_n, op)
    if cp != sc:
        xr = jnp.pad(xr, ((0, 0), (0, 0), (0, 0), (0, cp - sc)))
    wk = w_pre_packed if w_pre_packed is not None else \
        repack_weights_wfold(w_hwio, s)
    wk = jnp.pad(wk, ((0, 0), (0, 0), (0, cp - sc), (0, op - o)))
    wk = wk.reshape(kh * qw, cp, op)
    b, cs, inv_out = _scale_rows(bias, w_scale, in_scale, out_scale,
                                 act, o, op)

    if tile_h is None:
        # target M = tile_h*ow ~ 1280-2048 rows per matmul tile: big
        # enough to amortize tap-loop overhead, small enough for VMEM
        tile_h = max(8, 1280 // max(ow, 1))
    tile_h = min(tile_h, oh)
    n_tiles_h = _cdiv(oh, tile_h)
    # slab row-pairs per tile: output row r + tap dy reads pair r + dy//s,
    # phase dy % s -> pairs [ti*tile_h, ti*tile_h + tile_h + qh_max)
    qh_max = (kh - 1) // s
    halo_pairs = tile_h + qh_max
    need_rows = s * ((n_tiles_h - 1) * tile_h + halo_pairs)
    if xr.shape[1] < need_rows:
        xr = jnp.pad(xr, ((0, 0), (0, need_rows - xr.shape[1]),
                          (0, 0), (0, 0)))
    wq_tot = xr.shape[2]
    # FREE reshape (untiled dims): split rows into (pairs, phase)
    xr = xr[:, :need_rows].reshape(n, need_rows // s, s, wq_tot, cp)

    grid = (n, n_tiles_h, _cdiv(op, block_n))
    kernel = _named(
        functools.partial(
            _halo_kernel, kh=kh, qw=qw, s=s, tile_h=tile_h, ow=ow,
            act=act, inv_out=inv_out, alpha=alpha),
        f"halo{kh}x{kh}s{s}_{oh}x{ow}o{o}_{act}")
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_PL_ELEMENT(1), _PL_ELEMENT(halo_pairs), _PL_ELEMENT(s),
                 _PL_ELEMENT(wq_tot), _PL_ELEMENT(cp)),
                lambda ni, ti, oi: (ni, ti * tile_h, 0, 0, 0)),
            pl.BlockSpec((kh * qw, cp, block_n),
                         lambda ni, ti, oi: (0, 0, oi)),
            pl.BlockSpec((1, block_n), lambda ni, ti, oi: (0, oi)),
            pl.BlockSpec((1, block_n), lambda ni, ti, oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow, block_n),
            lambda ni, ti, oi: (ni, ti, 0, oi)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles_h * tile_h, ow, op), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(xr, wk, b, cs)
    return out[:, :oh, :, :o]


# ---------------------------------------------------------------------------
# Fused SPPF: three chained KxK/1 maxpools + channel concat + 1x1 conv
# in ONE kernel — the pool pyramid lives entirely in VMEM (the XLA
# lowering costs ~45 us/frame in reduce_window + halo pads + concat
# copies at 20x20x512; the fused kernel reads x once and writes the
# conv output once).
# ---------------------------------------------------------------------------


def _sppf_kernel(x_ref, w_ref, bias_ref, cs_ref, out_ref, buf, *,
                 hw: Tuple[int, int], k: int, act: str, inv_out: float,
                 alpha: float, compute: str = "int8"):
    # x_ref: [1, H, W, Cp]; w_ref: [4, Cp, block_n]; buf: VMEM scratch
    # [H+2p, W+2p, Cp] used as the padded workspace for each pool level.
    h, w = hw
    p = (k - 1) // 2
    cq = x_ref.shape[3]

    def pool(z_i32):
        # separable k x k max, stride 1, SAME: pad with -128.
        # Pools run in int32: Mosaic has no vector maxsi for int8
        # (fails to legalize on hardware; interpret mode accepts it).
        buf[:] = jnp.full(buf.shape, -128, jnp.int32)
        buf[p:p + h, p:p + w, :] = z_i32
        zp = buf[:]
        m = None
        for dx in range(k):
            sl = zp[0:h + 2 * p, dx:dx + w, :]
            m = sl if m is None else jnp.maximum(m, sl)
        out = None
        for dy in range(k):
            sl = m[dy:dy + h]
            out = sl if out is None else jnp.maximum(out, sl)
        return out

    y0 = x_ref[0]
    # the pyramid recomputes per oc block — the model family runs a
    # single 512-wide block, so caching it in scratch buys nothing
    m1 = pool(y0.astype(jnp.int32))
    m2 = pool(m1)
    m3 = pool(m2)
    lvl_dtype = jnp.bfloat16 if compute == "bf16" else jnp.int8
    acc = None
    for i, z in enumerate((y0.astype(lvl_dtype) if compute == "bf16"
                           else y0, m1.astype(lvl_dtype),
                           m2.astype(lvl_dtype), m3.astype(lvl_dtype))):
        d = _dot_c(
            z.reshape(h * w, cq), w_ref[i], compute)
        acc = d if acc is None else acc + d
    q = _epilogue(acc, bias_ref[:], cs_ref[:], act=act,
                  inv_out=inv_out, alpha=alpha)
    out_ref[:] = q.reshape(1, h, w, -1)


def sppf_int8_fused(
    x: jax.Array,                # [N, H, W, C] int8 (pool-pyramid input)
    w_hwio: jax.Array,           # [1, 1, 4*C, O] the cv2 weight
    bias: Optional[jax.Array],
    pool_k: int,
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    block_n: int = 512,
    keep_phys: bool = False,
    compute: Optional[str] = None,
) -> jax.Array:
    """SPPF tail: ``cv2(concat(x, m1, m2, m3))`` with
    ``m_{i+1} = maxpool_kxk/1(m_i)`` — pools in VMEM (separable,
    pad = -128 matching the int8 SAME-pool identity), four part-dots,
    requant epilogue. Whole image per grid cell (SPPF runs at the
    smallest feature map, e.g. 20x20x512 for yolov5s@640)."""
    n, h, w, c = x.shape
    _, _, c4, o = w_hwio.shape
    assert c4 == 4 * c, (c4, c)
    p = (pool_k - 1) // 2
    cp = _round_up(c, 128)
    op = _round_up(o, 128)
    block_n = min(block_n, op)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)),
                    constant_values=-128)   # pad lanes can't win a max
    wm = jnp.asarray(w_hwio).reshape(4, c, o)
    wk = jnp.pad(wm, ((0, 0), (0, cp - c), (0, op - o)))
    compute = _compute_mode(compute)
    if compute == "bf16":
        wk = wk.astype(jnp.bfloat16)
    b, cs, inv_out = _scale_rows(bias, w_scale, in_scale, out_scale,
                                 act, o, op)

    grid = (n, _cdiv(op, block_n))
    kernel = _named(functools.partial(
        _sppf_kernel, hw=(h, w), k=pool_k, act=act, inv_out=inv_out,
        alpha=alpha, compute=compute),
        f"sppf{pool_k}_{h}x{w}x{cp}o{op}_{act}")
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, w, cp), lambda ni, oi: (ni, 0, 0, 0)),
            pl.BlockSpec((4, cp, block_n), lambda ni, oi: (0, 0, oi)),
            pl.BlockSpec((1, block_n), lambda ni, oi: (0, oi)),
            pl.BlockSpec((1, block_n), lambda ni, oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec((1, h, w, block_n),
                               lambda ni, oi: (ni, 0, 0, oi)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, op), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * p, w + 2 * p, cp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x, wk, b, cs)
    if keep_phys:
        return out
    return out[..., :o]


# ---------------------------------------------------------------------------
# Thin-input conv via explicit im2col (stem convs, C < 16)
# ---------------------------------------------------------------------------


def conv2d_int8_im2col_fused(
    x: jax.Array,                # [N, H, W, C] int8, small C
    w_hwio: jax.Array,           # [KH, KW, C, O]
    bias: Optional[jax.Array],
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
) -> jax.Array:
    """Gather KxK patches into the channel dim (contraction K*K*C, e.g.
    6*6*3 = 108 for a YOLO stem) and run one fused matmul. The patch
    tensor is int8 and costs K*K*C/C x the input in HBM — acceptable for
    thin stems, catastrophic for wide layers (use halo/s2d there)."""
    n, h, wd, c = x.shape
    kh, kw, _, o = w_hwio.shape
    oh, ow = out_hw
    (pt, pb), (pl_, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            sl = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + (oh - 1) * stride[0] + 1,
                 dx + (ow - 1) * stride[1] + 1, c),
                (1, stride[0], stride[1], 1))
            cols.append(sl)
    patches = jnp.concatenate(cols, axis=-1)        # [N, OH, OW, K*K*C]
    wm = jnp.asarray(w_hwio).reshape(kh * kw * c, o)
    out = matmul_int8_fused(
        patches.reshape(n * oh * ow, kh * kw * c), wm, bias,
        in_scale, w_scale, out_scale, act, alpha)
    return out.reshape(n, oh, ow, o)


# ---------------------------------------------------------------------------
# Manually pipelined halo conv: double-buffered slab DMA
# ---------------------------------------------------------------------------
#
# The BlockSpec-pipelined halo kernel executes each grid cell's
# DMA + tap-dots + epilogue serially (measured ~160 T/s vs the ~390
# MXU floor). This variant keeps the input in HBM (ANY memory space)
# and overlaps the next row-slab's DMA with the current tile's compute
# via an explicit two-slot VMEM buffer + DMA semaphores; one grid cell
# covers a whole image (per output-channel block), so the row loop
# amortizes all per-cell overhead.


def _halo_kernel_dma(x_any, w_ref, bias_ref, cs_ref, out_ref, *,
                     kh: int, qw: int, s: int, tile_h: int, ow: int,
                     n_tiles: int, halo_pairs: int,
                     act: str, inv_out: float, alpha: float):
    ni = pl.program_id(0)

    def body(slab, sem):
        def dma(slot, ti):
            return pltpu.make_async_copy(
                x_any.at[ni, pl.ds(ti * tile_h, halo_pairs)],
                slab.at[slot], sem.at[slot])

        dma(0, 0).start()

        def loop(ti, carry):
            cur = jax.lax.rem(ti, 2)
            nxt = jax.lax.rem(ti + 1, 2)

            @pl.when(ti + 1 < n_tiles)
            def _():
                dma(nxt, ti + 1).start()

            dma(cur, ti).wait()
            sl = slab[cur]                  # [halo_pairs, s, Wq, Cq]
            cq = sl.shape[3]
            acc = None
            for dy in range(kh):
                qy, py = divmod(dy, s)
                for qx in range(qw):
                    t_ = sl[qy:qy + tile_h, py, qx:qx + ow, :]
                    p = dot_i8(
                        t_.reshape(tile_h * ow, cq), w_ref[dy * qw + qx])
                    acc = p if acc is None else acc + p
            q = _epilogue(acc, bias_ref[:], cs_ref[:],
                          act=act, inv_out=inv_out, alpha=alpha)
            out_ref[0, pl.ds(ti * tile_h, tile_h)] = \
                q.reshape(tile_h, ow, -1)
            return carry

        jax.lax.fori_loop(0, n_tiles, loop, 0)

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((2, halo_pairs) + tuple(x_any.shape[2:]),
                        jnp.int8),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


# ---------------------------------------------------------------------------
# Fold-layout convs: activations stored [B, H, W/f, f*C]
# ---------------------------------------------------------------------------
#
# Sub-128-channel int8 NHWC tensors are padded to 128 lanes in HBM
# (C=64 -> 2x capacity+traffic; C=3 -> 42x) and waste the same fraction
# of every MXU pass. The serving tier therefore stores activations
# *W-folded*: f adjacent pixels share one 128-lane row, with f halving
# at each stride-2 conv so the layout is globally consistent (s=1 convs
# keep f; s=2 convs take f_in = 2*f_out — exactly the W-phase fold the
# strided halo kernel already consumes). Folding is free at the
# producer (the conv writes f_out pixels per output row) and free at
# the consumer (weights are repacked once); only layout boundaries
# (graph outputs, non-conv spatial ops) pay an unfold reshape.


def repack_weights_folded(
    w_hwio,                      # [KH, KW, C, O]
    s: int,                      # square stride
    f_out: int,                  # output fold (f_in = s * f_out)
    pad_left: int = 0,           # conv's left pad, absorbed into taps
    parts: Optional[Tuple[int, ...]] = None,   # input = concat of parts
):
    """[KH, KW, C, O] -> [KH, QW, g*C, f_out*O], g = s*f_out.

    Output fold-pixel (j, p) at tap (dy, dx) reads input real column
    s*(f_out*j + p) + dx - pad_left = g*(j-1) + t with
    t = s*p + dx - pad_left + g  in [0, 2g + ...): the +g shift makes
    one zero fold-group of left padding suffice (requires pad_left < g,
    true for every kernel the tier runs: pad = (k-1)//2 < k <= g*?).

    ``parts``: when the logical input is a channel-concat of folded
    tensors, phys channel u of the folded concat maps to
    (part i, phase p, channel c) — the repack bakes that permutation in.
    """
    kh, kw, c, o = w_hwio.shape
    g = s * f_out
    parts = tuple(parts) if parts else (c,)
    # negative entries are raw phys padding channels inside a group
    # (producers emit lane-padded groups; pads carry zero weights)
    assert sum(ci for ci in parts if ci > 0) == c, (parts, c)
    t_max = s * (f_out - 1) + kw - 1 - pad_left
    q_shift = _cdiv(pad_left, g)                # leading zero groups
    qw = q_shift + max(0, t_max) // g + 1
    # phys channel layout of a folded (possibly padded) concat:
    # logical part ci occupies g*ci phys as (phase u, channel c) ->
    # u*ci + c; a pad entry -k occupies k raw phys channels
    placements = []   # (logical_off, ci, phys_base)
    log_off = phys_base = 0
    for ci in parts:
        if ci < 0:
            phys_base += -ci
        else:
            placements.append((log_off, ci, phys_base))
            log_off += ci
            phys_base += g * ci
    phys_total = phys_base
    is_np = isinstance(w_hwio, np.ndarray)
    out = (np.zeros if is_np else jnp.zeros)(
        (kh, qw, phys_total, f_out * o), w_hwio.dtype)
    for p in range(f_out):
        for dx in range(kw):
            t = s * p + dx - pad_left + q_shift * g
            qx, u_px = divmod(t, g)
            for lo, ci, pb in placements:
                src = w_hwio[:, dx, lo:lo + ci, :]
                dst_c = pb + u_px * ci
                if is_np:
                    out[:, qx, dst_c:dst_c + ci,
                        p * o:(p + 1) * o] = src
                else:
                    out = out.at[:, qx, dst_c:dst_c + ci,
                                 p * o:(p + 1) * o].set(src)
    return out, q_shift, qw


def conv2d_int8_folded(
    x_folded: jax.Array,         # [N, H, Wg, g*C] int8 (g = s*f_out)
    w_hwio: jax.Array,           # [KH, KW, C, O] (unpacked)
    bias: Optional[jax.Array],
    logical_out_hw: Tuple[int, int],
    stride: int,
    pads: Tuple[Tuple[int, int], Tuple[int, int]],   # (pt,pb),(pl,pr)
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    f_out: int = 1,
    parts: Optional[Tuple[int, ...]] = None,
    tile_h: Optional[int] = None,
    block_n: int = 512,
    keep_phys: bool = False,     # emit lane-padded channels (no slice)
    pipeline: str = "blockspec",  # "blockspec" | "dma" (manual 2-slot)
    residual: Optional[jax.Array] = None,  # folded [N, OH, OWg, >=f*O]
    res_scale: float = 1.0,
    compute: Optional[str] = None,
) -> jax.Array:
    """Folded-layout conv: consumes [N, H, Wg, g*C], emits
    [N, OH, OWg, f_out*O] (or lane-padded with ``keep_phys``). One
    jnp.pad (H halo + one W fold-group of left padding); everything else
    is static VMEM slicing. ``residual``: fused post-activation add
    (``r * res_scale`` in the epilogue — the C3 shortcut)."""
    s = stride
    g = s * f_out
    n, h, wg, gc = x_folded.shape
    kh, kw, c, o = w_hwio.shape
    oh, ow = logical_out_hw
    ow_g = _cdiv(ow, f_out)
    (pt, pb), (pl_, pr) = pads
    compute = _compute_mode(compute)

    if kh == kw == 1 and s == 1 and pl_ == 0 and pt == 0:
        # 1x1: one flat matmul over B*H*Wg rows — the halo grid's
        # per-cell overhead dwarfs the tiny per-image dots otherwise
        wk, _, _ = repack_weights_folded(w_hwio, 1, f_out, 0, parts)
        wm = wk.reshape(wk.shape[2], f_out * o)
        # scales stay HOST numpy until _scale_rows (see its docstring)
        ws = np.asarray(w_scale, np.float32)
        if ws.ndim == 0:
            ws = np.full((o,), ws, np.float32)
        b0 = bias if bias is not None else jnp.zeros((o,), jnp.int32)
        if residual is not None:
            out = matmul_int8_fused_multi(
                [x_folded.reshape(n * h * wg, gc)], [jnp.asarray(wm)],
                jnp.tile(b0, f_out), [in_scale], np.tile(ws, f_out),
                out_scale, act=act, alpha=alpha,
                residual=residual.reshape(n * h * wg, -1),
                res_scale=res_scale, keep_phys=keep_phys,
                compute=compute)
        else:
            out = matmul_int8_fused(
                x_folded.reshape(n * h * wg, gc), jnp.asarray(wm),
                jnp.tile(b0, f_out), in_scale, np.tile(ws, f_out),
                out_scale, act=act, alpha=alpha, keep_phys=keep_phys,
                compute=compute)
        return out.reshape(n, h, wg, -1)

    wk, q_shift, qw = repack_weights_folded(
        w_hwio, s, f_out, pad_left=pl_, parts=parts)

    cp = _round_up(gc, 128)
    no = f_out * o
    op = _round_up(no, 128)
    block_n = min(block_n, op)
    wk = wk.reshape(kh * qw, wk.shape[2], no)
    wk = jnp.pad(jnp.asarray(wk), ((0, 0), (0, cp - wk.shape[1]),
                                   (0, op - no)))
    if compute == "bf16":
        if pipeline == "dma":
            raise ValueError("bf16 compute not supported on the dma "
                             "pipeline variant")
        wk = wk.astype(jnp.bfloat16)

    # bias / combined-scale rows tiled across output phases
    ws = np.asarray(w_scale, np.float32)
    if ws.ndim == 0:
        ws = np.full((o,), ws, np.float32)
    b0 = bias if bias is not None else jnp.zeros((o,), jnp.int32)
    b_t = jnp.tile(b0, f_out)
    ws_t = np.tile(ws, f_out)
    b, cs, inv_out = _scale_rows(b_t, ws_t, in_scale, out_scale, act, no, op)

    if tile_h is None:
        # largest divisor of OH <= the M-target: a divisor means the
        # output needs no row padding, so no slice-copy after the call
        target = min(oh, max(8, 2048 // max(ow_g, 1)))
        tile_h = target
        while tile_h > 1 and oh % tile_h:
            tile_h -= 1
        if tile_h < min(8, target):
            tile_h = target
    tile_h = min(tile_h, oh)
    n_tiles_h = _cdiv(oh, tile_h)

    # W: q_shift zero groups left; right cover (ow_g - 1) + qw groups
    need_wg = (ow_g - 1) + qw
    if pipeline == "dma":
        # manual DMA slices need the (sublane) W dim 8-aligned
        need_wg = _round_up(need_wg, 8)
    pad_wl = q_shift
    pad_wr = max(0, need_wg - pad_wl - wg)
    # H: pt rows top; bottom to s * ((n_tiles-1)*tile_h + tile_h + qh)
    qh_max = (kh - 1) // s
    halo_pairs = tile_h + qh_max
    need_rows = s * ((n_tiles_h - 1) * tile_h + halo_pairs)
    pad_hb = max(0, need_rows - (h + pt))
    if pt or pad_hb or pad_wl or pad_wr or cp != gc:
        x_folded = jnp.pad(x_folded, ((0, 0), (pt, pad_hb),
                                      (pad_wl, pad_wr), (0, cp - gc)))
    wq_tot = x_folded.shape[2]
    x5 = x_folded[:, :need_rows].reshape(n, need_rows // s, s, wq_tot, cp)

    if residual is not None and pipeline == "dma":
        raise ValueError("residual fusion not supported on the dma "
                         "pipeline variant")
    if pipeline == "dma":
        # one cell per (image, channel-block); in-kernel row loop with
        # two-slot slab DMA overlapping the next tile's fetch
        grid = (n, _cdiv(op, block_n))
        kernel = _named(functools.partial(
            _halo_kernel_dma, kh=kh, qw=qw, s=s, tile_h=tile_h, ow=ow_g,
            n_tiles=n_tiles_h, halo_pairs=halo_pairs,
            act=act, inv_out=inv_out, alpha=alpha),
            f"halodma{kh}x{qw}_{oh}x{ow_g}x{cp}o{op}_{act}")
        out = pl.pallas_call(
            kernel,
            name=getattr(kernel, '__name__', None),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((kh * qw, cp, block_n),
                             lambda ni, oi: (0, 0, oi)),
                pl.BlockSpec((1, block_n), lambda ni, oi: (0, oi)),
                pl.BlockSpec((1, block_n), lambda ni, oi: (0, oi)),
            ],
            out_specs=pl.BlockSpec(
                (1, n_tiles_h * tile_h, ow_g, block_n),
                lambda ni, oi: (ni, 0, 0, oi)),
            out_shape=jax.ShapeDtypeStruct(
                (n, n_tiles_h * tile_h, ow_g, op), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(x5, wk, b, cs)
        out = out[:, :oh]
        if op != no and not keep_phys:
            out = out[..., :no]
        return out

    grid = (n, n_tiles_h, _cdiv(op, block_n))
    if act in ("NONE", "RELU", "LEAKY_RELU"):
        # keep in lockstep with _scale_rows' single-multiply tuple
        # (res + LEAKY is rejected in _act_requant either way)
        res_scale_eff = float(np.float32(res_scale) / np.float32(out_scale))
    else:
        res_scale_eff = float(np.float32(res_scale))
    kernel = _named(functools.partial(
        _halo_kernel, kh=kh, qw=qw, s=s, tile_h=tile_h, ow=ow_g,
        act=act, inv_out=inv_out, alpha=alpha,
        has_res=residual is not None, res_scale=res_scale_eff,
        compute=compute),
        f"halo{kh}x{qw}s{s}_{oh}x{ow_g}x{cp}o{op}_{act}"
        f"{'_res' if residual is not None else ''}"
        f"{'_bf16' if compute == 'bf16' else ''}")
    in_specs = [
        pl.BlockSpec(
            (_PL_ELEMENT(1), _PL_ELEMENT(halo_pairs), _PL_ELEMENT(s),
             _PL_ELEMENT(wq_tot), _PL_ELEMENT(cp)),
            lambda ni, ti, oi: (ni, ti * tile_h, 0, 0, 0)),
        pl.BlockSpec((kh * qw, cp, block_n),
                     lambda ni, ti, oi: (0, 0, oi)),
        pl.BlockSpec((1, block_n), lambda ni, ti, oi: (0, oi)),
        pl.BlockSpec((1, block_n), lambda ni, ti, oi: (0, oi)),
    ]
    inputs = [x5, wk, b, cs]
    if residual is not None:
        r = residual
        if r.shape[3] < op:
            r = jnp.pad(r, ((0, 0), (0, 0), (0, 0), (0, op - r.shape[3])))
        elif r.shape[3] > op:
            r = r[..., :op]
        if r.shape[1] != n_tiles_h * tile_h:
            r = jnp.pad(r, ((0, 0), (0, n_tiles_h * tile_h - r.shape[1]),
                            (0, 0), (0, 0)))
        inputs.append(r)
        in_specs.append(pl.BlockSpec(
            (1, tile_h, ow_g, block_n), lambda ni, ti, oi: (ni, ti, 0, oi)))
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, tile_h, ow_g, block_n),
            lambda ni, ti, oi: (ni, ti, 0, oi)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles_h * tile_h, ow_g, op), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
    )(*inputs)
    out = out[:, :oh]
    if op != no and not keep_phys:
        out = out[..., :no]
    return out


def unfold_layout(x_folded: jax.Array, f: int, c: int) -> jax.Array:
    """[N, H, Wg, f*C (+pad)] -> [N, H, Wg*f, C] (logical NHWC). Free in
    linear element order when unpadded; XLA may insert a relayout for
    C < 128 or when trailing lane padding must be sliced off."""
    n, h, wg, fc = x_folded.shape
    if fc != f * c:   # lane-padded phys group -> strip the pad
        assert fc > f * c, (fc, f, c)
        x_folded = x_folded[..., :f * c]
    return x_folded.reshape(n, h, wg * f, c)


def fold_layout(x: jax.Array, f: int) -> jax.Array:
    """[N, H, W, C] -> [N, H, W/f, f*C]."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // f, f * c)


# ---------------------------------------------------------------------------
# Fused C3 bottleneck: 1x1 conv -> KxK conv (+ residual) in ONE kernel
# ---------------------------------------------------------------------------
#
# The C3 bottleneck (``y = x + act(convKxK(act(conv1x1(x))))``, the
# dominant repeated block of the YOLO trunk) currently costs two pallas
# calls with the intermediate ``m`` round-tripping HBM (write + read)
# plus a halo ``jnp.pad`` between them. This kernel keeps ``m``
# entirely in VMEM: each grid cell computes the 1x1 over its row-tile
# *plus the KxK halo rows* (2 extra rows of recompute per tile), masks
# the out-of-image positions to the quantized zero, runs the KxK taps
# on the in-register value, and applies the second epilogue (+ fused
# residual = the slab's own center rows). HBM traffic per bottleneck
# drops from (read x, write m, read m, read x-as-residual, write y) to
# (read x, write y). The reference's moral analog is the per-pixel
# im2col staging buffer that never leaves the stack
# (``src/mars/mxu_conv.c:254-407``).


def _bneck_kernel(x_ref, w1_ref, b1_ref, cs1_ref, w2_ref, b2_ref,
                  cs2_ref, out_ref, *,
                  k: int, qw2: int, q_shift: int, tile_h: int, ow_g: int,
                  oh_img: int, wg_img: int,
                  act1: str, inv1: float, alpha1: float,
                  act2: str, inv2: float, alpha2: float,
                  has_res: bool, res_scale: float,
                  compute: str = "int8"):
    ti = pl.program_id(1)
    hh = (k - 1) // 2
    slab = x_ref[0]                       # [halo_rows, wq_tot, cp]
    halo_rows, wq_tot, cp = slab.shape
    cm = w1_ref.shape[-1]                 # padded m lanes
    if compute == "bf16":
        slab = slab.astype(jnp.bfloat16)

    # 1x1 over the full slab extent (incl. pad rows/cols: masked below)
    acc1 = _dot_c(slab.reshape(halo_rows * wq_tot, cp), w1_ref[0],
                  compute)
    m = _epilogue(acc1, b1_ref[:], cs1_ref[:],
                  act=act1, inv_out=inv1, alpha=alpha1)
    m = m.reshape(halo_rows, wq_tot, cm)
    # out-of-image positions must be the quantized ZERO (the KxK pad
    # semantics), not epilogue(bias): mask by image coordinates
    r_img = (jax.lax.broadcasted_iota(jnp.int32, m.shape, 0)
             + (ti * tile_h - hh))
    c_grp = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    valid = ((r_img >= 0) & (r_img < oh_img)
             & (c_grp >= q_shift) & (c_grp < q_shift + wg_img))
    m = jnp.where(valid, m, jnp.int8(0))
    if compute == "bf16":
        m = m.astype(jnp.bfloat16)   # one cast; taps slice bf16 data
    # tap windows slice the live value. Tried and reverted (round 3):
    # staging m through per-qx pre-shifted VMEM scratch buffers wins
    # on a stripped RELU kernel (142 -> 210 TOP/s: each [.., qx:qx+ow]
    # window starts at sublane offset qx and costs a vector rotate)
    # but LOSES 3-5% on the production SiLU kernels in the full model
    # — the qw2 scratch copies cost more than the rotations they save
    # once the epilogue dominates (docs/KERNELS.md round-3 addenda).
    acc = None
    for dy in range(k):
        for qx in range(qw2):
            t_ = m[dy:dy + tile_h, qx:qx + ow_g, :]
            p = _dot_c(t_.reshape(tile_h * ow_g, cm),
                       w2_ref[dy * qw2 + qx], compute)
            acc = p if acc is None else acc + p
    res = None
    if has_res:
        res = slab[hh:hh + tile_h, q_shift:q_shift + ow_g, :] \
            .reshape(tile_h * ow_g, cp)
    q = _epilogue(acc, b2_ref[:], cs2_ref[:], act=act2, inv_out=inv2,
                  alpha=alpha2, res=res, res_scale=res_scale)
    out_ref[:] = q.reshape(1, tile_h, ow_g, -1)


def bottleneck_int8_fused(
    x_folded: jax.Array,          # [N, H, Wg, gC(+pad)] int8, fold f
    w1_hwio: jax.Array,           # [1, 1, C, c_] int8
    b1: Optional[jax.Array],      # [c_] int32 (units in_scale*w1_scale)
    w1_scale, m_scale: float,     # intermediate tensor's quant scale
    w2_hwio: jax.Array,           # [K, K, c_, O] int8 (K odd, stride 1)
    b2: Optional[jax.Array],      # [O] int32 (units m_scale*w2_scale)
    w2_scale, out_scale: float,
    in_scale: float,
    logical_hw: Tuple[int, int],  # (H, W) logical — output == input hw
    f: int = 1,
    parts: Optional[Tuple[int, ...]] = None,
    act1: str = "SILU", act2: str = "SILU",
    alpha1: float = 0.01, alpha2: float = 0.01,
    shortcut: bool = False,       # fuse ``+ x`` into the 2nd epilogue
    tile_h: Optional[int] = None,
    keep_phys: bool = False,
    compute: Optional[str] = None,
) -> jax.Array:
    """Fused ``requant(act2(convKxK(requant(act1(conv1x1(x)))))[+x])``
    with the intermediate resident in VMEM. SAME padding, stride 1,
    square odd K. ``out_scale`` is the scale of the bottleneck's OUTPUT
    tensor (the ADD's output when ``shortcut``), matching the serving
    tier's fused-residual semantics."""
    n, h, wg, gc = x_folded.shape
    k, kw2, c_, o = w2_hwio.shape
    assert k == kw2 and k % 2 == 1, (k, kw2)
    oh, ow = logical_hw
    ow_g = _cdiv(ow, f)
    assert wg == ow_g, (wg, ow_g)
    hh = (k - 1) // 2
    if shortcut:
        assert o * f <= gc, (o, f, gc)   # residual lanes come from x

    # weights: 1x1 consuming x's folded/padded layout -> m (fold f),
    # KxK consuming m (fold f) with the left pad baked into the taps
    w1k, _, _ = repack_weights_folded(w1_hwio, 1, f, 0, parts)
    cm_log = f * c_
    cm_p = _round_up(cm_log, 128)
    cp = _round_up(gc, 128)
    assert w1k.shape[2] == gc, (w1k.shape, gc)
    w1m = jnp.pad(jnp.asarray(w1k).reshape(1, gc, cm_log),
                  ((0, 0), (0, cp - gc), (0, cm_p - cm_log)))
    w2k, q_shift, qw2 = repack_weights_folded(w2_hwio, 1, f, hh, (c_,))
    no = f * o
    op = _round_up(no, 128)
    w2m = jnp.pad(jnp.asarray(w2k).reshape(k * qw2, cm_log, no),
                  ((0, 0), (0, cm_p - cm_log), (0, op - no)))
    compute = _compute_mode(compute)
    if compute == "bf16":
        w1m = w1m.astype(jnp.bfloat16)
        w2m = w2m.astype(jnp.bfloat16)
    if shortcut and cp != op:
        raise ValueError("fused residual needs matching phys lanes "
                         f"(x {cp} vs out {op})")

    ws1 = np.asarray(w1_scale, np.float32)
    if ws1.ndim == 0:
        ws1 = np.full((c_,), ws1, np.float32)
    b1v = b1 if b1 is not None else jnp.zeros((c_,), jnp.int32)
    b1r, cs1, inv1 = _scale_rows(jnp.tile(b1v, f), np.tile(ws1, f),
                                 in_scale, m_scale, act1, cm_log, cm_p)
    ws2 = np.asarray(w2_scale, np.float32)
    if ws2.ndim == 0:
        ws2 = np.full((o,), ws2, np.float32)
    b2v = b2 if b2 is not None else jnp.zeros((o,), jnp.int32)
    b2r, cs2, inv2 = _scale_rows(jnp.tile(b2v, f), np.tile(ws2, f),
                                 m_scale, out_scale, act2, no, op)
    if act2 in ("NONE", "RELU"):
        res_scale_eff = float(np.float32(in_scale) / np.float32(out_scale))
    else:
        res_scale_eff = float(np.float32(in_scale))

    if tile_h is None:
        target = min(oh, max(8, 2048 // max(ow_g, 1)))
        tile_h = target
        while tile_h > 1 and oh % tile_h:
            tile_h -= 1
        if tile_h < min(8, target):
            tile_h = target
    tile_h = min(tile_h, oh)
    n_tiles_h = _cdiv(oh, tile_h)
    halo_rows = tile_h + k - 1

    # pad: hh rows top, bottom to the last tile's halo; q_shift zero
    # groups left, right to (ow_g - 1) + qw2 groups; lanes to cp
    need_rows = (n_tiles_h - 1) * tile_h + halo_rows
    pad_hb = max(0, need_rows - (h + hh))
    wq_tot = (ow_g - 1) + qw2
    pad_wr = max(0, wq_tot - (q_shift + wg))
    x_p = jnp.pad(x_folded, ((0, 0), (hh, pad_hb),
                             (q_shift, pad_wr), (0, cp - gc)))

    grid = (n, n_tiles_h)
    kernel = _named(functools.partial(
        _bneck_kernel, k=k, qw2=qw2, q_shift=q_shift, tile_h=tile_h,
        ow_g=ow_g, oh_img=oh, wg_img=wg,
        act1=act1, inv1=inv1, alpha1=alpha1,
        act2=act2, inv2=inv2, alpha2=alpha2,
        has_res=shortcut, res_scale=res_scale_eff, compute=compute),
        f"bneck{k}_{oh}x{ow_g}x{cp}m{cm_p}o{op}_{act2}"
        f"{'_res' if shortcut else ''}"
        f"{'_bf16' if compute == 'bf16' else ''}")
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_PL_ELEMENT(1), _PL_ELEMENT(halo_rows),
                 _PL_ELEMENT(wq_tot), _PL_ELEMENT(cp)),
                lambda ni, ti: (ni, ti * tile_h, 0, 0)),
            pl.BlockSpec((1, cp, cm_p), lambda ni, ti: (0, 0, 0)),
            pl.BlockSpec((1, cm_p), lambda ni, ti: (0, 0)),
            pl.BlockSpec((1, cm_p), lambda ni, ti: (0, 0)),
            pl.BlockSpec((k * qw2, cm_p, op), lambda ni, ti: (0, 0, 0)),
            pl.BlockSpec((1, op), lambda ni, ti: (0, 0)),
            pl.BlockSpec((1, op), lambda ni, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow_g, op), lambda ni, ti: (ni, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles_h * tile_h, ow_g, op), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x_p, w1m, b1r, cs1, w2m, b2r, cs2)
    out = out[:, :oh]
    if op != no and not keep_phys:
        out = out[..., :no]
    return out


# ---------------------------------------------------------------------------
# Fused depthwise conv (VPU multiply-accumulate over taps)
# ---------------------------------------------------------------------------


def _dw_kernel(x_ref, w_ref, bias_ref, cs_ref, out_ref, *,
               kh: int, kw: int, s: int, tile_h: int, ow: int,
               act: str, inv_out: float, alpha: float):
    # x_ref: [1, halo_pairs, s, Wp, C]; w_ref: [kh*kw, 1, C] (broadcast
    # rows); out_ref: [1, tile_h, ow, C]. Depthwise has no contraction
    # dim, so taps are VPU multiply-accumulates, not MXU dots.
    acc = None
    slab = x_ref[0]
    for dy in range(kh):
        for dx in range(kw):
            sl = slab[dy:dy + tile_h, 0, dx:dx + ow, :]
            p = sl.astype(jnp.int32) * w_ref[dy * kw + dx].astype(jnp.int32)
            acc = p if acc is None else acc + p
    acc2 = acc.reshape(tile_h * ow, -1)
    q = _epilogue(acc2, bias_ref[:], cs_ref[:],
                  act=act, inv_out=inv_out, alpha=alpha)
    out_ref[:] = q.reshape(1, tile_h, ow, -1)


def depthwise_conv2d_int8_fused(
    x: jax.Array,                # [N, H, W, C] int8
    w_khkwc: jax.Array,          # [KH, KW, C] int8
    bias: Optional[jax.Array],   # [C] int32
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    tile_h: Optional[int] = None,
) -> jax.Array:
    """Fused int8 depthwise conv: halo row slabs, per-tap VPU
    multiply-accumulate, requant/activation epilogue before the single
    int8 write. Stride-1 only (strided depthwise is rare and the XLA
    reference path covers it); the reference never implemented
    depthwise at all (``mars_runtime.c:1168-1213`` TODO)."""
    if stride != (1, 1):
        raise ValueError("fused depthwise kernel is stride-1 only")
    n, h, wd, c = x.shape
    kh, kw, _ = w_khkwc.shape
    oh, ow = out_hw
    (pt, pb), (pl_, pr) = pads
    # W: cover (ow - 1) + kw columns
    pr = max(pr, (ow - 1) + kw - (wd + pl_))
    xp = jnp.pad(x, ((0, 0), (pt, 0), (pl_, pr), (0, 0)))
    cp = _round_up(c, 128)
    if cp != c:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    wk = jnp.pad(w_khkwc, ((0, 0), (0, 0), (0, cp - c)))
    wk = wk.reshape(kh * kw, 1, cp)
    ws = np.asarray(w_scale, np.float32)
    if ws.ndim == 0:
        ws = np.full((c,), ws, np.float32)
    b0 = bias if bias is not None else jnp.zeros((c,), jnp.int32)
    b, cs, inv_out = _scale_rows(b0, ws, in_scale, out_scale, act, c, cp)

    if tile_h is None:
        target = min(oh, max(8, 2048 // max(ow, 1)))
        tile_h = target
        while tile_h > 1 and oh % tile_h:
            tile_h -= 1
        if tile_h < min(8, target):
            tile_h = target
    tile_h = min(tile_h, oh)
    n_tiles_h = _cdiv(oh, tile_h)
    halo_pairs = tile_h + kh - 1
    need_rows = (n_tiles_h - 1) * tile_h + halo_pairs
    if xp.shape[1] < need_rows:
        xp = jnp.pad(xp, ((0, 0), (0, need_rows - xp.shape[1]),
                          (0, 0), (0, 0)))
    wp_cols = xp.shape[2]
    x5 = xp[:, :need_rows].reshape(n, need_rows, 1, wp_cols, cp)

    grid = (n, n_tiles_h)
    kernel = _named(functools.partial(
        _dw_kernel, kh=kh, kw=kw, s=1, tile_h=tile_h, ow=ow,
        act=act, inv_out=inv_out, alpha=alpha),
        f"dw{kh}x{kw}_{ow}x{cp}_{act}")
    out = pl.pallas_call(
        kernel,
        name=getattr(kernel, '__name__', None),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_PL_ELEMENT(1), _PL_ELEMENT(halo_pairs), _PL_ELEMENT(1),
                 _PL_ELEMENT(wp_cols), _PL_ELEMENT(cp)),
                lambda ni, ti: (ni, ti * tile_h, 0, 0, 0)),
            pl.BlockSpec((kh * kw, 1, cp), lambda ni, ti: (0, 0, 0)),
            pl.BlockSpec((1, cp), lambda ni, ti: (0, 0)),
            pl.BlockSpec((1, cp), lambda ni, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, ow, cp), lambda ni, ti: (ni, ti, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (n, n_tiles_h * tile_h, ow, cp), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(x5, wk, b, cs)
    out = out[:, :oh]
    if cp != c:
        out = out[..., :c]
    return out


# ---------------------------------------------------------------------------
# Thin-input stem via XLA bf16 (exact)
# ---------------------------------------------------------------------------


def conv2d_int8_stem_fused(
    x: jax.Array,                # [N, H, W, C] int8 OR qbf16 (see below)
    w_hwio: jax.Array,
    bias: Optional[jax.Array],
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
    f_out: int = 1,              # emit W-folded [N, OH, OW/f, f*O]
    emit: str = "int8",          # "int8" (folded) | "qbf16"
) -> jax.Array:
    """Thin-channel convs (the stem stage) through XLA's native conv
    emitter, bit-exact.

    int8 values are exactly representable in bf16 (|v| <= 127 < 2^8),
    MXU bf16 products are exact in the f32 accumulator, and partial
    sums stay < 2^24 whenever K*K*C <= 1024 (worst case |x|=|w|=128:
    K*K*C*128*128 < 2^24) — so
    ``conv(bf16, bf16) -> f32`` reproduces the int32 accumulator bit
    for bit, while XLA picks thin-channel layouts that avoid the
    (8,128) int8 tiling blowup (42x HBM padding for C=3).

    ``emit="qbf16"``: return the requantized INTEGER values stored as
    bf16 instead of int8 — the next stem-stage conv consumes them
    directly (``x.astype(bf16)`` is then a no-op), so consecutive thin
    convs chain inside XLA's layout world with no int8 materialization,
    no fold reshape, and no relayout copy between them. int8/folding
    happens once, at the stage exit, on the smallest tensor.
    """
    kh, kw, cin, o = w_hwio.shape
    assert kh * kw * cin <= 1024, (
        "bf16-exact stem path needs K*K*C <= 1024 for exact f32 "
        f"accumulation; got {kh}x{kw}x{cin}")
    accf = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w_hwio.astype(jnp.bfloat16),
        stride, pads, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        accf = accf + bias.astype(jnp.float32)
    ws = np.asarray(w_scale, np.float32)
    if ws.ndim == 0:
        ws = np.full((o,), ws, np.float32)
    if act in ("NONE", "RELU", "LEAKY_RELU"):
        # LEAKY quantizes linearly first — alpha applies on the int8
        # domain below, matching the reference
        # (src/mars/mars_runtime.c:1078-1082). Scale math on the host
        # (numpy): TPU f32 division is 1 ulp off IEEE (see _scale_rows).
        cs = ((np.float32(in_scale) * ws)
              / np.float32(out_scale)).astype(np.float32)
        pre = accf * jnp.asarray(cs)
        if act == "RELU":
            pre = jnp.maximum(pre, 0.0)
        scaled = pre
    else:
        pre = accf * jnp.asarray(
            (np.float32(in_scale) * ws).astype(np.float32))
        if act == "SILU":
            pre = pre * jax.nn.sigmoid(pre)
        elif act == "SILU_FAST":
            pre = pre * _sigmoid_fast(pre)
        scaled = pre * jnp.float32(float(1.0 / np.float32(out_scale)))
    shifted = scaled + jnp.where(
        scaled >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    q = jnp.clip(jnp.trunc(shifted), -128, 127)
    if act == "LEAKY_RELU":
        neg = jnp.maximum(jnp.trunc(q * jnp.float32(alpha)), -128.0)
        q = jnp.where(q > 0, q, neg)
    if emit == "qbf16":
        return q.astype(jnp.bfloat16)
    out = q.astype(jnp.int8)
    if f_out > 1:
        # fold AFTER the int8 conversion: the W-fold reshape changes
        # the lane count (o -> f*o), which is a physical relayout —
        # doing it on 1-byte data is 4x cheaper than on the f32
        # accumulator (measured: the f32 copy+reshape+convert chain at
        # the stage exit cost ~70 us/frame on yolov5s@640 b128)
        n_, oh_, ow_, _ = out.shape
        out = out.reshape(n_, oh_, ow_ // f_out, f_out * o)
    return out


# ---------------------------------------------------------------------------
# Dispatcher
# ---------------------------------------------------------------------------


def conv2d_int8_fused(
    x: jax.Array,
    w_hwio: jax.Array,
    bias: Optional[jax.Array],
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    dilation: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale, out_scale: float,
    act: str = "NONE",
    alpha: float = 0.01,
) -> jax.Array:
    """Route an int8 conv to the best fused kernel:

    - 1x1 stride-1:  matmul
    - C < 16:        im2col + matmul (lane utilization; callers should
                     prefer an XLA bf16 stem at large batch — thin int8
                     NHWC tensors pad 42x in HBM)
    - else:          strided halo (any square stride, W-phase folded)
    """
    n, h, wd, c = x.shape
    kh, kw, _, o = w_hwio.shape
    if dilation != (1, 1):
        raise ValueError("fused kernels support dilation 1 only")
    if act not in ACTS:
        raise ValueError(f"unsupported fused activation {act!r}")
    if kh == kw == 1 and stride == (1, 1) and pads == ((0, 0), (0, 0)):
        out = matmul_int8_fused(
            x.reshape(n * h * wd, c), w_hwio.reshape(c, o), bias,
            in_scale, w_scale, out_scale, act, alpha)
        return out.reshape(n, h, wd, o)
    if stride[0] != stride[1]:
        raise ValueError("fused conv needs square stride")
    if c < 16:
        if kh * kw * c <= 1024:   # bf16-exact f32-accumulation bound
            return conv2d_int8_stem_fused(
                x, w_hwio, bias, out_hw, stride, pads,
                in_scale, w_scale, out_scale, act, alpha)
        return conv2d_int8_im2col_fused(
            x, w_hwio, bias, out_hw, stride, pads,
            in_scale, w_scale, out_scale, act, alpha)
    return conv2d_int8_halo_fused(
        x, w_hwio, bias, out_hw, pads,
        in_scale, w_scale, out_scale, act, alpha, stride=stride[0])
