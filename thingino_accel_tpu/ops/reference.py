"""Layer semantics in pure jnp (NHWC) — the parity oracle and fallback path.

Each function replicates the semantics of the corresponding executor in
``src/mars/mars_runtime.c`` (cited per-op). For int8 ops the integer
arithmetic is exact (int32 accumulation on the MXU via int8 matmuls), so
results are bit-identical to the C scalar reference ``conv2d_int8_sw``
(``src/mars/mars_runtime.c:461-508``) up to the documented rounding-rule
choice; for transcendental ops (sigmoid) agreement is within one int8
quantum when libm and XLA's exp differ by an ulp.

Conventions:
- activations: NHWC jax arrays (int8 or float32)
- conv weights: HWIO jax arrays (imported OIHW numpy is transposed once at
  engine build time); bias: 1-D int32/f32
- scales are static python floats — baked into the jitted program as
  constants, like the reference bakes them into each layer descriptor.

Where the C runtime is *deliberately not* replicated (its bugs), the
divergence is recorded in ``docs/DIVERGENCES.md``: no-op layers
(depthwise/avgpool/softmax/transpose, ``mars_runtime.c:1168-1213``),
maxpool reinterpreting f32 data as int8 bytes (``:931-932``), RELU6
executed as plain RELU (``:1180-1182``).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thingino_accel_tpu.ops.quant import (
    RoundMode, clamp_i8, requantize, round_to_int,
)

# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------


def _conv_pads(
    in_hw: Tuple[int, int],
    out_hw: Tuple[int, int],
    kernel: Tuple[int, int],
    stride: Tuple[int, int],
    dilation: Tuple[int, int],
    padding: str,
    explicit_pad: Tuple[int, int, int, int],
) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Resolve ((pt, pb), (pl, pr)) the way the reference does.

    SAME derives pads from the declared output shape
    (``src/mars/mars_runtime.c:591-598``); EXPLICIT uses pad_top/pad_left and
    implies the bottom/right pad from the output shape (the C loop bounds,
    ``:479-494``); VALID is zero.
    """
    kh = (kernel[0] - 1) * dilation[0] + 1
    kw = (kernel[1] - 1) * dilation[1] + 1
    if padding == "VALID":
        pt, pl = 0, 0
    elif padding == "SAME":
        pad_h = (out_hw[0] - 1) * stride[0] + kh - in_hw[0]
        pad_w = (out_hw[1] - 1) * stride[1] + kw - in_hw[1]
        pt = max(0, pad_h // 2)
        pl = max(0, pad_w // 2)
    else:  # EXPLICIT
        pt, pl = explicit_pad[0], explicit_pad[2]
    pb = max(0, (out_hw[0] - 1) * stride[0] + kh - in_hw[0] - pt)
    pr = max(0, (out_hw[1] - 1) * stride[1] + kw - in_hw[1] - pl)
    return (pt, pb), (pl, pr)


def _combined_scale(in_scale, w_scale, out_scale):
    """``in_scale * w_scale / out_scale`` in f32, scalar or per-output-
    channel (w_scale may be a 1-D array — per-channel quantization,
    broadcast over the epilogue's last axis)."""
    ws = np.asarray(w_scale, np.float32)
    cs = (np.float32(in_scale) * ws) / np.float32(out_scale)
    if cs.ndim == 0:
        return float(cs)
    return jnp.asarray(cs)


def conv2d_acc_i32(
    x: jax.Array,            # [N, H, W, C] int8
    w_hwio: jax.Array,       # [KH, KW, C, O] int8
    out_hw: Tuple[int, int],
    stride: Tuple[int, int] = (1, 1),
    dilation: Tuple[int, int] = (1, 1),
    pads: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
) -> jax.Array:
    """Zero-padded int8 conv -> int32 accumulator, exact.

    MXU path: a K*K sum of shifted int8 matmuls (XLA compiles each
    ``dot_general(int8, int8) -> int32`` onto the MXU natively; a direct
    int8 ``conv_general_dilated`` does not lower well). This replaces the
    reference's per-pixel im2col gather + S4MACSSB loop
    (``src/mars/mxu_conv.c:254-407``).
    """
    n, h, wd, c = x.shape
    kh, kw, _, o = w_hwio.shape
    oh, ow = out_hw
    (pt, pb), (pl, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            ys = dy * dilation[0]
            xs = dx * dilation[1]
            sl = jax.lax.slice(
                xp,
                (0, ys, xs, 0),
                (n, ys + (oh - 1) * stride[0] + 1,
                 xs + (ow - 1) * stride[1] + 1, c),
                (1, stride[0], stride[1], 1),
            )
            p = jax.lax.dot_general(
                sl, w_hwio[dy, dx],
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = p if acc is None else acc + p
    return acc


def conv2d_int8(
    x: jax.Array,
    w_hwio: jax.Array,
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
    """int8 conv with the reference requantization epilogue.

    ``out = clamp(round(sum * in_scale*w_scale/out_scale))`` with bias added
    to the int32 accumulator first (``src/mars/mxu_conv.c:144-252``); a
    trailing fused RELU clamps the *quantized* value at 0 the way
    ``execute_conv2d`` post-processes (``src/mars/mars_runtime.c:701-707``).
    """
    acc = conv2d_acc_i32(x, w_hwio, out_hw, stride, dilation, pads)
    if bias_i32 is not None:
        acc = acc + bias_i32.astype(jnp.int32)
    cs = _combined_scale(in_scale, w_scale, out_scale)
    out = requantize(acc, cs, round_mode)
    if relu:
        out = jnp.maximum(out, 0)
    return out


def conv2d_f32(
    x: jax.Array,
    w_hwio: jax.Array,
    bias: Optional[jax.Array],
    out_hw: Tuple[int, int],
    stride: Tuple[int, int],
    dilation: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    relu: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
    accum_dtype: Optional[jnp.dtype] = None,
) -> jax.Array:
    """f32 conv (``conv2d_float32_mxu``'s role, ``src/mars/mxu_conv.c:417-456``).

    Uses XLA's native convolution which tiles straight onto the MXU.
    ``compute_dtype=bfloat16`` is the fast serving path; float32 is the
    parity path. ``accum_dtype=bfloat16`` additionally accumulates in
    bf16 (~20% faster per conv measured on v5e, small accuracy cost).
    """
    n, h, wd, c = x.shape
    kh, kw, _, o = w_hwio.shape
    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32 else None)
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w_hwio.astype(compute_dtype),
        window_strides=stride,
        padding=pads,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype or jnp.float32,
        precision=precision,
    )
    out = out[:, :out_hw[0], :out_hw[1], :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    # bf16 serving keeps activations bf16 end-to-end (halves HBM traffic);
    # f32 parity path stays f32.
    if compute_dtype == jnp.bfloat16:
        return out.astype(jnp.bfloat16)
    return out.astype(jnp.float32)


def depthwise_conv2d_int8(
    x: jax.Array,                 # [N, H, W, C] int8
    w: jax.Array,                 # [KH, KW, C] int8 (per-channel taps)
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
    """Depthwise int8 conv, exact int32 accumulation on the VPU.

    Declared-but-unimplemented in the reference
    (``src/mars/mars_runtime.c:1168-1170``); semantics follow the compiler's
    ONNX mapping (groups == channels, ``mars-compiler/src/main.rs:76-103``).
    """
    n, h, wd, c = x.shape
    kh, kw, _ = w.shape
    oh, ow = out_hw
    (pt, pb), (pl, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            ys, xs = dy * dilation[0], dx * dilation[1]
            sl = jax.lax.slice(
                xp, (0, ys, xs, 0),
                (n, ys + (oh - 1) * stride[0] + 1,
                 xs + (ow - 1) * stride[1] + 1, c),
                (1, stride[0], stride[1], 1))
            p = sl.astype(jnp.int32) * w[dy, dx].astype(jnp.int32)
            acc = p if acc is None else acc + p
    if bias_i32 is not None:
        acc = acc + bias_i32.astype(jnp.int32)
    cs = _combined_scale(in_scale, w_scale, out_scale)
    out = requantize(acc, cs, round_mode)
    if relu:
        out = jnp.maximum(out, 0)
    return out


def depthwise_conv2d_f32(
    x: jax.Array, w: jax.Array, bias: Optional[jax.Array],
    out_hw: Tuple[int, int], stride: Tuple[int, int],
    dilation: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    relu: bool = False,
) -> jax.Array:
    """Depthwise f32 conv via feature_group_count (XLA-native)."""
    c = x.shape[3]
    kh, kw, _ = w.shape
    w4 = w.reshape(kh, kw, 1, c)  # HWIO with I=1, groups=C
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w4.astype(jnp.float32),
        window_strides=stride, padding=pads, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    out = out[:, :out_hw[0], :out_hw[1], :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if relu:
        out = jnp.maximum(out, 0.0)
    return out


def grouped_conv2d_int8(
    x: jax.Array, w_hwio: jax.Array, bias_i32: Optional[jax.Array],
    groups: int, out_hw: Tuple[int, int], stride: Tuple[int, int],
    dilation: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]],
    in_scale: float, w_scale: float, out_scale: float,
    round_mode: RoundMode = RoundMode.HALF_AWAY, relu: bool = False,
) -> jax.Array:
    """General grouped int8 conv: one shift+matmul conv per group."""
    c = x.shape[3]
    o = w_hwio.shape[3]
    cg, og = c // groups, o // groups
    outs = []
    for g in range(groups):
        acc = conv2d_acc_i32(
            x[..., g * cg:(g + 1) * cg],
            w_hwio[..., :, g * og:(g + 1) * og],
            out_hw, stride, dilation, pads)
        outs.append(acc)
    acc = jnp.concatenate(outs, axis=-1)
    if bias_i32 is not None:
        acc = acc + bias_i32.astype(jnp.int32)
    cs = _combined_scale(in_scale, w_scale, out_scale)
    out = requantize(acc, cs, round_mode)
    if relu:
        out = jnp.maximum(out, 0)
    return out


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------


def maxpool(
    x: jax.Array,
    kernel: Tuple[int, int],
    stride: Tuple[int, int],
    out_hw: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
) -> jax.Array:
    """MaxPool with edge-clipped windows.

    The reference clips out-of-bounds taps rather than padding
    (``src/mars/mars_runtime.c:939-950``); padding with the dtype's minimum
    is equivalent. Works for int8 and f32.
    """
    neg = x.dtype.type(jnp.iinfo(x.dtype).min) \
        if jnp.issubdtype(x.dtype, jnp.integer) else x.dtype.type(-jnp.inf)
    kh, kw = kernel
    oh, ow = out_hw
    (pt, _), (pl, _) = pads
    n, h, w, c = x.shape
    pb = max(0, (oh - 1) * stride[0] + kh - h - pt)
    pr = max(0, (ow - 1) * stride[1] + kw - w - pl)
    out = jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (pt, pb), (pl, pr), (0, 0)),
    )
    return out[:, :oh, :ow, :]


def avgpool(
    x: jax.Array,
    kernel: Tuple[int, int],
    stride: Tuple[int, int],
    out_hw: Tuple[int, int],
    pads: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0)),
    in_scale: float = 1.0,
    out_scale: float = 1.0,
) -> jax.Array:
    """AvgPool, count_include_pad=False (ONNX default the compiler maps,
    ``mars-compiler/src/main.rs:76-103``); unimplemented in the reference
    runtime (``src/mars/mars_runtime.c:1175-1177``) so semantics follow the
    compiler's source op. int8 path dequantizes, averages in f32, requants
    with the elementwise rule."""
    kh, kw = kernel
    oh, ow = out_hw
    (pt, _), (pl, _) = pads
    n, h, w, c = x.shape
    pb = max(0, (oh - 1) * stride[0] + kh - h - pt)
    pr = max(0, (ow - 1) * stride[1] + kw - w - pl)
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    xf = x.astype(jnp.float32)
    summed = jax.lax.reduce_window(
        xf, 0.0, jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (pt, pb), (pl, pr), (0, 0)))
    ones = jnp.ones((1, h, w, 1), jnp.float32)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (pt, pb), (pl, pr), (0, 0)))
    avg = (summed / counts)[:, :oh, :ow, :]
    if is_int:
        avg = avg * jnp.float32(in_scale)
        q = round_to_int(avg / jnp.float32(out_scale), RoundMode.PLUS_HALF_TRUNC)
        return clamp_i8(q)
    return avg


def global_avgpool(
    x: jax.Array, in_scale: float = 1.0, out_scale: float = 1.0
) -> jax.Array:
    """GlobalAvgPool -> [N, 1, 1, C]."""
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    avg = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
    if is_int:
        avg = avg * jnp.float32(in_scale)
        q = round_to_int(avg / jnp.float32(out_scale), RoundMode.PLUS_HALF_TRUNC)
        return clamp_i8(q)
    return avg


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def relu(x: jax.Array) -> jax.Array:
    """ReLU (``src/mars/mars_runtime.c:1066-1086``). int8 and f32."""
    return jnp.maximum(x, jnp.zeros((), x.dtype))


def relu6(x: jax.Array, scale: float = 1.0, compat: bool = False) -> jax.Array:
    """ReLU6. The reference executes RELU6 as plain RELU
    (``src/mars/mars_runtime.c:1180-1182`` dispatches to execute_relu which
    never clamps at 6): ``compat=True`` replicates that; otherwise the int8
    upper clamp is ``round(6/scale)``."""
    out = jnp.maximum(x, jnp.zeros((), x.dtype))
    if compat:
        return out
    if jnp.issubdtype(x.dtype, jnp.integer):
        hi = int(np.clip(np.trunc(6.0 / np.float32(scale) + 0.5), -128, 127))
        return jnp.minimum(out, jnp.asarray(hi, x.dtype))
    return jnp.minimum(out, jnp.asarray(6.0, x.dtype))


def leaky_relu(x: jax.Array, alpha: float = 0.01) -> jax.Array:
    """LeakyReLU. int8 negative branch: ``(int8)max(-128, (int32)(x*alpha))``
    with C float->int truncation (``src/mars/mars_runtime.c:1078-1082``)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        neg = jnp.trunc(x.astype(jnp.float32) * jnp.float32(alpha))
        neg = jnp.maximum(neg, -128.0).astype(jnp.int8)
        return jnp.where(x > 0, x, neg)
    return jnp.where(x > 0, x, x * jnp.float32(alpha))


def sigmoid(
    x: jax.Array, in_scale: float = 1.0, out_scale: float = 1.0
) -> jax.Array:
    """Sigmoid (``src/mars/mars_runtime.c:723-771``).

    int8: dequant -> 1/(1+exp(-x)) -> ``(int)(y/out_scale + 0.5)`` -> clamp.
    """
    if jnp.issubdtype(x.dtype, jnp.integer):
        xf = x.astype(jnp.float32) * jnp.float32(in_scale)
        y = jax.nn.sigmoid(xf)
        os = float(out_scale) if out_scale > 0 else 1.0
        q = round_to_int(y / jnp.float32(os), RoundMode.PLUS_HALF_TRUNC)
        return clamp_i8(q)
    return jax.nn.sigmoid(x)


def silu(
    x: jax.Array,
    in_scale: float = 1.0,
    sig_scale: float = 1.0,
    out_scale: float = 1.0,
    fuse: bool = True,
) -> jax.Array:
    """SiLU = x * sigmoid(x).

    The graphs express it as SIGMOID + MUL (``src/mars/mars_runtime.c:
    1184-1186``). ``fuse=False`` replicates the exact two-step int8
    dataflow (sigmoid requantized to ``sig_scale`` first, then the MUL's
    reciprocal-multiply requant); ``fuse=True`` computes in f32 and
    requantizes once — faster, ≤1 quantum difference.
    """
    if not jnp.issubdtype(x.dtype, jnp.integer):
        # compute in the activation dtype (bf16 stays bf16 on the VPU).
        # TAT_SILU_TANH: sigmoid(x) = 0.5*(tanh(x/2)+1) — same function
        # with no divide. Measured NEGATIVE on v5e (3,940 vs 4,008 fps
        # e2e): the conv+SiLU fusions are memory-bound, so removing
        # the divide doesn't pay (consistent with the round-2
        # SiLU<->RELU <3% experiment). Kept for other topologies.
        from thingino_accel_tpu.utils import config as _cfg
        if _cfg.get("TAT_SILU_TANH"):
            half = jnp.asarray(0.5, x.dtype)
            one = jnp.asarray(1.0, x.dtype)
            return x * (half * (jnp.tanh(x * half) + one))
        return x * jax.nn.sigmoid(x)
    if fuse:
        xf = x.astype(jnp.float32) * jnp.float32(in_scale)
        y = xf * jax.nn.sigmoid(xf)
        os = float(out_scale) if out_scale > 0 else 1.0
        q = round_to_int(y * jnp.float32(1.0 / np.float32(os)),
                         RoundMode.PLUS_HALF_TRUNC)
        return clamp_i8(q)
    s = sigmoid(x, in_scale, sig_scale)
    return mul_q(x, s, in_scale, sig_scale, out_scale)


def softmax(
    x: jax.Array, axis: int = -1,
    in_scale: float = 1.0, out_scale: float = 1.0, compat: bool = False,
) -> jax.Array:
    """Softmax. Unimplemented (pass-through) in the reference
    (``src/mars/mars_runtime.c:1211-1213``): ``compat=True`` replicates the
    pass-through; otherwise real softmax (int8 via dequant/requant)."""
    if compat:
        return x
    if jnp.issubdtype(x.dtype, jnp.integer):
        xf = x.astype(jnp.float32) * jnp.float32(in_scale)
        y = jax.nn.softmax(xf, axis=axis)
        os = float(out_scale) if out_scale > 0 else 1.0
        q = round_to_int(y / jnp.float32(os), RoundMode.PLUS_HALF_TRUNC)
        return clamp_i8(q)
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)


# ---------------------------------------------------------------------------
# Elementwise binary (quantized)
# ---------------------------------------------------------------------------


def _requant_recip(y: jax.Array, out_scale: float) -> jax.Array:
    """The mul/add epilogue: ``(int)(y * (1.0f/out_scale) + 0.5f)`` — note
    reciprocal-multiply, not divide (``src/mars/mars_runtime.c:825-835``)."""
    os = np.float32(out_scale) if out_scale > 0 else np.float32(1.0)
    inv = np.float32(1.0) / os
    q = round_to_int(y * jnp.float32(inv), RoundMode.PLUS_HALF_TRUNC)
    return clamp_i8(q)


def _deq_operand(v: jax.Array, s: float) -> jax.Array:
    """Integer operands dequantize by their scale; float operands are
    already real values (their recorded scale is bookkeeping for a
    later QUANT, not a factor)."""
    if jnp.issubdtype(v.dtype, jnp.integer):
        return v.astype(jnp.float32) * jnp.float32(s)
    return v.astype(jnp.float32)


def mul_q(
    a: jax.Array, b: jax.Array,
    a_scale: float = 1.0, b_scale: float = 1.0, out_scale: float = 1.0,
) -> jax.Array:
    """Elementwise mul (``src/mars/mars_runtime.c:774-838``). Mixed
    int/float operands dequantize EACH side by its own dtype (dispatch
    on the first operand alone multiplied raw int8 codes as reals)."""
    a_int = jnp.issubdtype(a.dtype, jnp.integer)
    b_int = jnp.issubdtype(b.dtype, jnp.integer)
    if not a_int and not b_int:
        return a * b
    y = _deq_operand(a, a_scale) * _deq_operand(b, b_scale)
    return _requant_recip(y, out_scale)


def add_q(
    a: jax.Array, b: jax.Array,
    a_scale: float = 1.0, b_scale: float = 1.0, out_scale: float = 1.0,
) -> jax.Array:
    """Elementwise add (``src/mars/mars_runtime.c:841-905``). Mixed
    operands: see :func:`mul_q`."""
    a_int = jnp.issubdtype(a.dtype, jnp.integer)
    b_int = jnp.issubdtype(b.dtype, jnp.integer)
    if not a_int and not b_int:
        return a + b
    y = _deq_operand(a, a_scale) + _deq_operand(b, b_scale)
    return _requant_recip(y, out_scale)


# ---------------------------------------------------------------------------
# Shape / layout ops
# ---------------------------------------------------------------------------


def concat(xs: Sequence[jax.Array], axis: int) -> jax.Array:
    """Concat — a raw copy, no requantization, exactly like the reference
    (``src/mars/mars_runtime.c:963-1000`` copies int8 bytes; producers are
    expected to share the output scale)."""
    return jnp.concatenate(list(xs), axis=axis)


def upsample_nearest(
    x: jax.Array, scale: Tuple[int, int], out_hw: Tuple[int, int]
) -> jax.Array:
    """Nearest-neighbor upsample (``src/mars/mars_runtime.c:1003-1044``):
    ``src = dst // scale`` index map == repeat then crop."""
    sh, sw = scale
    out = jnp.repeat(jnp.repeat(x, sh, axis=1), sw, axis=2)
    return out[:, :out_hw[0], :out_hw[1], :]


def upsample_bilinear(
    x: jax.Array, out_hw: Tuple[int, int]
) -> jax.Array:
    """Bilinear upsample (mode=1 in mars_upsample_params_t,
    ``include/mars.h:185``; never executed by the reference runtime)."""
    n, h, w, c = x.shape
    is_int = jnp.issubdtype(x.dtype, jnp.integer)
    xf = x.astype(jnp.float32)
    out = jax.image.resize(xf, (n, out_hw[0], out_hw[1], c), method="bilinear")
    if is_int:
        return clamp_i8(round_to_int(out, RoundMode.HALF_AWAY))
    return out


def batchnorm(
    x: jax.Array,               # NHWC
    scale: jax.Array,           # [C] f32 (fused gamma/sqrt(var))
    bias: jax.Array,            # [C] f32
    in_scale: float = 1.0,
    out_scale: float = 1.0,
) -> jax.Array:
    """Fused-parameter BatchNorm ``y = x*scale + bias`` per channel
    (``src/mars/mars_runtime.c:1092-1158``; int8 requant rule ``:1147``)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        ins = np.float32(in_scale) if in_scale > 0 else np.float32(1.0)
        os = np.float32(out_scale) if out_scale > 0 else np.float32(1.0)
        xf = x.astype(jnp.float32) * jnp.float32(ins)
        y = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        q = round_to_int(y / jnp.float32(os), RoundMode.PLUS_HALF_TRUNC)
        return clamp_i8(q)
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def fc(
    x: jax.Array,               # [N, K] (flattened by caller)
    w: jax.Array,               # [K, O]
    bias: Optional[jax.Array],
    in_scale: float = 1.0, w_scale: float = 1.0, out_scale: float = 1.0,
    relu_act: bool = False,
) -> jax.Array:
    """Fully-connected. Declared in the format (``include/mars.h:195-199``)
    but never executed by the reference runtime; int8 semantics follow the
    conv epilogue (HALF_AWAY requant)."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        acc = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        if bias is not None:
            acc = acc + bias.astype(jnp.int32)
        cs = _combined_scale(in_scale, w_scale, out_scale)
        out = requantize(acc, cs, RoundMode.HALF_AWAY)
    else:
        out = x @ w
        if bias is not None:
            out = out + bias
    if relu_act:
        out = jnp.maximum(out, jnp.zeros((), out.dtype))
    return out
