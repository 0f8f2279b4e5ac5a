"""Serving-tier fused kernel tests (interpret mode on CPU; the compiled
path is exercised on hardware by bench/TAT_TPU_TESTS runs).

Oracle: a numpy implementation of the serving epilogue —
``q = clamp(round_half_away(act(acc * in_s*w_s) / out_s))`` — with the
int32 conv accumulator computed exactly.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thingino_accel_tpu.ops import fused_kernels as FK


@pytest.fixture(autouse=True)
def _interpret_mode():
    if os.environ.get("TAT_TPU_TESTS") == "1":
        yield   # hardware run: compiled Mosaic path
        return
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _conv_acc(x, w, stride, pads):
    """int32 accumulator oracle, NHWC x HWIO."""
    (pt, pb), (pl, pr) = pads
    xp = np.pad(x.astype(np.int32), ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    n, h, wd, c = xp.shape
    kh, kw, _, o = w.shape
    oh = (h - kh) // stride[0] + 1
    ow = (wd - kw) // stride[1] + 1
    out = np.zeros((n, oh, ow, o), np.int32)
    for dy in range(kh):
        for dx in range(kw):
            sl = xp[:, dy:dy + (oh - 1) * stride[0] + 1:stride[0],
                    dx:dx + (ow - 1) * stride[1] + 1:stride[1], :]
            out += np.einsum("nhwc,co->nhwo", sl,
                             w[dy, dx].astype(np.int32))
    return out


def _oracle(acc, bias, in_s, w_s, out_s, act, alpha=0.01):
    if bias is not None:
        acc = acc + bias.astype(np.int32)
    ws = np.asarray(w_s, np.float32)
    if act in ("NONE", "RELU", "LEAKY_RELU"):
        # LEAKY quantizes linearly; alpha applies on the int8 value
        # (reference semantics, mars_runtime.c:1078-1082)
        cs = (np.float32(in_s) * ws / np.float32(out_s)).astype(np.float32)
        pre = acc.astype(np.float32) * cs
        if act == "RELU":
            pre = np.maximum(pre, 0.0)
        scaled = pre
    else:
        cs = (np.float32(in_s) * ws).astype(np.float32)
        pre = acc.astype(np.float32) * cs
        if act == "SILU":
            pre = pre * (1.0 / (1.0 + np.exp(-pre.astype(np.float64)))
                         ).astype(np.float32)
        scaled = pre * np.float32(1.0 / np.float32(out_s))
    shifted = scaled + np.where(scaled >= 0, np.float32(0.5),
                                np.float32(-0.5))
    q = np.clip(np.trunc(shifted), -128, 127)
    if act == "LEAKY_RELU":
        neg = np.maximum(np.trunc(q * np.float32(alpha)), -128.0)
        q = np.where(q > 0, q, neg)
    return q.astype(np.int8)


@pytest.mark.parametrize("act", ["NONE", "RELU", "LEAKY_RELU", "SILU"])
def test_matmul_fused_acts(rng, act):
    m, k, n = 48, 96, 72
    x = jnp.asarray(rng.integers(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (k, n), dtype=np.int8))
    b = jnp.asarray(rng.integers(-3000, 3000, (n,), dtype=np.int32))
    got = np.asarray(FK.matmul_int8_fused(x, w, b, 0.02, 0.015, 0.05,
                                          act=act))
    acc = np.asarray(x, np.int32) @ np.asarray(w, np.int32)
    ref = _oracle(acc, np.asarray(b), 0.02, 0.015, 0.05, act)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    # SILU epilogue: sigmoid impl may differ by 1 ulp at the round boundary
    tol = 1 if act == "SILU" else 0
    assert diff.max() <= tol, f"{act}: max diff {diff.max()}"


def test_matmul_fused_per_channel(rng):
    m, k, n = 32, 64, 40
    x = jnp.asarray(rng.integers(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (k, n), dtype=np.int8))
    ws = rng.uniform(0.001, 0.05, n).astype(np.float32)
    got = np.asarray(FK.matmul_int8_fused(x, w, None, 0.02, ws, 0.05,
                                          act="RELU"))
    acc = np.asarray(x, np.int32) @ np.asarray(w, np.int32)
    ref = _oracle(acc, None, 0.02, ws, 0.05, "RELU")
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("k,stride,c,o", [
    (3, 1, 32, 48),
    (3, 2, 32, 48),
    (6, 2, 3, 16),     # the YOLO stem shape class (im2col path)
    (1, 1, 32, 64),    # matmul path
    (5, 1, 16, 32),
    (3, 2, 3, 8),      # thin input AND strided
])
def test_conv_fused_routes(rng, k, stride, c, o):
    h = w = 16
    pad = (k - 1) // 2
    x = jnp.asarray(rng.integers(-128, 128, (2, h, w, c), dtype=np.int8))
    wt = jnp.asarray(rng.integers(-64, 64, (k, k, c, o), dtype=np.int8))
    b = jnp.asarray(rng.integers(-500, 500, (o,), dtype=np.int32))
    oh = (h + 2 * pad - k) // stride + 1
    ow = (w + 2 * pad - k) // stride + 1
    got = np.asarray(FK.conv2d_int8_fused(
        x, wt, b, (oh, ow), (stride, stride), (1, 1),
        ((pad, pad), (pad, pad)), 0.05, 0.02, 0.1, act="SILU"))
    acc = _conv_acc(np.asarray(x), np.asarray(wt), (stride, stride),
                    ((pad, pad), (pad, pad)))
    ref = _oracle(acc, np.asarray(b), 0.05, 0.02, 0.1, "SILU")
    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max diff {diff.max()}"


def test_conv_fused_linear_exact_vs_reference(rng):
    """For NONE/RELU + scalar scale the fused kernel must match the
    exact-tier XLA path bit for bit (same combined-scale f32 math)."""
    from thingino_accel_tpu.ops import reference as R
    x = jnp.asarray(rng.integers(-128, 128, (2, 12, 12, 32), dtype=np.int8))
    wt = jnp.asarray(rng.integers(-64, 64, (3, 3, 32, 48), dtype=np.int8))
    b = jnp.asarray(rng.integers(-500, 500, (48,), dtype=np.int32))
    for stride in (1, 2):
        oh = ow = (12 + 2 - 3) // stride + 1
        got = np.asarray(FK.conv2d_int8_fused(
            x, wt, b, (oh, ow), (stride, stride), (1, 1),
            ((1, 1), (1, 1)), 0.05, 0.02, 0.1, act="RELU"))
        ref = np.asarray(R.conv2d_int8(
            x, wt, b, (oh, ow), (stride, stride), (1, 1),
            ((1, 1), (1, 1)), 0.05, 0.02, 0.1, relu=True))
        np.testing.assert_array_equal(got, ref, err_msg=f"stride {stride}")


def test_wfold_weight_repack(rng):
    w = rng.integers(-64, 64, (3, 3, 4, 8)).astype(np.int8)
    wq = FK.repack_weights_wfold(w, 2)
    assert wq.shape == (3, 2, 8, 8)
    # every original tap value appears exactly once
    assert np.sum(np.abs(wq.astype(np.int32))) == \
        np.sum(np.abs(w.astype(np.int32)))


def _fold_np(x, f):
    n, h, w, c = x.shape
    return x.reshape(n, h, w // f, f * c)


@pytest.mark.parametrize("k,s,f_out,c,o", [
    (3, 1, 1, 32, 48),
    (3, 1, 2, 64, 64),
    (3, 1, 4, 32, 32),
    (3, 2, 1, 64, 128),
    (3, 2, 2, 32, 64),
    (1, 1, 2, 64, 32),
    (5, 1, 1, 32, 32),
    (6, 2, 2, 16, 32),
])
def test_conv_folded_vs_oracle(rng, k, s, f_out, c, o):
    """Folded-layout conv == oracle on the logical tensors."""
    h = w = 16
    pad = (k - 1) // 2
    g = s * f_out
    x = rng.integers(-128, 128, (2, h, w, c), dtype=np.int8)
    wt = rng.integers(-64, 64, (k, k, c, o), dtype=np.int8)
    b = rng.integers(-500, 500, (o,), dtype=np.int32)
    oh = (h + 2 * pad - k) // s + 1
    ow = (w + 2 * pad - k) // s + 1
    xf = jnp.asarray(_fold_np(x, g))
    got_f = FK.conv2d_int8_folded(
        xf, jnp.asarray(wt), jnp.asarray(b), (oh, ow), s,
        ((pad, pad), (pad, pad)), 0.05, 0.02, 0.1,
        act="RELU", f_out=f_out)
    got = np.asarray(FK.unfold_layout(got_f, f_out, o))[:, :, :ow, :]
    acc = _conv_acc(x, wt, (s, s), ((pad, pad), (pad, pad)))
    ref = _oracle(acc, b, 0.05, 0.02, 0.1, "RELU")
    np.testing.assert_array_equal(got, ref)


def test_conv_folded_concat_parts(rng):
    """Conv consuming a folded channel-concat via weight permutation."""
    h = w = 8
    c1, c2, o, f = 16, 32, 32, 2
    x1 = rng.integers(-100, 100, (1, h, w, c1), dtype=np.int8)
    x2 = rng.integers(-100, 100, (1, h, w, c2), dtype=np.int8)
    wt = rng.integers(-64, 64, (3, 3, c1 + c2, o), dtype=np.int8)
    # folded concat: concat of folded parts (phys channel interleave)
    xf = jnp.concatenate(
        [jnp.asarray(_fold_np(x1, f)), jnp.asarray(_fold_np(x2, f))],
        axis=-1)
    got_f = FK.conv2d_int8_folded(
        xf, jnp.asarray(wt), None, (h, w), 1, ((1, 1), (1, 1)),
        0.05, 0.02, 0.1, act="SILU", f_out=f, parts=(c1, c2))
    got = np.asarray(FK.unfold_layout(got_f, f, o))[:, :, :w, :]
    x_cat = np.concatenate([x1, x2], axis=-1)
    acc = _conv_acc(x_cat, wt, (1, 1), ((1, 1), (1, 1)))
    ref = _oracle(acc, None, 0.05, 0.02, 0.1, "SILU")
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1


@pytest.mark.parametrize("k,c", [(3, 32), (5, 64), (3, 130)])
def test_depthwise_fused_vs_reference(rng, k, c):
    """Fused depthwise == the exact XLA depthwise path (RELU, scalar
    scale -> bit parity)."""
    from thingino_accel_tpu.ops import reference as R
    h = w = 12
    pad = (k - 1) // 2
    x = jnp.asarray(rng.integers(-128, 128, (2, h, w, c), dtype=np.int8))
    wt = jnp.asarray(rng.integers(-64, 64, (k, k, c), dtype=np.int8))
    b = jnp.asarray(rng.integers(-500, 500, (c,), dtype=np.int32))
    got = np.asarray(FK.depthwise_conv2d_int8_fused(
        x, wt, b, (h, w), (1, 1), ((pad, pad), (pad, pad)),
        0.05, 0.02, 0.1, act="RELU"))
    ref = np.asarray(R.depthwise_conv2d_int8(
        x, wt, b, (h, w), (1, 1), (1, 1), ((pad, pad), (pad, pad)),
        0.05, 0.02, 0.1, relu=True))
    np.testing.assert_array_equal(got, ref)


def test_depthwise_fused_silu_per_channel(rng):
    h = w = 8
    c = 48
    x = jnp.asarray(rng.integers(-100, 100, (1, h, w, c), dtype=np.int8))
    wt = jnp.asarray(rng.integers(-64, 64, (3, 3, c), dtype=np.int8))
    ws = rng.uniform(0.005, 0.05, c).astype(np.float32)
    got = np.asarray(FK.depthwise_conv2d_int8_fused(
        x, wt, None, (h, w), (1, 1), ((1, 1), (1, 1)),
        0.05, ws, 0.1, act="SILU"))
    # oracle
    xp = np.pad(np.asarray(x, np.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros((1, h, w, c), np.int32)
    for dy in range(3):
        for dx in range(3):
            acc += xp[:, dy:dy + h, dx:dx + w, :] * \
                np.asarray(wt, np.int32)[dy, dx]
    ref = _oracle(acc, None, 0.05, ws, 0.1, "SILU")
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_matmul_multi_vs_concat(rng):
    """Multi-part matmul == single matmul over the concatenated input."""
    m, k1, k2, n = 64, 96, 160, 64
    x1 = rng.integers(-100, 100, (m, k1), dtype=np.int8)
    x2 = rng.integers(-100, 100, (m, k2), dtype=np.int8)
    w = rng.integers(-64, 64, (k1 + k2, n), dtype=np.int8)
    b = rng.integers(-500, 500, (n,), dtype=np.int32)
    for act in ("NONE", "SILU"):
        ref = np.asarray(FK.matmul_int8_fused(
            jnp.asarray(np.concatenate([x1, x2], 1)), jnp.asarray(w),
            jnp.asarray(b), 0.03, 0.02, 0.07, act=act))
        got = np.asarray(FK.matmul_int8_fused_multi(
            [jnp.asarray(x1), jnp.asarray(x2)],
            [jnp.asarray(w[:k1]), jnp.asarray(w[k1:])],
            jnp.asarray(b), [0.03, 0.03], 0.02, 0.07, act=act))
        np.testing.assert_array_equal(got, ref)


def test_matmul_multi_mixed_scales(rng):
    """Per-part input scales: f32 partial combine vs numpy oracle."""
    m, k1, k2, n = 32, 64, 64, 32
    x1 = rng.integers(-100, 100, (m, k1), dtype=np.int8)
    x2 = rng.integers(-100, 100, (m, k2), dtype=np.int8)
    w = rng.integers(-64, 64, (k1 + k2, n), dtype=np.int8)
    s1, s2, ws, so = 0.03, 0.05, 0.02, 0.07
    got = np.asarray(FK.matmul_int8_fused_multi(
        [jnp.asarray(x1), jnp.asarray(x2)],
        [jnp.asarray(w[:k1]), jnp.asarray(w[k1:])],
        None, [s1, s2], ws, so, act="RELU"))
    a1 = x1.astype(np.int32) @ w[:k1].astype(np.int32)
    a2 = x2.astype(np.int32) @ w[k1:].astype(np.int32)
    pre = (a1.astype(np.float32) * np.float32(s1)
           + a2.astype(np.float32) * np.float32(s2)) \
        * (np.float32(ws) / np.float32(so))
    pre = np.maximum(pre, 0.0)
    sh = pre + np.where(pre >= 0, np.float32(0.5), np.float32(-0.5))
    ref = np.clip(np.trunc(sh), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, ref)


def test_matmul_multi_residual(rng):
    """Fused residual: requant(act(x@w*s) + r*sr) vs oracle."""
    m, k, n = 64, 128, 64
    x = rng.integers(-100, 100, (m, k), dtype=np.int8)
    w = rng.integers(-64, 64, (k, n), dtype=np.int8)
    r = rng.integers(-128, 128, (m, n), dtype=np.int8)
    in_s, w_s, out_s, r_s = 0.03, 0.02, 0.07, 0.04
    for act in ("NONE", "SILU"):
        got = np.asarray(FK.matmul_int8_fused_multi(
            [jnp.asarray(x)], [jnp.asarray(w)], None, [in_s], w_s,
            out_s, act=act, residual=jnp.asarray(r), res_scale=r_s))
        acc = x.astype(np.int32) @ w.astype(np.int32)
        pre = acc.astype(np.float32) * np.float32(np.float32(in_s)
                                                  * np.float32(w_s))
        if act == "SILU":
            pre = pre * (1.0 / (1.0 + np.exp(-pre.astype(np.float64)))
                         ).astype(np.float32)
        val = pre + r.astype(np.float32) * np.float32(r_s)
        scaled = val * np.float32(1.0 / np.float32(out_s))
        sh = scaled + np.where(scaled >= 0, np.float32(0.5),
                               np.float32(-0.5))
        ref = np.clip(np.trunc(sh), -128, 127).astype(np.int8)
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, (act, diff.max())


def test_conv_folded_residual(rng):
    """Halo conv with fused residual add vs conv-then-add oracle."""
    h = w = 16
    c = o = 32
    f = 2
    x = rng.integers(-100, 100, (1, h, w, c), dtype=np.int8)
    r = rng.integers(-128, 128, (1, h, w, o), dtype=np.int8)
    wt = rng.integers(-64, 64, (3, 3, c, o), dtype=np.int8)
    in_s, w_s, out_s, r_s = 0.05, 0.02, 0.1, 0.06
    got_f = FK.conv2d_int8_folded(
        jnp.asarray(_fold_np(x, f)), jnp.asarray(wt), None, (h, w), 1,
        ((1, 1), (1, 1)), in_s, w_s, out_s, act="RELU", f_out=f,
        residual=jnp.asarray(_fold_np(r, f)), res_scale=r_s)
    got = np.asarray(FK.unfold_layout(got_f, f, o))[:, :, :w, :]
    acc = _conv_acc(x, wt, (1, 1), ((1, 1), (1, 1)))
    pre = acc.astype(np.float32) * (np.float32(in_s) * np.float32(w_s))
    pre = np.maximum(pre, 0.0)
    val = pre + r.astype(np.float32) * np.float32(r_s)
    scaled = val * np.float32(1.0 / np.float32(out_s))
    sh = scaled + np.where(scaled >= 0, np.float32(0.5), np.float32(-0.5))
    ref = np.clip(np.trunc(sh), -128, 127).astype(np.int8)
    # residual epilogue adds one more f32 op -> FMA-order rounding can
    # flip a half-way case by one quantum
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_sppf_fused_vs_oracle(rng):
    """SPPF kernel == maxpool chain + concat + 1x1 conv oracle."""
    h = w = 8
    c, o, k = 32, 64, 5
    p = (k - 1) // 2
    x = rng.integers(-128, 128, (2, h, w, c), dtype=np.int8)
    wt = rng.integers(-64, 64, (1, 1, 4 * c, o), dtype=np.int8)
    b = rng.integers(-500, 500, (o,), dtype=np.int32)

    def np_pool(z):
        zp = np.full((z.shape[0], h + 2 * p, w + 2 * p, c), -128, np.int8)
        zp[:, p:p + h, p:p + w] = z
        out = np.full_like(z, -128)
        for dy in range(k):
            for dx in range(k):
                out = np.maximum(out, zp[:, dy:dy + h, dx:dx + w])
        return out

    m1 = np_pool(x)
    m2 = np_pool(m1)
    m3 = np_pool(m2)
    cat = np.concatenate([x, m1, m2, m3], -1)
    acc = _conv_acc(cat, wt, (1, 1), ((0, 0), (0, 0)))
    for act in ("RELU", "SILU"):
        ref = _oracle(acc, b, 0.05, 0.02, 0.1, act)
        got = np.asarray(FK.sppf_int8_fused(
            jnp.asarray(x), jnp.asarray(wt), jnp.asarray(b), k,
            0.05, 0.02, 0.1, act=act))
        diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= (0 if act == "RELU" else 1), (act, diff.max())


def test_matmul_multi_mixed_scales_with_bias(rng):
    """Code-review regression: the mixed-scale path must scale the
    int32 bias by bias_scale (it used to add it raw, ~1/in_s too
    large)."""
    m, k1, k2, n = 32, 64, 64, 32
    x1 = rng.integers(-100, 100, (m, k1), dtype=np.int8)
    x2 = rng.integers(-100, 100, (m, k2), dtype=np.int8)
    w = rng.integers(-64, 64, (k1 + k2, n), dtype=np.int8)
    b = rng.integers(-500, 500, (n,), dtype=np.int32)
    s1, s2, ws, so = 0.03, 0.031, 0.02, 0.07
    got = np.asarray(FK.matmul_int8_fused_multi(
        [jnp.asarray(x1), jnp.asarray(x2)],
        [jnp.asarray(w[:k1]), jnp.asarray(w[k1:])],
        jnp.asarray(b), [s1, s2], ws, so, act="NONE", bias_scale=s1))
    a1 = x1.astype(np.int32) @ w[:k1].astype(np.int32)
    a2 = x2.astype(np.int32) @ w[k1:].astype(np.int32)
    pre = (a1.astype(np.float32) * np.float32(s1)
           + a2.astype(np.float32) * np.float32(s2)
           + b.astype(np.float32) * np.float32(s1)) \
        * (np.float32(ws) / np.float32(so))
    sh = pre + np.where(pre >= 0, np.float32(0.5), np.float32(-0.5))
    ref = np.clip(np.trunc(sh), -128, 127).astype(np.int8)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, diff.max()


@pytest.mark.parametrize("f,c,c_,shortcut,act", [
    (1, 128, 64, True, "SILU"),     # yolov5 80x80-level bottleneck
    (2, 64, 32, True, "SILU"),      # 160x160-level (folded x2)
    (1, 64, 64, False, "RELU"),     # no shortcut, unpadded m lanes
    # LEAKY: no shortcut — its alpha applies post-quantization, which
    # excludes the fused pre-quantization residual (executor gate)
    (1, 32, 16, False, "LEAKY_RELU"),
])
def test_bottleneck_fused_vs_oracle(rng, f, c, c_, shortcut, act):
    """Fused 1x1 -> 3x3 (+residual) == the two-conv + add oracle with
    serving-tier semantics (one intermediate quantization at m)."""
    h, w = 8, 8 * f
    o = c
    x = rng.integers(-100, 100, (2, h, w, c), dtype=np.int8)
    w1 = rng.integers(-64, 64, (1, 1, c, c_), dtype=np.int8)
    b1 = rng.integers(-500, 500, (c_,), dtype=np.int32)
    w2 = rng.integers(-64, 64, (3, 3, c_, o), dtype=np.int8)
    b2 = rng.integers(-500, 500, (o,), dtype=np.int32)
    in_s, w1s, m_s, w2s, out_s = 0.04, 0.02, 0.06, 0.015, 0.09
    ws1 = rng.uniform(0.005, 0.03, c_).astype(np.float32)  # per-channel

    got_f = FK.bottleneck_int8_fused(
        jnp.asarray(_fold_np(x, f)), jnp.asarray(w1), jnp.asarray(b1),
        ws1, m_s, jnp.asarray(w2), jnp.asarray(b2), w2s, out_s,
        in_s, (h, w), f=f, act1=act, act2=act, shortcut=shortcut)
    got = np.asarray(FK.unfold_layout(got_f, f, o))

    # oracle: conv1x1 -> epilogue -> conv3x3 -> epilogue(+res)
    acc1 = _conv_acc(x, w1, (1, 1), ((0, 0), (0, 0)))
    m = _oracle(acc1, b1, in_s, ws1, m_s, act)
    acc2 = _conv_acc(m, w2, (1, 1), ((1, 1), (1, 1)))
    # mirror _epilogue's scale folding exactly: NONE/RELU fold /out_s
    # into the combined scale (single multiply, inv_out = 1)
    if act in ("NONE", "RELU", "LEAKY_RELU"):
        cs2 = np.float32(m_s) * np.float32(w2s) / np.float32(out_s)
        inv2, rs = np.float32(1.0), np.float32(in_s) / np.float32(out_s)
    else:
        cs2 = np.float32(m_s) * np.float32(w2s)
        inv2 = np.float32(1.0 / np.float32(out_s))
        rs = np.float32(in_s)
    accf = (acc2 + b2).astype(np.float32) * cs2
    if act == "RELU":
        pre = np.maximum(accf, 0.0)
    elif act in ("NONE", "LEAKY_RELU"):
        pre = accf
    else:
        pre = accf * (1.0 / (1.0 + np.exp(-accf.astype(np.float64)))
                      ).astype(np.float32)
    if shortcut:
        pre = pre + x.astype(np.float32) * rs
    scaled = pre * inv2
    sh = scaled + np.where(scaled >= 0, np.float32(0.5), np.float32(-0.5))
    ref = np.clip(np.trunc(sh), -128, 127)
    if act == "LEAKY_RELU":
        neg = np.maximum(np.trunc(ref * np.float32(0.01)), -128.0)
        ref = np.where(ref > 0, ref, neg)
    ref = ref.astype(np.int8)
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    tol = 0 if act == "RELU" else 1   # transcendental 1-ulp round flips
    assert diff.max() <= tol, (f, c, c_, act, diff.max())


def test_bottleneck_fused_lane_padded_parts(rng):
    """x arrives lane-padded (producer keep_phys): parts metadata must
    route the pad channels to zero weight rows."""
    f, c, c_, o = 1, 96, 48, 96
    h = w = 8
    x = rng.integers(-100, 100, (1, h, w, c), dtype=np.int8)
    xp = np.pad(x, ((0, 0), (0, 0), (0, 0), (0, 32)))   # phys 128
    w1 = rng.integers(-64, 64, (1, 1, c, c_), dtype=np.int8)
    w2 = rng.integers(-64, 64, (3, 3, c_, o), dtype=np.int8)
    in_s, w1s, m_s, w2s, out_s = 0.04, 0.02, 0.06, 0.015, 0.09
    got = np.asarray(FK.bottleneck_int8_fused(
        jnp.asarray(xp), jnp.asarray(w1), None, w1s, m_s,
        jnp.asarray(w2), None, w2s, out_s, in_s, (h, w), f=f,
        parts=(c, -32), act1="RELU", act2="RELU", shortcut=False))
    acc1 = _conv_acc(x, w1, (1, 1), ((0, 0), (0, 0)))
    m = _oracle(acc1, None, in_s, w1s, m_s, "RELU")
    acc2 = _conv_acc(m, w2, (1, 1), ((1, 1), (1, 1)))
    ref = _oracle(acc2, None, m_s, w2s, out_s, "RELU")
    np.testing.assert_array_equal(got[..., :o], ref)


# ---------------------------------------------------------------------------
# bf16 compute mode (int8 HBM I/O, in-VMEM cast, f32 MXU accumulation)
# ---------------------------------------------------------------------------
#
# For K*K*C <= 1024 the f32 accumulator carries the same integer value
# as the int8 path's int32 accumulator (int8 values are exact in bf16;
# products exact in the f32 MAC; |acc| < 2^24), and the epilogue
# arithmetic is shared — so the two compute modes must be BIT equal.


@pytest.mark.parametrize("act", ["NONE", "RELU", "SILU"])
def test_matmul_bf16_compute_bit_equal(rng, act):
    m, k, n = 48, 256, 72
    x = jnp.asarray(rng.integers(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (k, n), dtype=np.int8))
    b = jnp.asarray(rng.integers(-3000, 3000, (n,), dtype=np.int32))
    a = FK.matmul_int8_fused(x, w, b, 0.02, 0.015, 0.05, act=act,
                             compute="int8")
    g = FK.matmul_int8_fused(x, w, b, 0.02, 0.015, 0.05, act=act,
                             compute="bf16")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(g))


def test_conv_folded_bf16_compute_bit_equal(rng):
    c, o, h, w = 64, 48, 16, 16
    x = rng.integers(-128, 128, (1, h, w, c), dtype=np.int8)
    wt = rng.integers(-128, 128, (3, 3, c, o), dtype=np.int8)
    b = rng.integers(-2000, 2000, (o,), dtype=np.int32)
    args = (jnp.asarray(x), jnp.asarray(wt), jnp.asarray(b), (h, w), 1,
            ((1, 1), (1, 1)), 0.03, 0.02, 0.07)
    a = np.asarray(FK.conv2d_int8_folded(*args, act="SILU",
                                         compute="int8"))
    g = np.asarray(FK.conv2d_int8_folded(*args, act="SILU",
                                         compute="bf16"))
    np.testing.assert_array_equal(a, g)


def test_bottleneck_bf16_compute_bit_equal(rng):
    c, c_, o = 64, 32, 64
    h = w = 12
    x = rng.integers(-110, 110, (1, h, w, c), dtype=np.int8)
    w1 = rng.integers(-64, 64, (1, 1, c, c_), dtype=np.int8)
    w2 = rng.integers(-64, 64, (3, 3, c_, o), dtype=np.int8)
    scales = dict(w1_scale=0.02, m_scale=0.06, w2_scale=0.015,
                  out_scale=0.09, in_scale=0.04)
    outs = {}
    for mode in ("int8", "bf16"):
        outs[mode] = np.asarray(FK.bottleneck_int8_fused(
            jnp.asarray(x), jnp.asarray(w1), None,
            scales["w1_scale"], scales["m_scale"],
            jnp.asarray(w2), None, scales["w2_scale"],
            scales["out_scale"], scales["in_scale"], (h, w),
            act1="SILU", act2="SILU", shortcut=True, compute=mode))
    np.testing.assert_array_equal(outs["int8"], outs["bf16"])


def test_sppf_bf16_compute_close(rng):
    # 4 part-dots of C=256 each: per-part sums are exact; the f32
    # cross-part accumulation can round once past 2^24 -> tol 1
    c, o, h, w = 256, 128, 8, 8
    x = rng.integers(-128, 128, (1, h, w, c), dtype=np.int8)
    wt = rng.integers(-128, 128, (1, 1, 4 * c, o), dtype=np.int8)
    args = (jnp.asarray(x), jnp.asarray(wt), None, 5, 0.03, 0.02, 0.08)
    a = np.asarray(FK.sppf_int8_fused(*args, act="SILU",
                                      compute="int8"))
    g = np.asarray(FK.sppf_int8_fused(*args, act="SILU",
                                      compute="bf16"))
    diff = np.abs(a.astype(np.int32) - g.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_serving_compute_env_knob(rng, monkeypatch):
    """TAT_SERVING_COMPUTE resolves at trace time for every kernel
    entry point (the executor passes no explicit compute)."""
    monkeypatch.setenv("TAT_SERVING_COMPUTE", "bf16")
    m, k, n = 16, 128, 32
    x = jnp.asarray(rng.integers(-128, 128, (m, k), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (k, n), dtype=np.int8))
    env_out = np.asarray(FK.matmul_int8_fused(x, w, None, 0.02, 0.01,
                                              0.05, act="RELU"))
    monkeypatch.delenv("TAT_SERVING_COMPUTE")
    exp = np.asarray(FK.matmul_int8_fused(x, w, None, 0.02, 0.01, 0.05,
                                          act="RELU", compute="bf16"))
    np.testing.assert_array_equal(env_out, exp)


def test_matmul_multi_mixed_scales_silu(rng):
    """Regression: the per-part-scale branch used to DROP SILU (no
    elif handled it) — the activation must survive unequal scales."""
    m, k1, k2, n = 32, 64, 64, 32
    x1 = rng.integers(-100, 100, (m, k1), dtype=np.int8)
    x2 = rng.integers(-100, 100, (m, k2), dtype=np.int8)
    w = rng.integers(-64, 64, (k1 + k2, n), dtype=np.int8)
    b = rng.integers(-500, 500, (n,), dtype=np.int32)
    s1, s2, ws, so = 0.03, 0.05, 0.02, 0.07
    got = np.asarray(FK.matmul_int8_fused_multi(
        [jnp.asarray(x1), jnp.asarray(x2)],
        [jnp.asarray(w[:k1]), jnp.asarray(w[k1:])],
        jnp.asarray(b), [s1, s2], ws, so, act="SILU"))
    a1 = x1.astype(np.int32) @ w[:k1].astype(np.int32)
    a2 = x2.astype(np.int32) @ w[k1:].astype(np.int32)
    pre = (a1.astype(np.float32) * np.float32(s1)
           + a2.astype(np.float32) * np.float32(s2)
           + b.astype(np.float32) * np.float32(s1)) * np.float32(ws)
    pre = pre.astype(np.float32)
    pre = pre / (1.0 + np.exp(-pre, dtype=np.float32))
    sc = pre * np.float32(1.0 / np.float32(so))
    sh = sc + np.where(sc >= 0, np.float32(0.5), np.float32(-0.5))
    ref = np.clip(np.trunc(sh), -128, 127).astype(np.int8)
    d = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert d.max() <= 1          # sigmoid transcendental tolerance
    assert (d > 0).mean() < 0.02


def test_matmul_multi_mixed_scales_leaky(rng):
    """Regression: unequal-scale LEAKY_RELU must use the reference's
    post-quantization int-domain alpha (mars_runtime.c:1078-1082),
    like the same-scale epilogue — not f32 pre-activation alpha."""
    m, k1, k2, n = 32, 64, 64, 32
    x1 = rng.integers(-100, 100, (m, k1), dtype=np.int8)
    x2 = rng.integers(-100, 100, (m, k2), dtype=np.int8)
    w = rng.integers(-64, 64, (k1 + k2, n), dtype=np.int8)
    s1, s2, ws, so, alpha = 0.03, 0.05, 0.02, 0.07, 0.1
    got = np.asarray(FK.matmul_int8_fused_multi(
        [jnp.asarray(x1), jnp.asarray(x2)],
        [jnp.asarray(w[:k1]), jnp.asarray(w[k1:])],
        None, [s1, s2], ws, so, act="LEAKY_RELU", alpha=alpha))
    a1 = x1.astype(np.int32) @ w[:k1].astype(np.int32)
    a2 = x2.astype(np.int32) @ w[k1:].astype(np.int32)
    # single host-combined multiply (cs = w/out, inv_out = 1): LEAKY
    # rides the linear requant path like _scale_rows
    sc = (a1.astype(np.float32) * np.float32(s1)
          + a2.astype(np.float32) * np.float32(s2)) \
        * (np.float32(ws) / np.float32(so))
    sh = sc + np.where(sc >= 0, np.float32(0.5), np.float32(-0.5))
    q = np.clip(np.trunc(sh), -128, 127)
    neg = np.maximum(np.trunc(q * np.float32(alpha)), -128.0)
    ref = np.where(q > 0, q, neg).astype(np.int8)
    np.testing.assert_array_equal(got, ref)


def test_conv_folded_dma_pipeline_matches_blockspec(rng):
    """The manual-DMA halo variant (pipeline="dma" — the measured
    round-3 experiment, docs/KERNELS.md "Manual-DMA postscript") must
    stay bit-identical to the BlockSpec path so the recorded negative
    result remains reproducible."""
    h = w = 16
    k, s, c, o, f = 3, 1, 32, 32, 2
    pad = (k - 1) // 2
    x = rng.integers(-128, 128, (1, h, w, c), dtype=np.int8)
    wt = rng.integers(-64, 64, (k, k, c, o), dtype=np.int8)
    b = rng.integers(-500, 500, (o,), dtype=np.int32)
    xf = jnp.asarray(_fold_np(x, s * f))
    args = (xf, jnp.asarray(wt), jnp.asarray(b), (h, w), s,
            ((pad, pad), (pad, pad)), 0.05, 0.02, 0.1)
    base = np.asarray(FK.conv2d_int8_folded(
        *args, act="RELU", f_out=f, pipeline="blockspec"))
    dma = np.asarray(FK.conv2d_int8_folded(
        *args, act="RELU", f_out=f, pipeline="dma"))
    np.testing.assert_array_equal(base, dma)
