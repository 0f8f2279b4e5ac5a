"""Bit-parity of jnp ops vs numpy implementations of the C semantics.

Each numpy oracle transliterates the corresponding reference executor
(src/mars/mars_runtime.c, src/mars/mxu_conv.c) — scalar, NHWC, float32
arithmetic — and the jnp op must match bit-for-bit for integer paths
(transcendental paths: <=1 int8 quantum on a tiny fraction of elements).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thingino_accel_tpu.ops import reference as R
from thingino_accel_tpu.ops.quant import RoundMode


# -- numpy oracles (C transliterations) -------------------------------------

def np_round_half_away(x):
    x = np.float32(x)
    return np.trunc(x + np.where(x >= 0, np.float32(0.5), np.float32(-0.5))
                    ).astype(np.int32)


def np_round_plus_half(x):
    return np.trunc(np.float32(x) + np.float32(0.5)).astype(np.int32)


def np_conv2d_int8(x, w_oihw, bias, stride, pads, in_s, w_s, out_s,
                   mode="half_away"):
    """conv2d_int8 oracle: int32 accumulate + f32 requant.

    Matches conv2d_int8_mxu's arithmetic (src/mars/mxu_conv.c:254-407):
    zero-padded window, bias into accumulator, combined-scale requant.
    """
    n, h, wd, c = x.shape
    o, _, kh, kw = w_oihw.shape
    (pt, pb), (pl, pr) = pads
    sh, sw = stride
    oh = (h + pt + pb - kh) // sh + 1
    ow = (wd + pl + pr - kw) // sw + 1
    xp = np.zeros((n, h + pt + pb, wd + pl + pr, c), np.int64)
    xp[:, pt:pt + h, pl:pl + wd, :] = x.astype(np.int64)
    out = np.zeros((n, oh, ow, o), np.int8)
    cs = np.float32(np.float32(in_s) * np.float32(w_s)) / np.float32(out_s)
    for b in range(n):
        for y in range(oh):
            for z in range(ow):
                patch = xp[b, y * sh:y * sh + kh, z * sw:z * sw + kw, :]
                for oc in range(o):
                    s = np.int64((patch * w_oihw[oc].transpose(1, 2, 0)
                                  .astype(np.int64)).sum())
                    if bias is not None:
                        s += np.int64(bias[oc])
                    scaled = np.float32(np.float32(np.int32(s)) * cs)
                    if mode == "half_away":
                        r = np_round_half_away(scaled)
                    else:
                        r = np_round_plus_half(scaled)
                    out[b, y, z, oc] = np.int8(np.clip(r, -128, 127))
    return out


def test_conv2d_int8_exact(rng):
    x = rng.integers(-128, 128, (1, 8, 9, 7), dtype=np.int8)
    w = rng.integers(-128, 128, (5, 7, 3, 3), dtype=np.int8)  # OIHW
    b = rng.integers(-5000, 5000, (5,), dtype=np.int32)
    in_s, w_s, out_s = 0.05, 0.002, 0.04
    pads = ((1, 1), (1, 1))
    ref = np_conv2d_int8(x, w, b, (1, 1), pads, in_s, w_s, out_s)
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    got = R.conv2d_int8(
        jnp.asarray(x), w_hwio, jnp.asarray(b), (8, 9), (1, 1), (1, 1),
        pads, in_s, w_s, out_s, RoundMode.HALF_AWAY)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_conv2d_int8_strided_nopad(rng):
    x = rng.integers(-128, 128, (2, 11, 11, 4), dtype=np.int8)
    w = rng.integers(-128, 128, (6, 4, 3, 3), dtype=np.int8)
    ref = np_conv2d_int8(x, w, None, (2, 2), ((0, 0), (0, 0)),
                         0.1, 0.01, 0.2)
    got = R.conv2d_int8(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))), None,
        (5, 5), (2, 2), (1, 1), ((0, 0), (0, 0)), 0.1, 0.01, 0.2)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_conv2d_int8_plus_half_mode(rng):
    """The conv2d_int8_sw rule (mars_runtime.c:498): (int)(x + 0.5)."""
    x = rng.integers(-128, 128, (1, 6, 6, 3), dtype=np.int8)
    w = rng.integers(-128, 128, (4, 3, 3, 3), dtype=np.int8)
    ref = np_conv2d_int8(x, w, None, (1, 1), ((1, 1), (1, 1)),
                         0.07, 0.003, 0.05, mode="plus_half")
    got = R.conv2d_int8(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))), None,
        (6, 6), (1, 1), (1, 1), ((1, 1), (1, 1)), 0.07, 0.003, 0.05,
        RoundMode.PLUS_HALF_TRUNC)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_conv2d_f32(rng):
    x = rng.normal(size=(1, 10, 10, 3)).astype(np.float32)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    got = R.conv2d_f32(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        jnp.asarray(b), (8, 8), (1, 1), (1, 1), ((0, 0), (0, 0)))
    # float oracle via correlate
    ref = np.zeros((1, 8, 8, 8), np.float32)
    for y in range(8):
        for z in range(8):
            patch = x[0, y:y + 3, z:z + 3, :]
            for oc in range(8):
                ref[0, y, z, oc] = (patch * w[oc].transpose(1, 2, 0)).sum() + b[oc]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-4)


def test_depthwise_int8_exact(rng):
    c = 6
    x = rng.integers(-128, 128, (1, 9, 9, c), dtype=np.int8)
    w = rng.integers(-128, 128, (3, 3, c), dtype=np.int8)  # KH KW C
    b = rng.integers(-500, 500, (c,), dtype=np.int32)
    got = R.depthwise_conv2d_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), (9, 9), (1, 1),
        (1, 1), ((1, 1), (1, 1)), 0.04, 0.005, 0.03)
    # oracle via grouped np conv
    w_oihw = np.zeros((c, c, 3, 3), np.int8)
    for ch in range(c):
        w_oihw[ch, ch] = w[:, :, ch]
    # depthwise == full conv with block-diagonal weights only when
    # accumulation is linear (it is: int32 adds)
    ref = np_conv2d_int8(x, w_oihw, b, (1, 1), ((1, 1), (1, 1)),
                         0.04, 0.005, 0.03)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_sigmoid_int8(rng):
    x = rng.integers(-128, 128, (64, 33), dtype=np.int8)
    in_s, out_s = 0.1, 0.00390625
    got = np.asarray(R.sigmoid(jnp.asarray(x), in_s, out_s))
    xf = x.astype(np.float32) * np.float32(in_s)
    y = np.float32(1.0) / (np.float32(1.0) + np.exp(-xf, dtype=np.float32))
    q = np.clip(np_round_plus_half(y / np.float32(out_s)), -128, 127)
    diff = np.abs(got.astype(np.int32) - q)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_mul_add_exact(rng):
    a = rng.integers(-128, 128, (100,), dtype=np.int8)
    b = rng.integers(-128, 128, (100,), dtype=np.int8)
    sa, sb, so = 0.3, 0.07, 0.11
    got_m = np.asarray(R.mul_q(jnp.asarray(a), jnp.asarray(b), sa, sb, so))
    got_a = np.asarray(R.add_q(jnp.asarray(a), jnp.asarray(b), sa, sb, so))
    inv = np.float32(1.0) / np.float32(so)
    ym = (a.astype(np.float32) * np.float32(sa)) * \
         (b.astype(np.float32) * np.float32(sb))
    ya = a.astype(np.float32) * np.float32(sa) + \
         b.astype(np.float32) * np.float32(sb)
    ref_m = np.clip(np_round_plus_half(ym * inv), -128, 127).astype(np.int8)
    ref_a = np.clip(np_round_plus_half(ya * inv), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got_m, ref_m)
    np.testing.assert_array_equal(got_a, ref_a)


def test_maxpool_clipping(rng):
    """Edge-clipped windows (mars_runtime.c:939-950): 5x5 input, k=2 s=2
    with out=3 reads the clipped last row/col."""
    x = rng.integers(-128, 128, (1, 5, 5, 2), dtype=np.int8)
    got = np.asarray(R.maxpool(jnp.asarray(x), (2, 2), (2, 2), (3, 3)))
    ref = np.zeros((1, 3, 3, 2), np.int8)
    for y in range(3):
        for z in range(3):
            for c in range(2):
                m = -128
                for ky in range(2):
                    for kz in range(2):
                        iy, iz = y * 2 + ky, z * 2 + kz
                        if iy < 5 and iz < 5:
                            m = max(m, int(x[0, iy, iz, c]))
                ref[0, y, z, c] = m
    np.testing.assert_array_equal(got, ref)


def test_leaky_relu_int8(rng):
    x = rng.integers(-128, 128, (256,), dtype=np.int8)
    got = np.asarray(R.leaky_relu(jnp.asarray(x), 0.01))
    ref = np.where(
        x > 0, x,
        np.maximum(np.trunc(x.astype(np.float32) * np.float32(0.01)),
                   -128).astype(np.int8))
    np.testing.assert_array_equal(got, ref)


def test_upsample_nearest(rng):
    x = rng.integers(-128, 128, (1, 4, 4, 3), dtype=np.int8)
    got = np.asarray(R.upsample_nearest(jnp.asarray(x), (2, 2), (8, 8)))
    ref = np.zeros((1, 8, 8, 3), np.int8)
    for y in range(8):
        for z in range(8):
            ref[0, y, z] = x[0, y // 2, z // 2]
    np.testing.assert_array_equal(got, ref)


def test_batchnorm_int8(rng):
    x = rng.integers(-128, 128, (1, 4, 4, 5), dtype=np.int8)
    sc = rng.normal(size=(5,)).astype(np.float32)
    bi = rng.normal(size=(5,)).astype(np.float32)
    in_s, out_s = 0.2, 0.15
    got = np.asarray(R.batchnorm(jnp.asarray(x), jnp.asarray(sc),
                                 jnp.asarray(bi), in_s, out_s))
    xf = x.astype(np.float32) * np.float32(in_s)
    y = xf * sc + bi
    ref = np.clip(np_round_plus_half(y / np.float32(out_s)),
                  -128, 127).astype(np.int8)
    np.testing.assert_array_equal(got, ref)


def test_concat_passthrough(rng):
    a = rng.integers(-128, 128, (1, 2, 2, 3), dtype=np.int8)
    b = rng.integers(-128, 128, (1, 2, 2, 5), dtype=np.int8)
    got = np.asarray(R.concat([jnp.asarray(a), jnp.asarray(b)], 3))
    np.testing.assert_array_equal(got, np.concatenate([a, b], 3))


def test_relu6_modes(rng):
    x = rng.integers(-128, 128, (100,), dtype=np.int8)
    compat = np.asarray(R.relu6(jnp.asarray(x), 0.1, compat=True))
    np.testing.assert_array_equal(compat, np.maximum(x, 0))  # ref runs RELU
    full = np.asarray(R.relu6(jnp.asarray(x), 0.1, compat=False))
    assert full.max() <= 60  # 6 / 0.1
    np.testing.assert_array_equal(full, np.clip(np.maximum(x, 0), 0, 60))


def test_softmax_full_vs_compat(rng):
    x = rng.integers(-128, 128, (2, 10), dtype=np.int8)
    compat = np.asarray(R.softmax(jnp.asarray(x), compat=True))
    np.testing.assert_array_equal(compat, x)
    full = np.asarray(R.softmax(jnp.asarray(x), -1, 0.05, 1 / 256, False))
    assert full.dtype == np.int8


def test_avgpool_int8(rng):
    x = rng.integers(-128, 128, (1, 4, 4, 3), dtype=np.int8)
    got = np.asarray(R.avgpool(jnp.asarray(x), (2, 2), (2, 2), (2, 2),
                               in_scale=0.1, out_scale=0.1))
    ref = np.zeros((1, 2, 2, 3), np.int8)
    for y in range(2):
        for z in range(2):
            for c in range(3):
                window = x[0, 2 * y:2 * y + 2, 2 * z:2 * z + 2, c]
                avg = np.float32(window.astype(np.float32).mean())
                q = np_round_plus_half(
                    np.float32(avg * np.float32(0.1)) / np.float32(0.1))
                ref[0, y, z, c] = np.clip(q, -128, 127)
    np.testing.assert_array_equal(got, ref)


def test_jit_compatible(rng):
    """All ops must trace under jit (static shapes, no py control flow)."""
    x = jnp.asarray(rng.integers(-128, 128, (1, 8, 8, 4), dtype=np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (3, 3, 4, 8), dtype=np.int8))

    @jax.jit
    def net(x, w):
        y = R.conv2d_int8(x, w, None, (8, 8), (1, 1), (1, 1),
                          ((1, 1), (1, 1)), 0.1, 0.01, 0.1)
        y = R.silu(y, 0.1, out_scale=0.1)
        y = R.maxpool(y, (2, 2), (2, 2), (4, 4))
        return y

    out = net(x, w)
    assert out.shape == (1, 4, 4, 8)
    assert out.dtype == jnp.int8
