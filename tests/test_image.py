"""AIP image-pipe analog tests: resize (AIP-T), perspective warp
(AIP-P) vs a numpy bilinear oracle (reference pipes:
/root/reference/include/aip.h:1-75; AIP-P registers 0x300-0x398)."""

import numpy as np
import pytest
import jax.numpy as jnp

from thingino_accel_tpu.ops import image as I


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def np_warp(img, m, out_hw, fill):
    h, w, c = img.shape
    oh, ow = out_hw
    out = np.full((oh, ow, c), fill, np.float64)
    for y in range(oh):
        for x in range(ow):
            v = m @ np.array([x, y, 1.0])
            sx, sy = v[0] / v[2], v[1] / v[2]
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros(c)
            any_in = False
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < h and 0 <= xx < w:
                        acc += wy * wx * img[yy, xx]
                        any_in = True
                    else:
                        acc += wy * wx * fill
            out[y, x] = acc if any_in else fill
    return out


def test_identity_warp(rng):
    img = rng.uniform(0, 255, (1, 12, 10, 3)).astype(np.float32)
    out = np.asarray(I.warp_perspective(jnp.asarray(img), np.eye(3)))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_warp_matches_numpy_oracle(rng):
    img = rng.uniform(0, 255, (2, 16, 14, 3)).astype(np.float32)
    src = [[1, 2], [12, 1], [13, 14], [0, 13]]
    dst = [[0, 0], [13, 0], [13, 15], [0, 15]]
    m = I.perspective_matrix(src, dst)
    got = np.asarray(I.warp_perspective(
        jnp.asarray(img), m, (16, 14), fill=114.0))
    for b in range(2):
        ref = np_warp(img[b], m.astype(np.float64), (16, 14), 114.0)
        np.testing.assert_allclose(got[b], ref, atol=0.05)


def test_warp_affine_translation(rng):
    img = rng.uniform(0, 255, (1, 8, 8, 1)).astype(np.float32)
    # dst->src: shift source by +2 in x -> output shifted left
    m = np.array([[1, 0, 2], [0, 1, 0]], np.float32)
    out = np.asarray(I.warp_affine(jnp.asarray(img), m, fill=0.0))
    np.testing.assert_allclose(out[0, :, :6], img[0, :, 2:], atol=1e-3)
    np.testing.assert_allclose(out[0, :, 6:], 0.0, atol=1e-3)


def test_warp_uint8_roundtrip(rng):
    img = rng.integers(0, 256, (1, 9, 9, 3), dtype=np.uint8)
    out = np.asarray(I.warp_perspective(jnp.asarray(img), np.eye(3)))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, img)


def test_resize_bilinear_dtype(rng):
    img = rng.integers(0, 256, (2, 10, 10, 3), dtype=np.uint8)
    out = np.asarray(I.resize_bilinear(jnp.asarray(img), (20, 20)))
    assert out.shape == (2, 20, 20, 3)
    assert out.dtype == np.uint8
    # corners preserved under 2x bilinear upsample? centers align mode:
    # just sanity-bound values
    assert int(out.min()) >= int(img.min()) - 1
    assert int(out.max()) <= int(img.max()) + 1


def test_perspective_matrix_maps_corners():
    src = [[3, 4], [20, 2], [22, 18], [1, 17]]
    dst = [[0, 0], [31, 0], [31, 31], [0, 31]]
    m = I.perspective_matrix(src, dst)
    for (xs, ys), (xd, yd) in zip(src, dst):
        v = m @ np.array([xd, yd, 1.0])
        np.testing.assert_allclose([v[0] / v[2], v[1] / v[2]], [xs, ys],
                                   atol=1e-4)
