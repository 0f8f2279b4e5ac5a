"""Device-side image pipes: the TPU analogs of the T41's AIP unit.

The reference drives three fixed-function image pipes at 0x12b00000
(``/root/reference/include/aip.h:1-75``): AIP-T (resize), AIP-F
(single-node conv, ``src/aip.c:aip_conv2d``), AIP-P (perspective
transform, registers 0x300-0x398). On TPU these are ordinary jitted
ops that fuse into the surrounding program — no descriptor chains, no
IRQ waits (``include/aip.h:78-105`` node structs have no analog).

- :func:`resize_bilinear`  — AIP-T analog (jax.image under the hood)
- :func:`warp_perspective` — AIP-P analog: batched 3x3 homography with
  bilinear sampling and border fill (inverse mapping, the standard
  dewarp formulation camera ISPs use)
- :func:`warp_affine`      — 2x3 affine special case of the same
- AIP-F's conv is the framework's bread and butter (``ops.conv``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def resize_bilinear(img: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """AIP-T analog: batched bilinear resize, dtype-preserving
    (uint8/int8 inputs round like the reference's fixed-point pipe).

    img: [B, H, W, C]; returns [B, out_h, out_w, C].
    """
    b, h, w, c = img.shape
    out = jax.image.resize(img.astype(jnp.float32),
                           (b, out_hw[0], out_hw[1], c), "bilinear")
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(img.dtype)


def _bilinear_sample(img: jax.Array, sx: jax.Array, sy: jax.Array,
                     fill: float) -> jax.Array:
    """Sample [H, W, C] at float coords (sx, sy) [OH, OW] with bilinear
    interpolation; out-of-bounds reads return ``fill``."""
    h, w, c = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        # clamp for the gather; validity handled by the weight mask
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = img.reshape(h * w, c)
        v = jnp.take(flat, yc * w + xc, axis=0)     # [OH, OW, C]
        ok = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        return v, ok[..., None]

    v00, m00 = tap(y0i, x0i)
    v01, m01 = tap(y0i, x0i + 1)
    v10, m10 = tap(y0i + 1, x0i)
    v11, m11 = tap(y0i + 1, x0i + 1)
    w00 = ((1 - fy) * (1 - fx))[..., None]
    w01 = ((1 - fy) * fx)[..., None]
    w10 = (fy * (1 - fx))[..., None]
    w11 = (fy * fx)[..., None]
    fillv = jnp.float32(fill)
    acc = (jnp.where(m00, v00, fillv) * w00
           + jnp.where(m01, v01, fillv) * w01
           + jnp.where(m10, v10, fillv) * w10
           + jnp.where(m11, v11, fillv) * w11)
    # fully outside -> pure fill
    inside = m00 | m01 | m10 | m11
    return jnp.where(inside, acc, fillv)


def warp_perspective(
    img: jax.Array,               # [B, H, W, C] any real dtype
    matrix: jax.Array,            # [3, 3] or [B, 3, 3] dst->src homography
    out_hw: Optional[Tuple[int, int]] = None,
    fill: float = 0.0,
) -> jax.Array:
    """AIP-P analog: perspective (homography) warp with bilinear
    sampling, batched and jittable.

    ``matrix`` maps OUTPUT pixel coordinates to SOURCE coordinates
    (inverse mapping — the numerically sane direction; pass
    ``np.linalg.inv(H)`` for a forward homography H). Output pixels
    whose source falls outside the image read ``fill``, matching the
    fixed-function pipe's border behavior.
    """
    b, h, w, c = img.shape
    oh, ow = out_hw if out_hw is not None else (h, w)
    m = jnp.asarray(matrix, jnp.float32)
    if m.ndim == 2:
        m = jnp.broadcast_to(m, (b, 3, 3))

    gy = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1)        # [OH, OW, 3]

    def one(img_i, m_i):
        # HIGHEST: default TPU f32 matmul runs bf16 passes — coordinate
        # math must stay f32-exact or warped pixels shift
        src = jnp.einsum("ij,hwj->hwi", m_i, dst,
                         precision=jax.lax.Precision.HIGHEST)
        z = src[..., 2]
        z = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        sx = src[..., 0] / z
        sy = src[..., 1] / z
        return _bilinear_sample(img_i.astype(jnp.float32), sx, sy, fill)

    out = jax.vmap(one)(img, m)
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        out = jnp.clip(jnp.round(out), info.min, info.max)
    return out.astype(img.dtype)


def warp_affine(
    img: jax.Array,
    matrix: jax.Array,            # [2, 3] or [B, 2, 3] dst->src affine
    out_hw: Optional[Tuple[int, int]] = None,
    fill: float = 0.0,
) -> jax.Array:
    """Affine special case of :func:`warp_perspective`."""
    m = jnp.asarray(matrix, jnp.float32)
    bottom = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    if m.ndim == 2:
        m3 = jnp.concatenate([m, bottom], axis=0)
    else:
        m3 = jnp.concatenate(
            [m, jnp.broadcast_to(bottom, (m.shape[0], 1, 3))], axis=1)
    return warp_perspective(img, m3, out_hw, fill)


def perspective_matrix(src_quad, dst_quad) -> np.ndarray:
    """Solve the 3x3 homography mapping ``dst_quad`` -> ``src_quad``
    (4 point pairs each, [[x, y] x4]) — i.e. directly usable as
    :func:`warp_perspective`'s inverse-mapping ``matrix``. Host-side
    (numpy) setup, like the reference's register programming."""
    src = np.asarray(src_quad, np.float64)
    dst = np.asarray(dst_quad, np.float64)
    a = []
    rhs = []
    for (xs, ys), (xd, yd) in zip(src, dst):
        a.append([xd, yd, 1, 0, 0, 0, -xs * xd, -xs * yd])
        a.append([0, 0, 0, xd, yd, 1, -ys * xd, -ys * yd])
        rhs.extend([xs, ys])
    coef = np.linalg.solve(np.asarray(a), np.asarray(rhs))
    return np.append(coef, 1.0).reshape(3, 3).astype(np.float32)
