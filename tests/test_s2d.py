"""stem_space_to_depth pass: the s2d-rewritten graph fed block-ordered
frames is BIT-identical to the original on the exact tier (identical
products, order-insensitive int32 accumulation)."""

import numpy as np
import jax.numpy as jnp

from thingino_accel_tpu.ir.passes import stem_space_to_depth
from thingino_accel_tpu.models import yolo, zoo
from thingino_accel_tpu.runtime import Engine, EngineOptions


def _stem_graph():
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("s2dtest", cfg)
    x = b.input("images", (1, 16, 16, 3))
    y = b.conv(x, 24, 6, 2)           # 6x6 s2 SAME -> 8x8x24
    y = b.conv(y, 32, 3)              # 3x3 s1
    return b.finish([y])


def test_stem_s2d_exact_tier_bitwise():
    x = np.random.default_rng(0).integers(
        -128, 128, (1, 16, 16, 3), dtype=np.int8)

    g1 = _stem_graph()
    out1 = Engine(g1).run_np(x)

    g2 = _stem_graph()
    assert stem_space_to_depth(g2) is True
    in_t = g2.tensors[g2.inputs[0]]
    assert in_t.shape == (1, 8, 8, 12)
    x2 = yolo.space_to_depth_frames(x)
    out2 = Engine(g2).run_np(x2)

    for k in out1:
        np.testing.assert_array_equal(out1[k], out2[k])


def test_stem_s2d_fast_tier_close():
    x = np.random.default_rng(1).integers(
        -128, 128, (2, 16, 16, 3), dtype=np.int8)
    opts = EngineOptions(precision="fast", quantize_outputs=False)
    g1 = _stem_graph()
    out1 = Engine(g1, opts).run_np(x)
    g2 = _stem_graph()
    assert stem_space_to_depth(g2)
    out2 = Engine(g2, opts).run_np(yolo.space_to_depth_frames(x))
    for k in out1:
        np.testing.assert_allclose(
            out1[k].astype(np.float32), out2[k].astype(np.float32),
            rtol=0.05, atol=0.05)


def test_stem_s2d_rejects_ineligible():
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("odd", cfg)
    x = b.input("images", (1, 16, 16, 3))
    y = b.conv(x, 16, 3, 2)           # odd kernel: not eligible
    g = b.finish([y])
    assert stem_space_to_depth(g) is False


def test_space_to_depth_device_matches_host():
    x = np.random.default_rng(2).integers(
        0, 256, (2, 8, 10, 3), dtype=np.uint8)
    host = yolo.space_to_depth_frames(x)
    dev = np.asarray(yolo.space_to_depth(jnp.asarray(x)))
    np.testing.assert_array_equal(host, dev)


# ---------------------------------------------------------------------------
# split_detect_heads (per-anchor heads; companion pass to the s2d stem)
# ---------------------------------------------------------------------------


def _det_graph():
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(32, 32))
    b = zoo.GraphBuilder("dettest", cfg)
    x = b.input("images", (1, 32, 32, 3))
    y = b.conv(x, 32, 3, 2)
    h = b.conv(y, 255, 1, act="NONE")
    return b.finish([h])


def test_split_detect_heads_exact_bitwise():
    from thingino_accel_tpu.ir.passes import split_detect_heads
    x = np.random.default_rng(4).integers(
        -128, 128, (1, 32, 32, 3), dtype=np.int8)
    g1 = _det_graph()
    out1 = list(Engine(g1).run_np(x).values())[0]
    g2 = _det_graph()
    groups = split_detect_heads(g2)
    assert len(groups) == 1 and len(groups[0]) == 3
    out2 = Engine(g2).run_np(x)
    merged = np.concatenate([out2[n] for n in groups[0]], axis=-1)
    np.testing.assert_array_equal(out1, merged)


def test_decode_and_parse_split_matches_packed():
    from thingino_accel_tpu.models import yolo
    rng = np.random.default_rng(5)
    feats, groups = [], []
    for i, hw in enumerate((8, 4, 2)):
        f = (rng.normal(size=(2, hw, hw, 255)) * 2).astype(np.float32)
        feats.append(jnp.asarray(f))
        groups.append([jnp.asarray(f[..., a * 85:(a + 1) * 85])
                       for a in range(3)])
    b1, s1, c1 = yolo.decode_and_parse(feats)
    b2, s2, c2 = yolo.decode_and_parse_split(groups)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_stem_s2d_skips_multi_consumer_input():
    """An input consumed by more than the stem conv can't be
    rewritten (its shape would change under the other consumer)."""
    from thingino_accel_tpu.ir.passes import stem_space_to_depth
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("multi", cfg)
    x = b.input("images", (1, 16, 16, 3))
    y1 = b.conv(x, 16, 6, 2)
    y2 = b.conv(x, 16, 3, 2)          # second consumer of the input
    g = b.finish([y1, y2])
    assert stem_space_to_depth(g) is False


def test_split_detect_heads_skips_consumed_output():
    """A detect output that is also consumed downstream stays packed
    (its packed tensor must keep existing)."""
    from thingino_accel_tpu.ir.passes import split_detect_heads
    cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
    b = zoo.GraphBuilder("consumed", cfg)
    x = b.input("images", (1, 16, 16, 3))
    y = b.conv(x, 32, 3, 2)
    h = b.conv(y, 255, 1, act="NONE")
    extra = b.conv(h, 8, 1, act="NONE")   # consumes the packed head
    g = b.finish([h, extra])
    assert split_detect_heads(g) == []


def test_stem_s2d_rejects_k4_misaligned():
    """K=4/8 stems are NOT block-expressible: SAME per-side pad
    (K-2)/2 is odd, so the stride-2 window starts mid-block and the
    rewrite would shift every output by one pixel. Only K ≡ 2 (mod 4)
    (e.g. the 6x6 YOLO stem) is valid."""
    for k in (4, 8):
        cfg = zoo.ZooConfig(dtype="int8", in_hw=(16, 16))
        b = zoo.GraphBuilder(f"s2dk{k}", cfg)
        x = b.input("images", (1, 16, 16, 3))
        y = b.conv(x, 24, k, 2)
        g = b.finish([y])
        assert stem_space_to_depth(g) is False, k
