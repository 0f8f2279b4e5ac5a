"""YOLO-family `.mgk` reconstruction: symbol decode, weight-table
mining, ONNX export, and the engine round-trip — all on synthetic
ELF32 fixtures (no YOLO `.mgk` ships in this environment; the fixture
packs a zoo graph's own weights per the layout ``formats.mgk_yolo``
documents). Reference roles: ``mgk-decompiler/src/layer_decoder.rs``,
``yolo_onnx_export.rs``."""

import numpy as np
import pytest

from thingino_accel_tpu.formats import mgk as MGK
from thingino_accel_tpu.formats import mgk_yolo as MY
from thingino_accel_tpu.testing.elf_fixture import build_elf32, build_yolo_mgk


@pytest.fixture(scope="module")
def yolo_fixture():
    data, g0 = build_yolo_mgk("n", in_hw=(64, 64), w_scale=0.0004)
    elf, meta = MGK.load_mgk(data)
    return data, g0, elf, meta


def test_symbol_layer_decode(yolo_fixture):
    _, _, elf, _ = yolo_fixture
    syms = MY.decode_layers_from_symbols(elf)
    kinds = {s.kind for s in syms}
    assert kinds == {"Conv", "Pool", "Concat", "Add", "Upsample"}
    assert all(s.source == "param_init" for s in syms)


def test_symbol_layer_decode_layer_param_fallback():
    """No param_init symbols -> LayerParam type-object fallback
    (layer_decoder.rs:178-215)."""
    data = build_elf32(b"", symbols=[
        ("magik::venus::layer::ConvLayerParam", 0x10, 4),
        ("magik::venus::layer::GruLayerParam", 0x20, 4),
        ("magik::venus::layer::AddrHelper", 0x30, 4),   # not Add
    ])
    elf = MGK.parse_elf(data)
    syms = MY.decode_layers_from_symbols(elf)
    assert {s.kind for s in syms} == {"Conv", "GRU"}
    assert all(s.source == "layer_param" for s in syms)


def test_rodata_yolo_family_mining(yolo_fixture):
    _, g0, _, meta = yolo_fixture
    kinds = {l.kind for l in meta.layers}
    assert "Conv" in kinds
    n_convs = sum(1 for n in g0.nodes if n.op == "CONV2D")
    assert sum(1 for l in meta.layers if l.kind == "Conv") == n_convs


def test_weight_table_matches_reference_yolov5s_shapes():
    """The zoo-derived table agrees with the reference's hardcoded
    yolov5s entries (yolo_onnx_export.rs:28-121) on the anchor rows."""
    _, entries, _ = MY.yolo_weight_table("s")
    shapes = [e.shape_oihw for e in entries]
    assert shapes[0] == (32, 12, 3, 3) or shapes[0] == (32, 3, 6, 6)
    # three detect heads of 255 channels, biased
    heads = [e for e in entries if e.shape_oihw[0] == 255]
    assert len(heads) == 3
    assert all(e.b_name for e in heads)
    assert {e.shape_oihw[1] for e in heads} == {128, 256, 512}


def test_size_detection(yolo_fixture):
    _, _, elf, meta = yolo_fixture
    assert MY.detect_yolo_family(elf, meta) == "n"


def test_size_detection_rejects_wrong_blob():
    data = build_elf32(b"500_QuantizeConv2D\x00",
                       symbols=[("conv2d_int8_param_init", 0, 4)],
                       appended=b"\x01" * 1000)
    elf, meta = MGK.load_mgk(data)
    assert MY.detect_yolo_family(elf, meta) is None
    with pytest.raises(MY.UnsupportedMgkError) as ei:
        MGK.mgk_to_onnx(data)
    assert "Conv" in ei.value.kinds


def test_scale_run_mining(yolo_fixture):
    _, g0, _, meta = yolo_fixture
    n_convs = sum(1 for n in g0.nodes if n.op == "CONV2D")
    run = MY.mine_w_scales(meta, n_convs)
    assert run is not None and len(run) == n_convs
    np.testing.assert_allclose(run, 0.0004, rtol=1e-6)


def test_extracted_weights_match_planted(yolo_fixture):
    _, g0, elf, meta = yolo_fixture
    g, w = MY.extract_yolo_weights(elf, meta, "n", in_hw=(64, 64))
    n_checked = 0
    for name, arr in w.items():
        t = g0.tensors[name]
        if t.data.dtype == np.int8:
            ref = t.data.astype(np.float32) * np.float32(t.quant.scale)
        else:                       # int32 bias: in_scale * w_scale
            continue
        np.testing.assert_array_equal(arr, ref)
        n_checked += 1
    assert n_checked == sum(1 for n in g0.nodes if n.op == "CONV2D")


def test_mgk_to_onnx_dispatches_yolo_and_engine_matches_oracle(
        yolo_fixture, tmp_path):
    """The full path: .mgk file -> mgk_to_onnx -> import_onnx ->
    Engine == the dequantized zoo graph the fixture was packed from
    (the YOLO analog of the AEC decompile-verify pipeline).

    Numeric comparison is on EARLY tensors with properly-scaled
    inputs: through all 60 layers the small-weight fixture attenuates
    the input to ~1e-9 (a full-output comparison is vacuous — it
    passes even with wrong weights). Early activations carry real
    signal, so wrong weight placement fails loudly here; full-blob
    placement is separately pinned exactly by
    test_extracted_weights_match_planted."""
    from thingino_accel_tpu.formats.onnx import import_onnx
    from thingino_accel_tpu.ir.graph import Graph
    from thingino_accel_tpu.ir.passes import dequantize_graph
    from thingino_accel_tpu.runtime import Engine

    data, g0, elf, meta = yolo_fixture
    p = tmp_path / "yolo_fixture.mgk"
    p.write_bytes(data)
    # dispatch through the generic entry point (family detection);
    # the fixture's 64x64 in_hw only affects activation shapes, so
    # re-export at the test size
    onnx_bytes = MY.export_yolo_onnx(elf, meta, in_hw=(64, 64))
    assert MGK.mgk_to_onnx(str(p))          # dispatches, 640 shapes
    gi = import_onnx(onnx_bytes, float32=True)
    gd = dequantize_graph(g0, quantize_outputs=False)

    # early probe: the 6th conv's output (stem + first C3 bottleneck)
    early = [n for n in g0.nodes if n.op == "CONV2D"][5].outputs[0]
    assert early in gi.tensors, "exporter must preserve tensor names"
    gi_e = Graph(nodes=gi.nodes, tensors=gi.tensors,
                 inputs=gi.inputs, outputs=[early])
    gd_e = Graph(nodes=gd.nodes, tensors=gd.tensors,
                 inputs=gd.inputs, outputs=[early])
    in_scale = g0.tensors[g0.inputs[0]].quant.scale
    xq = np.random.default_rng(0).integers(
        -100, 100, (1, 64, 64, 3), dtype=np.int8)
    # oracle keeps the int8 interface (+DEQUANT); the exported ONNX
    # takes real-valued inputs
    want = list(Engine(gd_e).run_np(xq).values())[0]
    got = list(Engine(gi_e).run_np(
        xq.astype(np.float32) * np.float32(in_scale)).values())[0]
    assert float(np.abs(want).max()) > 1e-4, "probe lost signal"
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_unsupported_family_structured_error():
    data = build_elf32(b"some_unknown_blob\x00",
                       symbols=[("normalize_param_init", 0, 4)])
    with pytest.raises(MY.UnsupportedMgkError) as ei:
        MGK.mgk_to_onnx(data if isinstance(data, str) else _tofile(data))
    assert ei.value.kinds == ["Normalize"]


def _tofile(data: bytes) -> str:
    import tempfile
    f = tempfile.NamedTemporaryFile(suffix=".mgk", delete=False)
    f.write(data)
    f.close()
    return f.name


def test_nna_model_load_structured_error(tmp_path):
    """C-API load path: unsupported .mgk -> None + error code, not a
    raise (SURVEY §5 failure-reporting; include/nna_model.h role)."""
    from thingino_accel_tpu import api

    p = tmp_path / "unknown.mgk"
    p.write_bytes(build_elf32(b"mystery\x00",
                              symbols=[("normalize_param_init", 0, 4)]))
    m = api.nna_model_load(str(p))
    assert m is None
    code, msg = api.nna_get_load_error()
    assert code == api.MARS_ERR_INVALID_FILE
    assert "Normalize" in msg

    p2 = tmp_path / "corrupt.mgk"
    p2.write_bytes(b"\x00" * 64)
    assert api.nna_model_load(str(p2)) is None
    code, _ = api.nna_get_load_error()
    assert code == api.MARS_ERR_INVALID_FILE


def test_nna_model_load_yolo_mgk(yolo_fixture, tmp_path):
    """A recognized YOLO-family .mgk loads into a runnable Model
    through the same C-API entry point as .mars files."""
    from thingino_accel_tpu import api

    data, _, _, _ = yolo_fixture
    p = tmp_path / "yolo.mgk"
    p.write_bytes(data)
    m = api.nna_model_load(str(p))
    assert m is not None
    assert api.nna_get_load_error()[0] == api.NNA_SUCCESS
    info = api.nna_model_get_info(m)
    assert info.num_outputs == 3


@pytest.mark.parametrize("builder,hw", [
    ("build_nanodet", (64, 64)),
    ("build_tiny", (32, 32)),
])
def test_ir_to_onnx_round_trip_other_archs(builder, hw):
    """The generic IR->ONNX exporter round-trips depthwise (nanodet)
    and plain-convnet graphs through import_onnx + the engine, not
    just yolov5 — exporter generality beyond the .mgk use case."""
    from thingino_accel_tpu.formats.onnx import import_onnx
    from thingino_accel_tpu.formats.onnx_export import ir_to_onnx
    from thingino_accel_tpu.ir.passes import dequantize_graph
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine

    cfg = zoo.ZooConfig(dtype="int8", in_hw=hw)
    g0 = getattr(zoo, builder)(cfg) if builder != "build_tiny" \
        else zoo.build_tiny(cfg, in_hw=hw)
    gd = dequantize_graph(g0, quantize_outputs=False)
    gi = import_onnx(ir_to_onnx(gd), float32=True)
    xq = np.random.default_rng(0).integers(
        -100, 100, (1,) + hw + (3,), dtype=np.int8)
    # both graphs carry the input dequant (the oracle as a DEQUANT
    # node, the export as its Mul-by-scale lowering) -> feed both the
    # raw quantized values
    want = Engine(gd).run_np(xq)
    got = Engine(gi).run_np(xq.astype(np.float32))
    for k_g, k_w in zip(sorted(got), sorted(want)):
        w = want[k_w]
        assert float(np.abs(w).max()) > 1e-4, "vacuous comparison"
        np.testing.assert_allclose(got[k_g], w, atol=1e-4, rtol=1e-3)


def test_parse_elf_fuzz_never_crashes(yolo_fixture):
    """Corrupted/truncated .mgk bytes fail with ValueError (or parse),
    never an uncontrolled exception: 200 seeded single-byte flips
    biased into the ELF header + section table, plus truncations."""
    data, _, _, _ = yolo_fixture
    buf = bytearray(data)
    rng = np.random.default_rng(7)
    for cut in (0, 3, 0x20, 0x33, len(buf) // 2, len(buf) - 1):
        try:
            MGK.parse_elf(bytes(buf[:cut]))
        except ValueError:
            pass
    for _ in range(200):
        pos = int(rng.integers(0, 0x400 if rng.random() < 0.5
                               else len(buf)))
        old = buf[pos]
        buf[pos] = int(rng.integers(0, 256))
        try:
            MGK.parse_elf(bytes(buf))
        except ValueError:
            pass
        finally:
            buf[pos] = old
