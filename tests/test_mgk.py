"""`.mgk` offline importer tests against the real bundled AEC model
(never executes model code — pure ELF/metadata parsing), plus the AEC
JAX model's streaming behavior."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from thingino_accel_tpu.formats import mgk
from thingino_accel_tpu.models import aec

AEC_PATH = "/root/reference/AEC_T41_16K_NS_OUT_UC.mgk"
needs_aec = pytest.mark.skipif(
    not os.path.exists(AEC_PATH), reason="AEC .mgk not available")


@needs_aec
def test_parse_elf_sections():
    elf, meta = mgk.load_mgk(AEC_PATH)
    assert ".text" in elf.sections
    assert ".rodata" in elf.sections
    assert elf.elf_end < len(elf.data)
    assert len(elf.appended) > 100_000     # ~153 KB weight blob
    assert len(elf.symbols) > 10


@needs_aec
def test_mine_layers():
    elf, meta = mgk.load_mgk(AEC_PATH)
    kinds = {l.kind for l in meta.layers}
    assert "GRU" in kinds
    assert "Feature" in kinds
    assert "BatchNorm" in kinds
    assert len(meta.layers) >= 20          # 27 layers in the AEC model
    assert meta.scale_groups              # fp32 scale runs found


@needs_aec
def test_inspect_and_extract(tmp_path):
    info = mgk.inspect_mgk(AEC_PATH)
    assert info["weight_bytes"] > 100_000
    assert info["layer_kinds"].get("GRU", 0) >= 1
    mgk.extract_weights(AEC_PATH, str(tmp_path))
    blob = np.load(tmp_path / "blob.npy")
    assert blob.dtype == np.int8
    blocks = np.load(tmp_path / "blocks_1024.npy")
    assert blocks.shape[1] == 1024


def test_gru_blocks_unpack():
    rng = np.random.default_rng(0)
    blob = rng.integers(-128, 128, 12 * 1024 + 576, dtype=np.int8).tobytes()
    out = mgk.unpack_gru_blocks(blob, bidirectional=True)
    assert out["fwd_w_ir"].shape == (32, 32)
    assert out["bwd_w_hn"].shape == (32, 32)
    assert out["bias"].shape == (576,)
    uni = mgk.unpack_gru_blocks(blob[:4096], bidirectional=False)
    assert uni["w_ih"].shape == (64, 32)


def test_aec_forward_shapes():
    cfg = aec.AECConfig()
    params = aec.init_params(cfg)
    spec = jnp.zeros((2, 256, 8, 1), jnp.float32)
    mask, state = aec.forward(params, spec)
    assert mask.shape == (2, 256, 8, 2)
    assert state.shape == (2, 64, 32)
    assert float(mask.min()) >= 0.0 and float(mask.max()) <= 1.0


def test_aec_streaming_state_carries():
    """Chunked processing with carried state == one big scan; and state
    actually matters (different from zero-state per chunk)."""
    cfg = aec.AECConfig()
    params = aec.init_params(cfg)
    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.normal(size=(1, 256, 24, 1)).astype(np.float32))

    # manual chunking with carried state
    state = None
    outs = []
    for i in range(3):
        m, state = aec.forward(params, spec[:, :, i * 8:(i + 1) * 8], state)
        outs.append(m)
    manual = jnp.concatenate(outs, axis=2)

    scanned = aec.process_stream(params, spec, chunk=8)
    np.testing.assert_allclose(np.asarray(manual), np.asarray(scanned),
                               rtol=2e-4, atol=2e-5)

    # stateless chunks differ (the GRU state genuinely streams)
    m0, _ = aec.forward(params, spec[:, :, 8:16], None)
    assert not np.allclose(np.asarray(m0), np.asarray(outs[1]))


def test_gru_cell_matches_torch_convention():
    import torch
    c, h = 8, 8
    rng = np.random.default_rng(2)
    w_ih = rng.normal(size=(c, 3 * h)).astype(np.float32)
    w_hh = rng.normal(size=(h, 3 * h)).astype(np.float32)
    b_ih = rng.normal(size=(3 * h,)).astype(np.float32)
    b_hh = rng.normal(size=(3 * h,)).astype(np.float32)
    x = rng.normal(size=(1, 5, c)).astype(np.float32)

    ours, _ = aec.gru_scan(
        jnp.asarray(x), jnp.zeros((1, h)), jnp.asarray(w_ih),
        jnp.asarray(w_hh), jnp.asarray(b_ih), jnp.asarray(b_hh))

    cell = torch.nn.GRU(c, h, batch_first=True)
    with torch.no_grad():
        cell.weight_ih_l0.copy_(torch.tensor(w_ih.T))
        cell.weight_hh_l0.copy_(torch.tensor(w_hh.T))
        cell.bias_ih_l0.copy_(torch.tensor(b_ih))
        cell.bias_hh_l0.copy_(torch.tensor(b_hh))
        ref, _ = cell(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@needs_aec
def test_import_mgk_end_to_end():
    model = mgk.import_mgk(AEC_PATH)
    rng = np.random.default_rng(3)
    spec = rng.normal(size=(1, 256, 8)).astype(np.float32)
    mask, state = model.run(spec)
    assert mask.shape == (1, 256, 8, 2)
    mask2, _ = model.run(spec, state)
    assert mask2.shape == (1, 256, 8, 2)
