"""`.mgk` (Magik) model importer — offline parsing only.

A `.mgk` model is a MIPS32 ELF shared object carrying both OEM-compiled
kernel code and weights. The reference has two ways in: a host runtime
that ``dlopen``s the model and reconstructs the OEM C++ ABI
(``src/venus/``, fragile by design), and an offline decompiler that mines
the ELF statically (``mgk-decompiler/``). On TPU only the second makes
sense: **we never execute model code** — this module parses the ELF,
mines ``.rodata`` metadata (layer names, formats, dtypes, quant scales),
extracts the appended weight blob, and reconstructs a runnable IR graph
for recognized architectures (the AEC audio model).

File layout (verified against ``AEC_T41_16K_NS_OUT_UC.mgk``):
ELF header/sections (.text code, .rodata metadata, .data.rel.ro) followed
by raw appended weights at ``elf_end = e_shoff + e_shnum * e_shentsize``
— the same end-of-ELF rule the reference loader uses
(``src/venus/model_loader.cpp:96-122``).
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from thingino_accel_tpu.formats.packing import unpack_nmhwsoib2


# ---------------------------------------------------------------------------
# Minimal ELF32 parsing
# ---------------------------------------------------------------------------


@dataclass
class Section:
    name: str
    sh_type: int
    offset: int
    size: int
    addr: int


@dataclass
class ElfFile:
    sections: Dict[str, Section]
    elf_end: int
    symbols: List[Tuple[str, int, int]]  # (name, value, size)
    data: bytes

    def section_bytes(self, name: str) -> bytes:
        s = self.sections.get(name)
        if s is None:
            return b""
        return self.data[s.offset:s.offset + s.size]

    @property
    def appended(self) -> bytes:
        """The weight blob appended after the ELF proper."""
        return self.data[self.elf_end:]


def parse_elf(data: bytes) -> ElfFile:
    if data[:4] != b"\x7fELF":
        raise ValueError("not an ELF file")
    if data[4] != 1 or data[5] != 1:
        raise ValueError("only ELF32 little-endian .mgk files supported")
    e_shoff, = struct.unpack_from("<I", data, 0x20)
    e_shentsize, e_shnum, e_shstrndx = struct.unpack_from("<HHH", data, 0x2E)
    elf_end = e_shoff + e_shnum * e_shentsize

    raw_sections = []
    for i in range(e_shnum):
        off = e_shoff + i * e_shentsize
        (sh_name, sh_type, _flags, sh_addr, sh_offset, sh_size,
         sh_link, _info, _align, _entsize) = struct.unpack_from(
             "<10I", data, off)
        raw_sections.append(
            (sh_name, sh_type, sh_addr, sh_offset, sh_size, sh_link))

    shstr_off = raw_sections[e_shstrndx][3] if e_shstrndx < len(raw_sections) \
        else 0

    def str_at(base: int, off: int) -> str:
        end = data.index(b"\x00", base + off)
        return data[base + off:end].decode("utf-8", "replace")

    sections: Dict[str, Section] = {}
    symtabs = []
    strtabs = {}
    for i, (nm, st, addr, off, size, link) in enumerate(raw_sections):
        name = str_at(shstr_off, nm) if shstr_off else f"sec{i}"
        sections[name] = Section(name=name, sh_type=st, offset=off,
                                 size=size, addr=addr)
        if st in (2, 11):  # SYMTAB, DYNSYM
            symtabs.append((name, off, size, link))
        if st == 3:
            strtabs[name] = off

    symbols: List[Tuple[str, int, int]] = []
    fallback = strtabs.get(".dynstr") or strtabs.get(".strtab")
    for _, off, size, link in symtabs:
        # each symtab names its own string table via sh_link
        # (.symtab -> .strtab, .dynsym -> .dynstr)
        str_off = (raw_sections[link][3]
                   if 0 < link < len(raw_sections)
                   and raw_sections[link][1] == 3 else fallback)
        for so in range(off, off + size, 16):  # Elf32_Sym = 16 bytes
            st_name, st_value, st_size, _info, _other, _shndx = \
                struct.unpack_from("<IIIBBH", data, so)
            if st_name and str_off is not None:
                try:
                    symbols.append(
                        (str_at(str_off, st_name), st_value, st_size))
                except ValueError:
                    pass
    return ElfFile(sections=sections, elf_end=elf_end, symbols=symbols,
                   data=data)


# ---------------------------------------------------------------------------
# .rodata metadata mining
# ---------------------------------------------------------------------------

_DATA_FORMATS = ("NHWC", "NCHW", "NDHWC32", "NDHWC", "NMHWSOIB2", "NMC32",
                 "OIHW", "HWIO", "OHWI", "NV12", "D1", "NC", "N")
_DATA_TYPES = ("FP32", "FP16", "UINT8", "INT8", "UINT16", "INT16",
               "UINT32", "INT32", "UINT4", "INT4", "UINT2", "INT2")
_LAYER_RE = re.compile(rb"layer_(\d+)_Quantize([A-Za-z]+)")
_OP_PATH_RE = re.compile(rb"([A-Za-z][A-Za-z0-9]+)/([a-z0-9_]+)/([\d/]+)/")


@dataclass
class MgkLayer:
    layer_id: int
    kind: str           # Feature / BatchNorm / GRU / ...
    name: str
    offset: int


@dataclass
class MgkMetadata:
    layers: List[MgkLayer] = field(default_factory=list)
    op_paths: List[str] = field(default_factory=list)
    formats: List[str] = field(default_factory=list)
    dtypes: List[str] = field(default_factory=list)
    strings: List[str] = field(default_factory=list)
    scale_groups: List[Tuple[int, List[float]]] = field(default_factory=list)
    weight_size: int = 0
    elf_end: int = 0


def mine_rodata(elf: ElfFile) -> MgkMetadata:
    """Mine layer names / op paths / formats / scales from .rodata
    (the role of ``mgk-decompiler/src/rodata_parser.rs:116-732``)."""
    ro = elf.section_bytes(".rodata")
    meta = MgkMetadata(weight_size=len(elf.appended), elf_end=elf.elf_end)

    seen = set()
    for m in _LAYER_RE.finditer(ro):
        lid = int(m.group(1))
        kind = m.group(2).decode()
        nm = m.group(0).decode()
        if (lid, kind) not in seen:
            seen.add((lid, kind))
            meta.layers.append(MgkLayer(
                layer_id=lid, kind=kind, name=nm, offset=m.start()))
    meta.layers.sort(key=lambda l: l.layer_id)

    for m in _OP_PATH_RE.finditer(ro):
        meta.op_paths.append(m.group(0).decode())

    # plain strings (tensor names etc.)
    for m in re.finditer(rb"[ -~]{4,}", ro):
        s = m.group(0).decode()
        meta.strings.append(s)
        if s in _DATA_FORMATS:
            meta.formats.append(s)
        if s in _DATA_TYPES:
            meta.dtypes.append(s)

    # fp32 scale groups: runs of small positive floats
    f32 = np.frombuffer(ro[:len(ro) & ~3], dtype="<f4")
    plausible = (f32 > 1e-6) & (f32 < 1e3) & np.isfinite(f32)
    run_start = None
    for i, ok in enumerate(plausible):
        if ok and run_start is None:
            run_start = i
        elif not ok and run_start is not None:
            if i - run_start >= 4:
                meta.scale_groups.append(
                    (run_start * 4, [float(v) for v in f32[run_start:i]]))
            run_start = None
    return meta


# ---------------------------------------------------------------------------
# Weight extraction
# ---------------------------------------------------------------------------


def unpack_gru_blocks(blob: bytes, bidirectional: bool) -> Dict[str, np.ndarray]:
    """Decode the NNA GRU weight blocks (1024-byte 32x32 tiles).

    Layout per ``mgk-decompiler/MGK_FORMAT.md`` GRU section:
    - unidirectional (4096 B): blocks 0-1 = W_ih [64,32], 2-3 = W_hh [64,32]
    - bidirectional (12864 B): 12 blocks (ir,iz,in,hr,hz,hn) x fwd/bwd
      + 576 B biases.
    """
    arr = np.frombuffer(blob, dtype=np.int8)
    out: Dict[str, np.ndarray] = {}
    if bidirectional:
        names = ["w_ir", "w_iz", "w_in", "w_hr", "w_hz", "w_hn"]
        for d, prefix in enumerate(("fwd", "bwd")):
            for i, nm in enumerate(names):
                block = arr[(d * 6 + i) * 1024:(d * 6 + i + 1) * 1024]
                out[f"{prefix}_{nm}"] = block.reshape(32, 32).copy()
        if arr.size >= 12 * 1024 + 576:
            out["bias"] = arr[12 * 1024:12 * 1024 + 576].copy()
    else:
        out["w_ih"] = arr[:2048].reshape(64, 32).copy()
        out["w_hh"] = arr[2048:4096].reshape(64, 32).copy()
    return out


# Known weight-region offsets for the bundled AEC model, from the
# reference's reverse-engineering notes (``mgk-decompiler/MGK_FORMAT.md``
# "Known Layer Offsets"). Sizes in bytes.
AEC_WEIGHT_OFFSETS = {
    "layer_46_gru_bidir": (0x00000, 12864),
    "layer_63_feature": (0x03500, 448),
    "layer_68_feature": (0x03900, 448),
    "layer_35_feature": (0x03d00, 704),
    "layer_73_feature": (0x04100, 448),
    "main_conv_region": (0x04480, 55168),
    "layer_44_feature": (0x11f00, 576),
    "layer_58_feature": (0x12300, 576),
    "layer_78_feature": (0x12700, 320),
    "layer_4_feature": (0x12a00, 3648),
    "layer_16_feature": (0x13b00, 2112),
    "layer_2_feature": (0x14b00, 320),
    "secondary_conv_region": (0x16d00, 41792),
    "layer_20_feature": (0x21180, 832),
    "layer_26_feature": (0x215c0, 832),
    "layer_28_feature": (0x21a40, 1408),
    "layer_37_gru": (0x220c0, 4096),
    "layer_10_feature": (0x231c0, 2496),
    "layer_32_feature": (0x23cc0, 768),
    "layer_41_feature": (0x24100, 704),
    "layer_8_feature": (0x24500, 1024),
    "layer_14_feature": (0x24a00, 1024),
    "layer_22_feature": (0x25140, 1772),
}


def extract_weight_table(
    elf: ElfFile, meta: MgkMetadata
) -> Dict[str, np.ndarray]:
    """Weight segmentation of the appended blob.

    Boundaries follow the NNA block structure: conv weights are
    1024-byte-aligned NMHWSOIB2 regions, GRU regions are 4096/12864-byte
    block groups (``mgk-decompiler/src/weight_extractor.rs:421-531``
    boundary detection). For the recognized AEC model the per-layer
    offset table (``AEC_WEIGHT_OFFSETS``) attributes each region; GRU
    regions are additionally decoded into their 32x32 gate matrices.
    """
    blob = elf.appended
    out: Dict[str, np.ndarray] = {}
    out["blob"] = np.frombuffer(blob, dtype=np.int8)
    n_blocks = len(blob) // 1024
    if n_blocks:
        out["blocks_1024"] = (
            np.frombuffer(blob[:n_blocks * 1024], dtype=np.int8)
            .reshape(n_blocks, 1024))
    if any(l.kind == "GRU" for l in meta.layers):
        for name, (off, size) in AEC_WEIGHT_OFFSETS.items():
            if off + size > len(blob):
                continue
            region = np.frombuffer(blob[off:off + size], dtype=np.int8)
            out[name] = region.copy()
            if "gru" in name:
                gru = unpack_gru_blocks(blob[off:off + size],
                                        bidirectional="bidir" in name)
                for k, v in gru.items():
                    out[f"{name}.{k}"] = v
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def load_mgk(path_or_bytes) -> Tuple[ElfFile, MgkMetadata]:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    elf = parse_elf(data)
    meta = mine_rodata(elf)
    return elf, meta


def inspect_mgk(path: str) -> dict:
    """CLI-facing inspection (the ``mgk-decompiler -i model.mgk`` role)."""
    elf, meta = load_mgk(path)
    kinds: Dict[str, int] = {}
    for l in meta.layers:
        kinds[l.kind] = kinds.get(l.kind, 0) + 1
    return {
        "file_size": len(elf.data),
        "elf_end": elf.elf_end,
        "weight_bytes": len(elf.appended),
        "sections": {n: s.size for n, s in elf.sections.items()
                     if s.size and not n.startswith(".debug")},
        "num_symbols": len(elf.symbols),
        "layers": [l.name for l in meta.layers],
        "layer_kinds": kinds,
        "formats_seen": sorted(set(meta.formats)),
        "dtypes_seen": sorted(set(meta.dtypes)),
        "op_paths": sorted(set(meta.op_paths))[:20],
        "num_scale_groups": len(meta.scale_groups),
    }


def extract_weights(path: str, out_dir: str) -> None:
    """Dump the appended weight blob + 1024-block view as .npy files."""
    import os
    elf, meta = load_mgk(path)
    os.makedirs(out_dir, exist_ok=True)
    for name, arr in extract_weight_table(elf, meta).items():
        np.save(os.path.join(out_dir, f"{name}.npy"), arr)


def import_mgk(path: str):
    """Import a recognized `.mgk` model as a runnable IR graph.

    Currently recognizes the AEC (acoustic echo cancellation) audio model
    family by its QuantizeFeature/QuantizeGRU layer signature; builds the
    U-Net + GRU architecture (``models/aec.py``) and attaches extracted
    weights where offsets are known.
    """
    elf, meta = load_mgk(path)
    kinds = {l.kind for l in meta.layers}
    if "GRU" in kinds:
        from thingino_accel_tpu.models import aec
        return aec.build_aec_graph(weights_blob=elf.appended, meta=meta)
    raise NotImplementedError(
        f"unrecognized .mgk architecture (layer kinds: {sorted(kinds)}); "
        "use inspect_mgk/extract_weights for offline analysis")
