"""Minimal ELF32 writer for synthetic `.mgk` fixtures.

No YOLO-family `.mgk` ships in this environment, so the decompiler's
non-GRU paths are validated against fixtures built here: a little-endian
ELF32 (the MIPS `.mgk` container shape, ``src/model.c:242-258``) with a
`.rodata` carrying layer-name strings, a `.symtab`/`.strtab` pair, and a
weight blob appended after the section-header table (the OEM layout:
``mgk-decompiler`` computes elf_end = e_shoff + shnum * shentsize and
treats the tail as weights).

This is a TEST fixture generator — it writes just enough of the format
for :func:`thingino_accel_tpu.formats.mgk.parse_elf` and real readelf
to agree on sections and symbols; it does not produce loadable objects.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Sequence, Tuple

_SHT_PROGBITS = 1
_SHT_SYMTAB = 2
_SHT_STRTAB = 3


def _strtab(names: Sequence[str]) -> Tuple[bytes, Dict[str, int]]:
    buf = bytearray(b"\x00")
    offs = {}
    for n in names:
        offs[n] = len(buf)
        buf += n.encode() + b"\x00"
    return bytes(buf), offs


def build_elf32(
    rodata: bytes,
    symbols: Sequence[Tuple[str, int, int]] = (),   # (name, value, size)
    appended: bytes = b"",
    extra_sections: Dict[str, bytes] = None,
) -> bytes:
    """Assemble an ELF32-LE image: header | section bodies | shtab |
    ``appended`` weight blob."""
    extra_sections = dict(extra_sections or {})
    sym_strtab, sym_offs = _strtab([s[0] for s in symbols])
    symtab = bytearray(b"\x00" * 16)                  # STN_UNDEF entry
    for name, value, size in symbols:
        # st_name, st_value, st_size, st_info(FUNC=2|GLOBAL<<4),
        # st_other, st_shndx
        symtab += struct.pack("<IIIBBH", sym_offs[name], value, size,
                              (1 << 4) | 2, 0, 1)

    bodies: List[Tuple[str, int, bytes, int]] = [     # (name, type, data, link)
        (".rodata", _SHT_PROGBITS, rodata, 0),
        (".symtab", _SHT_SYMTAB, bytes(symtab), 0),   # link patched below
        (".strtab", _SHT_STRTAB, sym_strtab, 0),
    ]
    for name, data in extra_sections.items():
        bodies.append((name, _SHT_PROGBITS, data, 0))

    shnames = [""] + [b[0] for b in bodies] + [".shstrtab"]
    shstr, shoffs = _strtab(shnames[1:])
    bodies.append((".shstrtab", _SHT_STRTAB, shstr, 0))

    ehsize = 52
    off = ehsize
    placed = []                                        # (name,type,off,size,link)
    for name, st, data, link in bodies:
        placed.append((name, st, off, len(data), link))
        off += len(data)
    # patch .symtab link -> index of .strtab (section 0 is the null one)
    idx = {name: i + 1 for i, (name, *_rest) in enumerate(placed)}
    placed = [(n, t, o, s, idx[".strtab"] if n == ".symtab" else 0)
              for (n, t, o, s, _l) in placed]

    e_shoff = off
    shnum = len(placed) + 1
    shstrndx = idx[".shstrtab"]

    sh = bytearray(b"\x00" * 40)                       # null section
    for name, st, o, size, link in placed:
        sh += struct.pack("<10I", shoffs[name], st, 0, 0, o, size,
                          link, 0, 1, 16 if st == _SHT_SYMTAB else 0)

    hdr = bytearray(52)
    hdr[:4] = b"\x7fELF"
    hdr[4] = 1          # ELFCLASS32
    hdr[5] = 1          # little-endian
    hdr[6] = 1          # EV_CURRENT
    struct.pack_into("<HHI", hdr, 16, 3, 8, 1)         # ET_DYN, EM_MIPS
    struct.pack_into("<I", hdr, 0x20, e_shoff)
    struct.pack_into("<HHH", hdr, 0x2E, 40, shnum, shstrndx)

    body = b"".join(d for _, _, d, _ in bodies)
    return bytes(hdr) + body + bytes(sh) + appended


def build_yolo_mgk(
    size: str = "n",
    num_classes: int = 80,
    in_hw: Tuple[int, int] = (64, 64),
    w_scale_run: bool = True,
    w_scale: float = None,
) -> Tuple[bytes, object]:
    """Synthetic YOLO-family `.mgk`: the zoo graph's OWN int8 weights
    packed per the sequential blob layout ``formats.mgk_yolo`` mines,
    `.rodata` carrying YOLO-style layer-name strings + the per-layer
    weight-scale run, and ``*_param_init`` symbols for family
    detection. Returns (mgk_bytes, zoo_graph) so tests can compare the
    decompiled export against the graph it was packed from."""
    import numpy as np
    from thingino_accel_tpu.formats.mgk_yolo import yolo_weight_table
    from thingino_accel_tpu.models import zoo

    cfg = None
    if w_scale is not None:
        # small w_scale keeps 60 layers of random f32 weights bounded
        # so tests can compare full-model outputs numerically
        cfg = zoo.ZooConfig(dtype="int8", num_classes=num_classes,
                            in_hw=in_hw, w_scale=w_scale)
    g, entries, total = yolo_weight_table(size, num_classes, in_hw, cfg)
    blob = bytearray(total)
    for e in entries:
        w = g.tensors[e.w_name].data
        assert w.dtype == np.int8 and w.size == e.w_size
        blob[e.w_off:e.w_off + e.w_size] = w.tobytes()
        if e.b_name:
            b = g.tensors[e.b_name].data
            assert b.dtype == np.int32
            blob[e.b_off:e.b_off + e.b_size] = \
                b.astype("<i4").tobytes()

    ro = bytearray()
    for i, e in enumerate(entries):
        ro += f"{400 + 3 * i}_QuantizeConv2D\x00".encode()
    ro += f"{400 + 3 * len(entries)}_output_last_layer\x00".encode()
    ro += b"NHWC\x00INT8\x00"
    if w_scale_run:
        ro += b"\x00" * ((4 - len(ro) % 4) % 4)     # 4-align
        ro += b"\x00" * 4                            # 0.0 sentinel
        scales = np.asarray(
            [float(g.tensors[e.w_name].quant.scale) for e in entries],
            "<f4")
        ro += scales.tobytes()
        ro += b"\x00" * 4                            # 0.0 sentinel

    symbols = [
        ("conv2d_int8_param_init", 0x1000, 64),
        ("maxpool_int8_param_init", 0x1100, 64),
        ("concat_int8_param_init", 0x1200, 64),
        ("add_int8_param_init", 0x1300, 64),
        ("upsample_int8_param_init", 0x1400, 64),
    ]
    return build_elf32(bytes(ro), symbols, appended=bytes(blob)), g
