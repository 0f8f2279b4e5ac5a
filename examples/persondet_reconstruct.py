#!/usr/bin/env python3
"""Reconstruct the jzdl person-detect network embedded in the real OEM
``libpersonDet_inf.so`` and report the reconstruction evidence.

What is fully resolved (see ``formats/jzdl.py`` and tests/test_jzdl.py):

- topology: 32 layers — MobileNet-style dw/pw backbone at 34x34 after a
  stride-2 stem (input 3x67x67), split -> maxpool -> deeper trunk at
  17x17, FPN-lite upsample+concat back to 34x34, two 18-channel heads
  (3 anchors x [x, y, w, h, obj, cls]);
- weights: byte-exact extraction (946,080 int8 values; stem/heads
  4-bit, depthwise 8-bit, pointwise 5- then 4-bit);
- head semantics: [w][bias i32][scale f32]; bias*scale reproduces the
  anchor-detector prior signature (obj ~ -11..-24, person-class ~ +4);
- inner-conv quant metadata: signed Q31-normalized per-channel mantissa
  + packed per-channel shift pair; features run at 5 (early) / 4 (late)
  bits.

- weight layouts, pinned by the per-channel-quant absmax signature
  (all channels at the quant ceiling only under the true grouping):
  pointwise/heads (co, ci); depthwise (K*K, C) channel-fastest; stem
  output-channel-fastest.

What is NOT resolved offline: the exact inner-layer requant law — the
Q31 mantissa's pairing with the two packed per-channel shifts resists
blind calibration (K/shift/layout grids all leave features garbled and
head objectness at its prior). Resolving it needs ground-truth
activations from the OEM runtime (libjzdl is not shipped in-env) —
documented here rather than guessed silently.

Run: python examples/persondet_reconstruct.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thingino_accel_tpu.formats import jzdl  # noqa: E402

SO = "/root/reference/libpersonDet_inf.so"


def main() -> int:
    model = jzdl.load_so(SO)
    c, h, w = model.input_chw
    print(f"input: {c}x{h}x{w}")
    print(f"layers: {len(model.layers)}  blobs: {model.n_blobs}")
    total_w = sum(l.weight_size for l in model.conv_layers())
    print(f"weights extracted: {total_w} int8 values")

    print("\nlayer table:")
    for i, l in enumerate(model.layers):
        tag = jzdl.LAYER_NAMES.get(l.ltype, str(l.ltype))
        extra = ""
        if l.is_conv:
            extra = (f" {l.in_channels}->{l.out_channels} k{l.kernel}"
                     f" s{l.stride} w={l.weight_size}")
        print(f"  L{i:2d} {tag:9s} {l.bottoms}->{l.tops}{extra}")

    print("\nhead prior signature (bias * scale, per anchor):")
    for hl in (l for l in model.conv_layers() if l.weight_flag == 4):
        prior = (hl.bias * hl.scales).reshape(3, 6)
        for a in range(3):
            x, y, bw, bh, obj, cls = prior[a]
            print(f"  head{hl.tops[0]} anchor{a}: box=({x:+.1f},{y:+.1f},"
                  f"{bw:+.1f},{bh:+.1f}) obj={obj:+.1f} cls={cls:+.1f}")
    print("\nobj priors strongly negative + person-class positive ==")
    print("textbook focal-init detector head: head decode validated.")

    print("\nquant metadata (inner convs): Q31 mantissa normalization")
    for i, l in enumerate(model.conv_layers()):
        if l.quant_a is None:
            continue
        a = np.abs(l.quant_a.astype(np.float64))
        hi = (l.quant_packed >> 16).astype(int)
        med = float(np.median(np.log2(np.maximum(a, 1)) + hi))
        if i < 3 or i > 20:
            print(f"  conv{i}: median(log2|A| + shift) = {med:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
