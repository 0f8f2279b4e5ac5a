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

Round 5 DECODED the metadata encoding the round-4 reading got wrong
(full forensics: docs/JZDL.md, search harness:
examples/jzdl_law_search.py): the inner-conv region is
[bias i16[C] | mant i32[C/2] pair-shared | shift u16[C] | zero u16[C]],
with mantissas stored on a x1000 Q21 grid (round(m*2^21)*1000) — the
same convention the stem's mult array uses. Per-channel requant scale
= mant/2^31 * 2^-shift, identity channel order (regression vs
activation statistics: corr +0.44 vs ~0 for permuted orders).

What remains approximate offline: the OEM datapath's exact
bias-application/rounding detail. Running the stored metadata verbatim
keeps healthy per-layer statistics but bleeds image signal into the
clamp rails; per-channel affines CALIBRATED on one natural image
(models/persondet.py) yield a working detector from the byte-exact
weights, validated on a held-out image (tests/test_jzdl.py).

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

    print("\ndecoded inner-conv metadata (round 5: bias i16 | mant "
          "i32 pair | shift u16 | zero u16):")
    for i, l in enumerate(model.conv_layers()):
        if l.mant is None:
            continue
        if i < 3 or i > 20:
            s = l.requant_scale()
            print(f"  conv{i}: bias[{l.bias16.min()},{l.bias16.max()}] "
                  f"mant x1000-Q21 frac="
                  f"{float((l.mant % 1000 == 0).mean()):.2f} "
                  f"shift[{l.shift16.min()},{l.shift16.max()}] "
                  f"scale med={float(np.median(s)):.4f}")

    # calibrated reconstruction: detect on a held-out image
    try:
        import matplotlib
        from PIL import Image
        from thingino_accel_tpu.models import persondet
        _, h, w = 0, model.input_chw[1], model.input_chw[2]
        def load(p):
            return np.asarray(Image.open(p).convert("RGB")
                              .resize((w, h)), np.uint8)
        street = load("/root/reference/mgk-decompiler/test_detection.jpg")
        hopper = load(os.path.join(os.path.dirname(matplotlib.__file__),
                      "mpl-data", "sample_data", "grace_hopper.jpg"))
        cal = persondet.calibrate(model, street)
        heads = persondet.forward(model, hopper, cal)
        print("\ncalibrated reconstruction on HELD-OUT grace_hopper:")
        for hb, pm in persondet.person_maps(heads).items():
            med = float(np.median(pm))
            print(f"  head{hb} {pm.shape}: person-logit med={med:+.1f} "
                  f"max={pm.max():+.1f} (peak - med = "
                  f"{pm.max()-med:.1f})")
            thr = med + 0.5 * (pm.max() - med)
            step = max(1, pm.shape[0] // 17)
            for r in range(0, pm.shape[0], step):
                print("    " + "".join(
                    "#" if v >= thr else "." for v in pm[r]))
    except Exception as e:          # images are env-provided
        print(f"\n(calibrated demo skipped: {e})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
