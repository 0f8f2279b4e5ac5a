#!/usr/bin/env python3
"""Search the jzdl inner-conv requantization law (round-5).

Round-4 left the law open. Round-5 byte forensics cracked the metadata
encoding (the key: 50% of "quant_a" words divisible by 1000, in a clean
second-half block — see docs/JZDL.md):

    inner conv metadata (8*C bytes total, C = out channels):
        bias  int16[C]     -- acc-domain bias
        mant  int32[C/2]   -- PAIR-shared multiplier mantissa,
                              stored as round(m * 2^21) * 1000
                              (i.e. Q21 in units of 1000; /1000 lands
                              in [2^20, 2^21) for ~97% of channels)
        shift uint16[C]    -- per-channel right shift
        zero  uint16[C]    -- reserved (all zero in the artifact)

    stem (type 46): bias int32[C], mant int32[C] (same *1000 Q21
    convention — verified: 100% divisible by 1000, /1000 in Q21),
    shift int32[C]

    weight meta = (w_bits, in_bits, out_bits) for the stem,
    (in_bits, out_bits) for inner convs: unsigned feature widths.

Remaining degrees of freedom (this script's grid): input preprocessing,
feature signedness, rounding mode, bias placement. Objective: layer-wise
distribution sanity (not collapsed, not saturated) on natural images +
head objectness that responds to a person.

Run: python examples/jzdl_law_search.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from thingino_accel_tpu.formats import jzdl  # noqa: E402

SO = "/root/reference/libpersonDet_inf.so"
IMAGES = {
    "grace_hopper": "matplotlib-sample",   # resolved below
    "street": "/root/reference/mgk-decompiler/test_detection.jpg",
}


def load_image(path, hw):
    from PIL import Image
    im = Image.open(path).convert("RGB").resize((hw[1], hw[0]))
    return np.asarray(im, np.uint8)


def _resolve_images():
    import matplotlib
    IMAGES["grace_hopper"] = os.path.join(
        os.path.dirname(matplotlib.__file__),
        "mpl-data", "sample_data", "grace_hopper.jpg")


def decode_meta(l):
    """(bias[C], mant_per_channel[C], shift[C]) under the decoded law."""
    C = l.out_channels
    if l.ltype == jzdl.T_CONV_STEM:
        return (l.bias.astype(np.int64), l.q31_mult.astype(np.int64),
                l.q_shift.astype(np.int64))
    raw = l.quant_a.astype("<i4")
    bias = np.frombuffer(raw[: C // 2].tobytes(), "<i2").astype(np.int64)
    mant_pair = raw[C // 2:].astype(np.int64)          # C/2 entries
    mant = np.repeat(mant_pair, 2)                     # pair-shared
    shift = np.frombuffer(
        l.quant_packed[: C // 2].astype("<u4").tobytes(),
        "<u2").astype(np.int64)
    return bias, mant, shift


def conv_acc(x, l):
    """int32 accumulator map for layer l on feature map x [H,W,Cin]."""
    H, W, Ci = x.shape
    if l.ltype == jzdl.T_CONV_STEM:
        # weights (spatial*ci, co), co fastest; k3 s2 pad 1
        Wt = l.weights.reshape(9 * Ci, l.out_channels).astype(np.int32)
        xp = np.zeros((H + 2, W + 2, Ci), x.dtype)
        xp[1:-1, 1:-1] = x
        oh = (H + 1) // 2
        ow = (W + 1) // 2
        cols = np.zeros((oh, ow, 9 * Ci), np.int32)
        idx = 0
        for ky in range(3):
            for kx in range(3):
                cols[:, :, idx * Ci:(idx + 1) * Ci] = \
                    xp[ky:ky + 2 * oh:2, kx:kx + 2 * ow:2]
                idx += 1
        return cols @ Wt
    if l.is_depthwise:
        Wt = l.weight_taps().astype(np.int32)          # (9, C)
        xp = np.zeros((H + 2, W + 2, Ci), x.dtype)
        xp[1:-1, 1:-1] = x
        acc = np.zeros((H, W, Ci), np.int32)
        idx = 0
        for ky in range(3):
            for kx in range(3):
                acc += xp[ky:ky + H, kx:kx + W] * Wt[idx]
                idx += 1
        return acc
    Wt = l.weight_matrix().astype(np.int32)            # (co, ci)
    return x.astype(np.int32) @ Wt.T


def requant(acc, bias, mant, shift, out_bits, *, signed, rounding,
            bias_pre, relu=True):
    """acc int32 [H,W,C] -> out_bits feature ints."""
    accb = acc + bias if bias_pre else acc
    t = accb.astype(np.float64) * (mant.astype(np.float64) / 2 ** 31)
    t = t / np.exp2(shift.astype(np.float64))
    if not bias_pre:
        t = t + bias
    y = np.round(t) if rounding == "nearest" else np.floor(t)
    if signed:
        lo, hi = -(2 ** (out_bits - 1)), 2 ** (out_bits - 1) - 1
        if relu:
            lo = 0
    else:
        lo, hi = 0, 2 ** out_bits - 1
    return np.clip(y, lo, hi).astype(np.int32)


def forward(model, img, law, collect=None):
    """Run the full graph; returns {blob: array} for head outputs."""
    blobs = {}
    x = img.astype(np.int32)
    if law["pre"] == "sub128":
        x = x - 128
    if law["pre"] == "bgr":
        x = x[:, :, ::-1]
    blobs[0] = x
    heads = {}
    for li, l in enumerate(model.layers):
        if l.ltype == jzdl.T_INPUT:
            continue
        xin = blobs[l.bottoms[0]]
        if l.is_conv and l.weight_flag != 4:
            acc = conv_acc(xin, l)
            bias, mant, shift = decode_meta(l)
            out_bits = (l.weight_meta[2]
                        if l.ltype == jzdl.T_CONV_STEM else l.weight_meta[1])
            y = requant(acc, bias, mant, shift, out_bits,
                        signed=law["signed"], rounding=law["rounding"],
                        bias_pre=law["bias_pre"])
            blobs[l.tops[0]] = y
            if collect is not None:
                collect.append((li, jzdl.LAYER_NAMES[l.ltype], y))
        elif l.is_conv:                                  # head, f32 out
            acc = conv_acc(xin, l)
            y = (acc + l.bias).astype(np.float64) * l.scales
            blobs[l.tops[0]] = y
            heads[l.tops[0]] = y
        elif l.ltype == jzdl.T_SPLIT:
            for t in l.tops:
                blobs[t] = xin
        elif l.ltype == jzdl.T_MAXPOOL:
            H, W, C = xin.shape
            h2, w2 = H // 2, W // 2
            v = xin[:h2 * 2, :w2 * 2].reshape(h2, 2, w2, 2, C)
            blobs[l.tops[0]] = v.max(axis=(1, 3))
        elif l.ltype == jzdl.T_UPSAMPLE:
            blobs[l.tops[0]] = np.repeat(np.repeat(xin, 2, 0), 2, 1)
        elif l.ltype == jzdl.T_CONCAT:
            parts = [blobs[b] for b in l.bottoms]
            h = min(p.shape[0] for p in parts)
            w = min(p.shape[1] for p in parts)
            blobs[l.tops[0]] = np.concatenate(
                [p[:h, :w] for p in parts], axis=-1)
        elif l.ltype == jzdl.T_DETECT_OUT:
            pass
    return heads


def health(layers):
    """Aggregate distribution-sanity score: higher is better."""
    score = 0.0
    rows = []
    for li, tag, y in layers:
        nz = float((y != 0).mean())
        ymax = y.max() if y.size else 0
        sat = float((y == ymax).mean()) if ymax > 0 else 1.0
        ent = 0.0
        vals, counts = np.unique(y, return_counts=True)
        p = counts / counts.sum()
        ent = float(-(p * np.log2(p)).sum())
        ok = (0.05 < nz) and (sat < 0.5) and ent > 0.5
        score += ent * (1.0 if ok else 0.1)
        rows.append((li, tag, nz, sat, ent))
    return score, rows


def main():
    _resolve_images()
    model = jzdl.load_so(SO)
    c, h, w = model.input_chw
    imgs = {k: load_image(v, (h, w)) for k, v in IMAGES.items()}

    grid = []
    for pre in ("raw", "sub128", "bgr"):
        for signed in (False, True):
            for rounding in ("nearest", "floor"):
                for bias_pre in (True, False):
                    grid.append(dict(pre=pre, signed=signed,
                                     rounding=rounding, bias_pre=bias_pre))

    results = []
    for law in grid:
        tot = 0.0
        objs = {}
        for name, img in imgs.items():
            coll = []
            heads = forward(model, img, law, collect=coll)
            s, rows = health(coll)
            tot += s
            # objectness channels: 18 = 3 anchors x (4 box, obj, cls)
            o = []
            for hb, y in heads.items():
                obj = y.reshape(y.shape[0], y.shape[1], 3, 6)[..., 4]
                o.append((float(obj.max()), float(obj.mean())))
            objs[name] = o
        results.append((tot, law, objs))

    results.sort(key=lambda r: -r[0])
    for tot, law, objs in results[:6]:
        print(f"score={tot:7.1f} law={law}")
        for name, o in objs.items():
            print(f"    {name}: " + "  ".join(
                f"head{i}: max={mx:+.1f} mean={mn:+.1f}"
                for i, (mx, mn) in enumerate(o)))
    print("\nworst:")
    for tot, law, objs in results[-2:]:
        print(f"score={tot:7.1f} law={law}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
