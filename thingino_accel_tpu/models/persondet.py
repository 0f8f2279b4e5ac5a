"""Calibrated reconstruction of the jzdl person detector.

Runs the network decompiled from the OEM ``libpersonDet_inf.so``
(``formats/jzdl.py``) with its byte-exact int8 weights. The conv
accumulators, topology, head decode (int32 bias + f32 per-channel
scale) and the decoded quant metadata structure are all from the
artifact; the inner-conv requantization uses per-channel affines
CALIBRATED from natural-image activation statistics, because the OEM
datapath's exact bias-rounding law is not recoverable offline (see the
``formats/jzdl.py`` docstring and ``docs/JZDL.md`` for the forensics
and the honest boundary).

This is the analog of the reference's decompiler validation step
(``/root/reference/mgk-decompiler/test_yolo_inference.py``: extracted
weights -> runnable model -> validated inference), reached without
executing any OEM code: calibrate on one natural image, detect on a
held-out one (``tests/test_jzdl.py::test_calibrated_reconstruction_*``).

All ops are numpy (the model is 34x34 at its widest — TPU dispatch
would be pure overhead at this size; the import path stays offline per
SURVEY §7).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from thingino_accel_tpu.formats import jzdl

# focal-init head priors decoded from the artifact (bias * scale at
# zero input); used by tests as the absolute reference point
HEAD_CHANNELS = 6        # x, y, w, h, obj, person
HEAD_ANCHORS = 3


def conv_acc(x: np.ndarray, l: jzdl.JzdlLayer) -> np.ndarray:
    """int32 accumulator map for conv layer ``l`` over ``x`` [H,W,Ci].

    Pad semantics: 3x3 convs pad 1 (the -233 'same' marker); the s2
    stem therefore maps 67 -> 34, matching the downstream concat
    shapes, which is the artifact's own shape constraint.
    """
    H, W, Ci = x.shape
    if l.ltype == jzdl.T_CONV_STEM:
        Wt = l.weights.reshape(9 * Ci, l.out_channels).astype(np.int32)
        xp = np.zeros((H + 2, W + 2, Ci), x.dtype)
        xp[1:-1, 1:-1] = x
        oh, ow = (H + 1) // 2, (W + 1) // 2
        cols = np.zeros((oh, ow, 9 * Ci), np.int32)
        for idx, (ky, kx) in enumerate(
                (a, b) for a in range(3) for b in range(3)):
            cols[:, :, idx * Ci:(idx + 1) * Ci] = \
                xp[ky:ky + 2 * oh:2, kx:kx + 2 * ow:2]
        return cols @ Wt
    if l.is_depthwise:
        Wt = l.weight_taps().astype(np.int32)          # (9, C)
        xp = np.zeros((H + 2, W + 2, Ci), x.dtype)
        xp[1:-1, 1:-1] = x
        acc = np.zeros((H, W, Ci), np.int32)
        for idx, (ky, kx) in enumerate(
                (a, b) for a in range(3) for b in range(3)):
            acc += xp[ky:ky + H, kx:kx + W] * Wt[idx]
        return acc
    return x.astype(np.int32) @ l.weight_matrix().astype(np.int32).T


Calibration = Dict[int, Tuple[np.ndarray, np.ndarray]]


def _structural(l, xin, blobs):
    if l.ltype == jzdl.T_SPLIT:
        for t in l.tops:
            blobs[t] = xin
    elif l.ltype == jzdl.T_MAXPOOL:
        H, W, C = xin.shape
        h2, w2 = H // 2, W // 2
        blobs[l.tops[0]] = xin[:h2 * 2, :w2 * 2].reshape(
            h2, 2, w2, 2, C).max(axis=(1, 3))
    elif l.ltype == jzdl.T_UPSAMPLE:
        blobs[l.tops[0]] = np.repeat(np.repeat(xin, 2, 0), 2, 1)
    elif l.ltype == jzdl.T_CONCAT:
        parts = [blobs[b] for b in l.bottoms]
        h = min(p.shape[0] for p in parts)
        w = min(p.shape[1] for p in parts)
        blobs[l.tops[0]] = np.concatenate([p[:h, :w] for p in parts], -1)
    elif l.ltype == jzdl.T_DETECT_OUT:
        pass
    else:
        raise ValueError(f"unhandled layer type {l.ltype}")


def forward(
    model: jzdl.JzdlModel,
    img: np.ndarray,                      # [H,W,3] uint8 RGB
    cal: Optional[Calibration] = None,
    collect_cal: Optional[Calibration] = None,
) -> Dict[int, np.ndarray]:
    """Run the reconstruction. Returns {head blob id: [H,W,18] f64}.

    With ``collect_cal`` given (an empty dict), per-layer accumulator
    (mean, std) statistics are recorded into it — that dict then serves
    as ``cal`` for subsequent images. Requant per conv: standardize the
    accumulator per channel and map +-2.5 sigma onto the feature
    range (signed view of the 4/5-bit features, metadata widths from
    the artifact's weight_meta)."""
    c, h, w = model.input_chw
    assert img.shape == (h, w, 3), (img.shape, (h, w, 3))
    blobs: Dict[int, np.ndarray] = {0: img.astype(np.int32) - 128}
    heads: Dict[int, np.ndarray] = {}
    for li, l in enumerate(model.layers):
        if l.ltype == jzdl.T_INPUT:
            continue
        xin = blobs[l.bottoms[0]]
        if l.is_conv and l.weight_flag != 4:
            acc = conv_acc(xin, l).astype(np.float64)
            out_bits = (l.weight_meta[2] if l.ltype == jzdl.T_CONV_STEM
                        else l.weight_meta[1])
            hi = 2 ** (out_bits - 1) - 1
            if collect_cal is not None:
                flat = acc.reshape(-1, acc.shape[-1])
                collect_cal[li] = (flat.mean(axis=0),
                                   flat.std(axis=0) + 1e-9)
                cal = collect_cal
            if cal is None or li not in cal:
                raise ValueError("run with collect_cal= on a "
                                 "calibration image first")
            mu, sd = cal[li]
            t = (acc - mu) / sd * (hi / 2.5)
            blobs[l.tops[0]] = np.clip(
                np.round(t), -hi - 1, hi).astype(np.int32)
        elif l.is_conv:                        # head: int32 bias, f32 scale
            acc = conv_acc(xin, l)
            y = (acc + l.bias).astype(np.float64) * l.scales
            blobs[l.tops[0]] = y
            heads[l.tops[0]] = y
        else:
            _structural(l, xin, blobs)
    return heads


def calibrate(model: jzdl.JzdlModel, img: np.ndarray) -> Calibration:
    """Collect per-layer accumulator statistics on one image."""
    cal: Calibration = {}
    forward(model, img, collect_cal=cal)
    return cal


def person_maps(heads: Dict[int, np.ndarray]) -> Dict[int, np.ndarray]:
    """Per-head [H,W] person-logit maps: max over anchors of
    obj_logit + person_class_logit."""
    out = {}
    for hb, y in heads.items():
        g = y.reshape(y.shape[0], y.shape[1], HEAD_ANCHORS, HEAD_CHANNELS)
        out[hb] = (g[..., 4] + g[..., 5]).max(axis=-1)
    return out


def head_priors(model: jzdl.JzdlModel) -> Dict[int, np.ndarray]:
    """Per-head (anchors, 6) focal-init priors: bias*scale at zero
    input — the artifact's own absolute calibration reference."""
    out = {}
    for hl in (l for l in model.conv_layers() if l.weight_flag == 4):
        out[hl.tops[0]] = (hl.bias * hl.scales).reshape(
            HEAD_ANCHORS, HEAD_CHANNELS)
    return out
