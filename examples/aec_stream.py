#!/usr/bin/env python3
"""Streaming AEC inference (the mgk-decompiler/scripts/aec_inference.py
analog): spectrogram frames through the GRU U-Net with carried hidden
state, chunk by chunk, verifying chunked == whole-stream scan.
"""

import sys

import numpy as np


def main() -> int:
    import jax.numpy as jnp
    from thingino_accel_tpu.models import aec

    cfg = aec.AECConfig()
    params = aec.init_params(cfg)
    print(f"[1] AEC model: {cfg.freq_bins} bins, hidden {cfg.hidden}")

    # synthetic 1-second-ish spectrogram stream: 64 frames
    rng = np.random.default_rng(0)
    spec = jnp.asarray(
        np.abs(rng.normal(size=(1, cfg.freq_bins, 64, 1))).astype(np.float32))

    print("[2] Streaming in 8-frame chunks with carried GRU state...")
    state = None
    masks = []
    for i in range(8):
        m, state = aec.forward(params, spec[:, :, i * 8:(i + 1) * 8], state)
        masks.append(m)
        print(f"    chunk {i}: mask mean {float(m.mean()):.4f}")
    chunked = np.concatenate([np.asarray(m) for m in masks], axis=2)

    print("[3] Same stream as ONE lax.scan program...")
    scanned = np.asarray(aec.process_stream(params, spec, chunk=8))
    err = np.abs(chunked - scanned).max()
    print(f"    chunked-vs-scan max diff: {err:.2e}")
    ok = err < 1e-3
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
