#!/usr/bin/env python3
"""AEC real-time factor on the decompiled `.mgk` (REAL weights).

The audio modality's perf number. Window = [B, 256, 8] log1p-magnitude
frames, one new frame per hop (HOP=256 @ 16 kHz -> 16 ms of audio per
window). Two protocols:

1. **scan**: W windows as ONE ``lax.scan`` XLA program with the GRU
   state as carry — the TPU-native streaming form (the whole stream is
   a single device program; no per-window host roundtrips). Throughput
   measure: xRT = audio seconds / wall second, per stream and for a
   B-stream batch (the multi-camera analog for audio serving).
2. **step**: per-window host loop (the shape of the reference's
   ``scripts/aec_inference.py``). Through the tunneled dev chip this
   measures the relay roundtrip, not the model — reported for latency
   shape only.

Env: TAT_AEC_WINDOWS (default 256), TAT_AEC_BATCH (default 32).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AEC = "/root/reference/AEC_T41_16K_NS_OUT_UC.mgk"
HOP_S = 256 / 16000.0            # audio seconds per window step


def main() -> int:
    if not os.path.exists(AEC):
        print(f"SKIP: {AEC} not available")
        return 0
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.formats.mgk import import_mgk
    from thingino_accel_tpu.runtime import Engine
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    W = int(os.environ.get("TAT_AEC_WINDOWS", "256"))
    B = int(os.environ.get("TAT_AEC_BATCH", "32"))

    from thingino_accel_tpu.models.aec import make_stream_scanner

    g = import_mgk(AEC, streaming=True)
    run = make_stream_scanner(g)
    eng = Engine(g)
    body, params = eng._fn, eng.params
    in_name, h_name = g.inputs[0], g.inputs[1]
    h_out = g.outputs[1]
    rng = np.random.default_rng(0)

    def scan_stream(batch: int):
        # the decompiled graph is single-stream (its [1, 64, 32] GRU
        # state layout is freq-groups, not a batch axis): concurrent
        # streams are a vmap over the whole stepped program — the
        # functional-transform answer to "N independent recurrences"
        wins = jnp.asarray(np.abs(rng.normal(
            size=(W, batch, 1, 256, 8))).astype(np.float32))
        h0 = jnp.zeros((batch, 1, 64, 32), jnp.float32)

        masks = run(h0, wins)                 # compile + warmup
        jax.block_until_ready(masks)
        t0 = time.perf_counter()
        masks = run(h0, wins)
        jax.block_until_ready(masks)
        dt = time.perf_counter() - t0
        audio_s = W * HOP_S
        return audio_s / dt, masks.shape

    xrt1, shp = scan_stream(1)
    print(f"scan B=1:   {xrt1:8.1f}x realtime "
          f"({W} windows = {W * HOP_S:.2f}s audio; masks {shp})")
    xrtB, _ = scan_stream(B)
    print(f"scan B={B}: {xrtB * B:8.1f}x realtime aggregate "
          f"({xrtB:.1f}x per stream) — {B} concurrent streams")

    # per-window host loop (reference shape; tunnel-roundtrip-bound on
    # the dev chip)
    win = jnp.asarray(np.abs(rng.normal(size=(1, 256, 8))).astype(np.float32))
    h = jnp.zeros((1, 64, 32), jnp.float32)
    fn = jax.jit(lambda h, x: body(params, {in_name: x, h_name: h}))
    out = fn(h, win)
    jax.block_until_ready(out)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out[h_out], win)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"step loop:  {ms:.2f} ms/window (budget {HOP_S * 1e3:.0f} ms; "
          f"host-roundtrip per window — the scan number is the "
          f"framework claim)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
