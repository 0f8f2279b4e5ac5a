#!/usr/bin/env python3
"""Isolated decode+NMS tail A/B: exact variants of the postprocess chain.

The round-3 HLO attribution put the NMS chain at ~17 us/frame of the
225 us yolov5s program (while 4.5 + iota_reduce 5.1 + and_reduce 3.8 +
sort 2.0 + pad_max 1.5, docs/KERNELS.md) — resolution- and
model-size-independent, so it is ~14% of the real-weight yolov5n frame
(the row closest to the 10k north star). This isolates the tail on
synthetic bf16 heads at the v5@640 shapes and A/Bs exact rewrites:

  base       decode_and_parse + nms (VPU and-reduce fixpoint)   [default]
  unroll2    2 fixpoint steps per while iteration (halves loop syncs)
  matvec     suppression hits as a 0/1 bf16 matvec on the MXU
  mv+unr2    both
  defer      full-N class argmax (the iota_reduce) deferred to the
             256-pool survivors; costs materializing the [B,N,NC] head
             slice the fused path never writes — measures which is
             cheaper end-to-end

All variants are bit-exact vs base (asserted here and in
tests/test_yolo.py). Reference semantics being preserved:
/root/reference/src/mars/mars_yolo_test.c:79-130.

Run on TPU: python examples/postproc_tail_experiment.py [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHAPES = ((80, 8), (40, 16), (20, 32))   # (hw, stride) for v5@640


def main() -> int:
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.models import yolo
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = np.random.default_rng(0)
    # logits ~ N(0, 2): sigmoid(obj)*sigmoid(best) clears the 0.25
    # conf threshold for a realistic few-hundred candidates per frame
    feats = [jnp.asarray(rng.normal(size=(batch, hw, hw, 255))
                         .astype(np.float32) * 2, jnp.bfloat16)
             for hw, _ in SHAPES]
    strides = tuple(s for _, s in SHAPES)

    def make(variant):
        impl = "matvec" if variant in ("matvec", "mv+unr2") else "reduce"
        unroll = 2 if variant in ("unroll2", "mv+unr2") else 1
        defer = variant == "defer"

        @jax.jit
        def run(feats):
            b, s, c = yolo.decode_and_parse(feats, strides=strides,
                                            defer_classes=defer)
            d = yolo.nms_batched(b, s, c, max_dets=100,
                                 suppress_impl=impl, unroll=unroll,
                                 classes_are_logits=defer)
            return d.boxes, d.scores, d.classes, d.valid
        return run

    base_out = None
    rows = []
    for variant in ("base", "unroll2", "matvec", "mv+unr2", "defer"):
        fn = make(variant)
        out = jax.block_until_ready(fn(feats))
        if base_out is None:
            base_out = out
        else:
            for a, b in zip(base_out, out):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(feats)
        jax.block_until_ready(out)
        us = (time.perf_counter() - t0) / iters / batch * 1e6
        rows.append((variant, us))
        print(f"{variant:>8}: {us:7.2f} us/frame", flush=True)

    base = rows[0][1]
    best = min(rows, key=lambda r: r[1])
    print(f"# batch {batch}; best = {best[0]} "
          f"({base - best[1]:+.2f} us/frame vs base; all variants "
          f"verified bit-identical)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
