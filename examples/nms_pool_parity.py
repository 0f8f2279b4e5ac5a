"""NMS suppression-pool parity proof on real scenes.

The bench's greedy NMS suppresses over the top-POOL above-threshold
candidates (nms_fixed ``pre_nms``; the reference suppresses over all N,
/root/reference/src/mars/mars_yolo_test.c:107-130 — O(N^2) on 25,200
candidates, affordable at its scale, not at ours). A smaller pool is
only a semantics change if a frame actually carries more than POOL
candidates above threshold. This script PROVES the pool choice on the
accuracy eval's real imagery: it runs the real-weight yolov5n fast-tier
pipeline at pools {100, 128, 256, 512} over the same frame set used by
examples/accuracy_report.py (all four sources + augments + mosaics) and
reports, per pool pair and conf threshold, whether the emitted
detection sets are identical.

Usage: python examples/nms_pool_parity.py [--n 48] [--conf 0.25 0.10]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.accuracy_report import (  # noqa: E402
    SRC_IMGS, _augments, _letterbox_np)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48, help="frames total")
    ap.add_argument("--conf", type=float, nargs="+", default=[0.25, 0.10])
    ap.add_argument("--pools", type=int, nargs="+",
                    default=[100, 128, 256, 512])
    args = ap.parse_args()

    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax
    from thingino_accel_tpu.models import yolo
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    from PIL import Image
    sources = {}
    for sname, path in SRC_IMGS.items():
        if not os.path.exists(path):
            print(f"# source {sname} missing; skipped")
            continue
        sources[sname] = np.asarray(Image.open(path).convert("RGB"))
    per = max(2, args.n // max(1, len(sources)))
    frames = []
    for si, (sname, img) in enumerate(sources.items()):
        for f in _augments(img, per, seed=1000 + si, mosaics=True):
            frames.append(_letterbox_np(f))
    frames = np.stack(frames)                    # [N, 640, 640, 3] u8
    print(f"# {frames.shape[0]} frames from {len(sources)} sources")

    eng = Engine.from_mars(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "models", "yolov5n_cal_int8.mars"),
        EngineOptions(precision="fast", quantize_outputs=False))
    in_name = eng.graph.inputs[0]
    out_names = list(eng.graph.outputs)

    def run(pool, conf):
        @jax.jit
        def f(x):
            q = yolo.quantize_input_int8(x, dtype=jax.numpy.bfloat16)
            feats = eng._fn(eng.params, {in_name: q})
            heads = [feats[k] for k in out_names]
            b, s, c = yolo.decode_and_parse(heads)
            return yolo.nms_batched(b, s, c, max_dets=100, pre_nms=pool,
                                    conf_thresh=conf)
        d = f(frames)
        return (np.asarray(d.boxes), np.asarray(d.scores),
                np.asarray(d.classes), np.asarray(d.valid))

    all_ok = True
    for conf in args.conf:
        dets = {p: run(p, conf) for p in args.pools}
        base = args.pools[-1]                    # deepest pool = truth
        # candidate pressure: how close any frame comes to pool limits
        nvalid = dets[base][3].sum(axis=1)
        print(f"conf {conf}: max survivors/frame {int(nvalid.max())} "
              f"(mean {nvalid.mean():.1f})")
        def det_set(d, fi):
            """Valid detections of frame fi as a sorted row array —
            pool<=max_dets outputs skip the final compaction top_k, so
            valid rows sit at different POSITIONS; compare as sets."""
            boxes, scores, classes, valid = d
            m = valid[fi]
            rows = np.concatenate(
                [boxes[fi][m], scores[fi][m, None],
                 classes[fi][m, None].astype(np.float32)], axis=-1)
            return rows[np.lexsort(rows.T[::-1])]

        for p in args.pools[:-1]:
            same = all(
                np.array_equal(det_set(dets[p], fi), det_set(dets[base], fi))
                for fi in range(frames.shape[0]))
            print(f"  pool {p:4d} vs {base}: "
                  f"{'IDENTICAL' if same else 'DIFFERS'}")
            all_ok = all_ok and same
    print("POOL PARITY:", "PROVEN on this eval set" if all_ok
          else "NOT proven — keep pool 256")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
