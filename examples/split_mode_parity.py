"""Detection-set parity across TAT_FPN_SPLIT modes on real scenes.

The split rewrite reassociates the f32 channel accumulation of each
1x1-over-concat conv (``ir/passes.split_concat_convs``), so its unit
bound is ≤2 int8 quanta per activation (tests/test_fpn_split.py). This
script asks the question that actually gates a default flip — do the
EMITTED DETECTIONS change on real imagery? It runs the real-weight
yolov5n fast-tier pipeline under split modes {off, upsample, wide} over
the accuracy eval's frame set and set-compares detections per frame at
conf 0.25 and 0.10, mirroring the NMS pool-parity proof
(``examples/nms_pool_parity.py``; reference semantics anchor: the
concat executor the rewrite bypasses, ``src/mars/mars_runtime.c:963``).

Usage: python examples/split_mode_parity.py [--n 48] [--conf 0.25 0.10]
       [--modes "" 1 wide] [--iou 0.02]

Exact set equality across differently-rounded pipelines is not the
right bar (a 1-quantum head difference can move a box edge by 1e-3 px);
the gate is: same detection COUNT per frame, same classes, every box
within ``--iou`` of its counterpart, scores within 1e-2.
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
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--conf", type=float, nargs="+", default=[0.25, 0.10])
    ap.add_argument("--modes", nargs="+", default=["", "1", "wide"])
    ap.add_argument("--iou", type=float, default=0.02,
                    help="max box drift as 1-IoU vs the baseline mode")
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
    frames = np.stack(frames)
    print(f"# {frames.shape[0]} frames from {len(sources)} sources")

    mars = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "models", "yolov5n_cal_int8.mars")

    def build(mode):
        eng = Engine.from_mars(
            mars, EngineOptions(precision="fast", quantize_outputs=False,
                                fpn_split=mode))
        in_name = eng.graph.inputs[0]
        out_names = list(eng.graph.outputs)

        def run(conf):
            @jax.jit
            def f(x):
                q = yolo.quantize_input_int8(x, dtype=jax.numpy.bfloat16)
                feats = eng._fn(eng.params, {in_name: q})
                heads = [feats[k] for k in out_names]
                b, s, c = yolo.decode_and_parse(heads)
                return yolo.nms_batched(b, s, c, max_dets=100,
                                        pre_nms=128, conf_thresh=conf)
            d = f(frames)
            return (np.asarray(d.boxes), np.asarray(d.scores),
                    np.asarray(d.classes), np.asarray(d.valid))
        return run

    def rows(d, fi):
        boxes, scores, classes, valid = d
        m = valid[fi]
        r = np.concatenate([boxes[fi][m], scores[fi][m, None],
                            classes[fi][m, None].astype(np.float32)],
                           axis=-1)
        return r[np.lexsort(r.T[::-1])]

    def iou_1(a, b):
        ix1, iy1 = np.maximum(a[0], b[0]), np.maximum(a[1], b[1])
        ix2, iy2 = np.minimum(a[2], b[2]), np.minimum(a[3], b[3])
        inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 1.0

    runners = {m: build(m) for m in args.modes}
    base_mode = args.modes[0]
    all_ok = True
    for conf in args.conf:
        dets = {m: runners[m](conf) for m in args.modes}
        nvalid = dets[base_mode][3].sum(axis=1)
        print(f"conf {conf}: detections/frame mean {nvalid.mean():.1f} "
              f"max {int(nvalid.max())}")
        for m in args.modes[1:]:
            worst_drift, mism = 0.0, 0
            for fi in range(frames.shape[0]):
                ra, rb = rows(dets[base_mode], fi), rows(dets[m], fi)
                if len(ra) != len(rb) or (len(ra) and not np.array_equal(
                        ra[:, 5], rb[:, 5])):
                    mism += 1
                    continue
                for i in range(len(ra)):
                    worst_drift = max(worst_drift,
                                      1.0 - iou_1(ra[i, :4], rb[i, :4]))
                    if abs(ra[i, 4] - rb[i, 4]) > 1e-2:
                        mism += 1
                        break
            ok = mism == 0 and worst_drift <= args.iou
            print(f"  mode {m!r:9s} vs {base_mode!r}: "
                  f"{'MATCH' if ok else 'DIFFERS'} "
                  f"(set/count/class mismatches {mism}, "
                  f"worst box drift 1-IoU {worst_drift:.4f})")
            all_ok = all_ok and ok
    print("SPLIT-MODE PARITY:", "PROVEN on this eval set" if all_ok
          else "NOT proven")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
