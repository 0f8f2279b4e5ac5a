"""NMS suppression-pool semantics (docs/DIVERGENCES.md item 9).

The pool only changes emitted detections when a frame carries more
above-threshold candidates than the pool — codified here synthetically
(the real-scene proof is examples/nms_pool_parity.py, TPU-run). The
reference suppresses over all N (mars_yolo_test.c:107-130); nms_fixed's
pool is the static-shape TPU analog.
"""
import numpy as np
import jax.numpy as jnp

from thingino_accel_tpu.models.yolo import nms_fixed


def _det_set(d):
    m = np.asarray(d.valid)
    rows = np.concatenate(
        [np.asarray(d.boxes)[m], np.asarray(d.scores)[m, None],
         np.asarray(d.classes)[m, None].astype(np.float32)], axis=-1)
    return rows[np.lexsort(rows.T[::-1])]


def _candidates(n_above, n_total=2000, seed=0):
    """n_above well-separated above-threshold boxes + sub-threshold noise."""
    rng = np.random.default_rng(seed)
    boxes = np.zeros((n_total, 4), np.float32)
    scores = rng.uniform(0.01, 0.2, n_total).astype(np.float32)
    classes = rng.integers(0, 4, n_total).astype(np.int32)
    # grid of disjoint boxes so suppression never chains past the pool
    for i in range(n_above):
        gx, gy = i % 40, i // 40
        boxes[i] = (40.0 * gx + 16, 40.0 * gy + 16, 20.0, 20.0)
        scores[i] = 0.3 + 0.6 * rng.random()
    boxes[n_above:] = (5000.0, 5000.0, 4.0, 4.0)
    return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes)


def test_pool_invariant_when_candidates_fit():
    b, s, c = _candidates(n_above=60)
    d128 = nms_fixed(b, s, c, pre_nms=128, max_dets=100)
    d512 = nms_fixed(b, s, c, pre_nms=512, max_dets=100)
    assert np.array_equal(_det_set(d128), _det_set(d512))
    assert int(np.asarray(d128.valid).sum()) == 60


def test_pool_truncates_when_candidates_exceed():
    # 200 above-threshold disjoint boxes: pool 128 can emit at most 100
    # of the top-128, pool 512 sees all 200 and emits the top-100 —
    # sets still equal HERE (both keep the global top-100 by score,
    # disjoint boxes suppress nothing)...
    b, s, c = _candidates(n_above=200, seed=1)
    d128 = nms_fixed(b, s, c, pre_nms=128, max_dets=100)
    d512 = nms_fixed(b, s, c, pre_nms=512, max_dets=100)
    assert np.array_equal(_det_set(d128), _det_set(d512))
    # ...but when high-scored boxes suppress each other, survivors can
    # rank below the pool cut: build 150 coincident boxes (one survives)
    # above 120 disjoint lower-scored ones — pool 128 loses the tail of
    # the disjoint set, pool 512 keeps it
    rng = np.random.default_rng(2)
    n = 150 + 120
    boxes = np.zeros((n, 4), np.float32)
    scores = np.zeros(n, np.float32)
    classes = np.zeros(n, np.int32)
    boxes[:150] = (100.0, 100.0, 50.0, 50.0)         # coincident stack
    scores[:150] = np.linspace(0.9, 0.8, 150)
    for i in range(120):
        boxes[150 + i] = (40.0 * (i % 30) + 16, 40.0 * (i // 30) + 516,
                          20.0, 20.0)
        scores[150 + i] = 0.5 - 0.001 * i
    d128 = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(classes), pre_nms=128, max_dets=100)
    d512 = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.asarray(classes), pre_nms=512, max_dets=100)
    n128 = int(np.asarray(d128.valid).sum())
    n512 = int(np.asarray(d512.valid).sum())
    assert n512 == 100       # 1 survivor of the stack + 99 disjoint
    assert n128 < n512       # pool exhaustion loses real detections
