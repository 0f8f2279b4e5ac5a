"""Cross-framework oracle tests: Engine (JAX) vs torch_ref (PyTorch).

Two independent runtimes executing the same IR must agree on the f32
path — the reference's own verification methodology
(``mgk-decompiler/scripts/mgk_to_pytorch.py`` rebuilds extractions in
PyTorch and compares). Run on the REAL bundled model plus zoo builds
covering the op vocabulary.
"""

import os

import numpy as np
import pytest

from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.runtime import Engine
from thingino_accel_tpu.testing.torch_ref import run_torch

REF_V5N = "/root/reference/models/yolov5n.mars"


def _compare(graph, x, atol=2e-3, rtol=2e-3):
    eng = Engine(graph)
    got = eng.run_np(x)
    want = run_torch(graph, {graph.inputs[0]: x})
    assert set(got) == set(want)
    for k in got:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], atol=atol, rtol=rtol,
            err_msg=k)


def test_tiny_f32_matches_torch():
    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(32, 32)),
                       in_hw=(32, 32))
    x = np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32)
    _compare(g, x)


def test_yolov5n_zoo_matches_torch():
    """Full CSP/C3/SPPF/FPN topology (SILU, concat, maxpool, upsample,
    residual adds) agrees across the two runtimes."""
    g = zoo.build_yolov5(
        "n", zoo.ZooConfig(dtype="float32", in_hw=(64, 64)))
    x = np.random.default_rng(1).normal(
        size=(1, 64, 64, 3)).astype(np.float32)
    _compare(g, x)


def test_nanodet_zoo_matches_torch():
    """Depthwise-separable path (DEPTHWISE_CONV2D + LEAKY_RELU)."""
    g = zoo.build_nanodet(
        zoo.ZooConfig(dtype="float32", in_hw=(64, 64)))
    x = np.random.default_rng(2).normal(
        size=(1, 64, 64, 3)).astype(np.float32)
    _compare(g, x)


@pytest.mark.skipif(not os.path.exists(REF_V5N),
                    reason="reference model not available")
def test_real_yolov5n_matches_torch():
    """REAL bundled weights through both runtimes (detect-conv heads;
    sigmoid/mul decode subgraph included up to those outputs)."""
    from thingino_accel_tpu.formats.mars import read_mars
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.models import yolo
    g = from_mars(read_mars(REF_V5N))
    det = yolo.find_detect_outputs(g)
    g = g.with_outputs(det)
    x = (np.random.default_rng(3).random(
        (1, 640, 640, 3)) - 0.5).astype(np.float32)
    _compare(g, x, atol=5e-3, rtol=5e-3)
