"""Golden-transcript smoke tests on committed fixtures.

The reference validates bring-up against a golden output transcript
(``QUICKSTART.md:44-89``: numbered init/alloc/run steps with expected
values). The TPU analog: committed `.mars` fixtures with frozen
checksums of their outputs under the exact engine — any semantic drift
in the format parser, importer, or integer executor trips these.
"""

import hashlib
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "models",
                        "fixtures")


def _sha(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def test_fixture_files_committed():
    for name in ("tiny_160_f32.mars", "tiny_160_int8.mars",
                 "test_conv.mars"):
        assert os.path.exists(os.path.join(FIXTURES, name)), name


def test_golden_single_conv():
    """Deterministic single-conv fixture: frozen output checksum."""
    from thingino_accel_tpu.runtime import Engine
    eng = Engine.from_mars(os.path.join(FIXTURES, "test_conv.mars"))
    rng = np.random.default_rng(0)
    x = rng.integers(-128, 128, (1, 64, 64, 3), dtype=np.int8)
    out = list(eng.run_np(x).values())[0]
    assert out.dtype == np.int8
    # frozen at fixture-creation time; int8 integer path is bit-stable
    assert _sha(x) == \
        "6fc343ea6844fcf4cac014214f006051aae3ed724309086570dd7b6cf24c07cc"
    assert _sha(out) == \
        "549b7ea2b5540c0775c2f4e52587c259b7c8b301e5dab762ae92ec60ff15ad70"


def test_golden_tiny_int8():
    """3-conv int8 fixture through the exact engine: frozen checksum."""
    from thingino_accel_tpu.runtime import Engine
    eng = Engine.from_mars(os.path.join(FIXTURES, "tiny_160_int8.mars"))
    rng = np.random.default_rng(1)
    x = rng.integers(-128, 128, (1, 160, 160, 3), dtype=np.int8)
    out = list(eng.run_np(x).values())[0]
    assert out.shape[-3:] == (154, 154, 64)
    assert _sha(out) == \
        "80b6cfe9e1c3c0b5d07596a29f0c68f010acaf60962a06a5d0e7639eaff1a060"


def test_golden_tiny_f32_stats():
    """f32 fixture: frozen summary statistics (f32 isn't bit-stable
    across compiler versions; mean/std to 1e-4 is the transcript)."""
    from thingino_accel_tpu.runtime import Engine
    eng = Engine.from_mars(os.path.join(FIXTURES, "tiny_160_f32.mars"))
    rng = np.random.default_rng(2)
    x = rng.normal(scale=0.5, size=(1, 160, 160, 3)).astype(np.float32)
    out = list(eng.run_np(x).values())[0]
    assert out.shape[-3:] == (154, 154, 64)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(
        [float(np.abs(out).mean())], [ABS_MEAN_GOLDEN], rtol=1e-3)


ABS_MEAN_GOLDEN = 0.2043040245771408
