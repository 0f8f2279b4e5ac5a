"""Ingest-layout API: frames placed in the batch-minor device layout
are value-identical to plain placement, and the AUTO query returns the
compiled program's preferred input format (runtime/ingest.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from thingino_accel_tpu.runtime import (
    auto_ingest_format, batch_minor_format, ingest)


def test_ingest_preserves_values():
    frames = np.random.default_rng(0).integers(
        0, 256, (4, 16, 16, 3), dtype=np.uint8)
    dev = ingest(frames)
    np.testing.assert_array_equal(np.asarray(dev), frames)


def test_ingest_feeds_jit_identically():
    frames = np.random.default_rng(1).integers(
        0, 256, (4, 8, 8, 3), dtype=np.uint8)

    @jax.jit
    def f(x):
        return jnp.sum(x.astype(jnp.int32) - 128, axis=(1, 2, 3))

    plain = np.asarray(f(jnp.asarray(frames)))
    laid = np.asarray(f(ingest(frames)))
    np.testing.assert_array_equal(plain, laid)


def test_batch_minor_format_shape():
    fmt = batch_minor_format(4)
    assert fmt.layout.major_to_minor == (1, 2, 3, 0)


def test_auto_ingest_format_query():
    def f(x):
        return x.astype(jnp.float32) * 2.0

    x = np.zeros((2, 4, 4, 3), np.float32)
    fmt = auto_ingest_format(f, x)
    # a concrete format with a concrete layout comes back
    assert fmt.layout is not None
    assert len(fmt.layout.major_to_minor) == 4
