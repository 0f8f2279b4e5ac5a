"""Serving pipeline tests: double-buffered stream server and the
multi-stream batcher."""

import numpy as np
import jax
import jax.numpy as jnp

from thingino_accel_tpu.runtime.serving import (
    MultiStreamBatcher, ServingStats, StreamServer,
)


def test_stream_server_order_and_stats():
    calls = []

    @jax.jit
    def fn(x):
        return x * 2.0

    server = StreamServer(fn, depth=2)
    batches = [np.full((4, 8), i, np.float32) for i in range(7)]
    outs = [np.asarray(o) for o in server.run(iter(batches))]
    assert len(outs) == 7
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, batches[i] * 2.0)
    assert server.stats.frames == 28
    assert server.stats.batches == 7
    assert server.stats.fps > 0
    assert "fps" in server.stats.summary()


def test_stream_server_depth1():
    server = StreamServer(jax.jit(lambda x: x + 1), depth=1)
    outs = list(server.run(iter([np.zeros((2, 2), np.float32)])))
    assert len(outs) == 1


def test_multi_stream_batcher_interleaves():
    streams = [iter([np.full((3,), s * 10 + i, np.float32)
                     for i in range(4)]) for s in range(3)]
    b = MultiStreamBatcher(num_streams=3, batch=4)
    batches = list(b.batches(streams))
    total = sum(len(x) for x in batches)
    assert total % 4 == 0
    # all 12 real frames present across batches
    seen = sorted({float(row[0]) for batch in batches for row in batch
                   if row.any() or float(row[0]) == 0.0})
    # stream 0 frame 0 is value 0 (looks like padding); just count rows
    assert len(batches) == 3


def test_serving_engine_with_zoo_model():
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine

    g = zoo.build_tiny(zoo.ZooConfig(dtype="int8", in_hw=(32, 32)),
                       in_hw=(32, 32))
    eng = Engine(g)
    in_name = g.inputs[0]
    body, params = eng._fn, eng.params
    fn = jax.jit(lambda x: body(params, {in_name: x}))
    server = StreamServer(fn, depth=2)
    rng = np.random.default_rng(0)
    batches = [rng.integers(-128, 128, (8, 32, 32, 3), dtype=np.int8)
               for _ in range(5)]
    outs = list(server.run(iter(batches)))
    assert len(outs) == 5
    assert server.stats.frames == 40


def test_stream_server_isolates_bad_batch():
    """A malformed batch doesn't kill the stream (SURVEY §5 failure
    containment, serving-side)."""
    fn = jax.jit(lambda x: x @ jnp.ones((8, 4), jnp.float32))
    server = StreamServer(fn, depth=1)
    batches = [np.ones((2, 8), np.float32),
               np.ones((2, 5), np.float32),     # wrong shape -> error
               np.ones((2, 8), np.float32)]
    outs = [o for o in server.run(iter(batches))]
    good = [o for o in outs if o is not None]
    assert len(good) == 2
    assert server.stats.errors == 1
    assert server.stats.frames == 4


def test_stream_server_isolates_materialization_failure():
    """Failure injection at the DRAIN side (_drain_one): a batch whose
    device buffer dies between dispatch and materialization (the async
    analog of a device fault mid-flight) is isolated — None surfaced,
    errors counted, the stream keeps serving (SURVEY §5 recovery)."""
    base = jax.jit(lambda x: x * 2)
    calls = {"n": 0}

    def fn(x):
        out = base(x)
        calls["n"] += 1
        if calls["n"] == 2:
            out.delete()       # block_until_ready will raise
        return out

    server = StreamServer(fn, depth=2)
    batches = [np.full((2, 8), i, np.float32) for i in range(4)]
    outs = list(server.run(iter(batches)))
    good = [o for o in outs if o is not None]
    assert len(outs) == 4 and len(good) == 3
    assert server.stats.errors == 1
    assert server.stats.frames == 6          # 3 good batches x 2
    np.testing.assert_array_equal(np.asarray(good[-1]), batches[3] * 2)


def test_multistream_batcher_stable_sources():
    """Row sources are ORIGINAL stream ids, stable across stream
    exhaustion, recorded per batch in a FIFO; padding rows are -1."""
    from thingino_accel_tpu.runtime.serving import MultiStreamBatcher

    def stream(tag, n):
        for i in range(n):
            yield np.full((2, 2), tag * 10 + i, np.int32)

    mb = MultiStreamBatcher(num_streams=3, batch=3)
    batches = list(mb.batches([stream(0, 1), stream(1, 3), stream(2, 3)]))
    srcs = list(mb.sources)
    assert len(batches) == len(srcs)
    flat_src = [s for b in srcs for s in b]
    flat_val = [int(r[0, 0]) for b in batches for r in b]
    for sid, val in zip(flat_src, flat_val):
        if sid >= 0:
            assert val // 10 == sid, (sid, val)   # routed to right camera
        else:
            assert val == 0                       # padding rows
    # every real frame delivered exactly once
    real = sorted(v for s, v in zip(flat_src, flat_val) if s >= 0)
    assert real == [0, 10, 11, 12, 20, 21, 22]


def test_stream_server_watchdog_timeout(monkeypatch):
    import pytest
    """A wedged backend (block_until_ready that never returns) must
    surface as InferenceTimeout + healthy=False instead of hanging the
    server forever — the reference's DMA-wait-timeout role
    (nna_dma.c:224)."""
    import time as _time
    import numpy as np
    from thingino_accel_tpu.runtime.serving import (
        InferenceTimeout, StreamServer,
    )

    srv = StreamServer(lambda x: x, depth=1, timeout_s=0.2)
    srv._materialize = lambda out: _time.sleep(5.0)   # instance seam
    batches = [np.zeros((2, 4), np.float32)]
    with pytest.raises(InferenceTimeout):
        list(srv.run(iter(batches)))
    assert not srv.healthy
    assert srv.stats.errors == 1

    # a healthy server with the watchdog armed passes results through
    srv2 = StreamServer(lambda x: x, depth=1, timeout_s=5.0)
    outs = list(srv2.run(iter([np.ones((2, 4), np.float32)])))
    assert srv2.healthy and len(outs) == 1
    np.testing.assert_array_equal(np.asarray(outs[0]),
                                  np.ones((2, 4), np.float32))
