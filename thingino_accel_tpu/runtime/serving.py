"""Batched multi-stream serving.

The reference serves one camera stream on one chip, synchronously
(``mars_run`` per frame). TPU serving is throughput-oriented: many
streams batched into one jitted program, with host->device transfer of
batch N+1 overlapped with device compute of batch N (JAX dispatch is
async — the double-buffering the reference hand-builds with NNDMA
descriptor chains falls out of the runtime for free).
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional

import jax
import numpy as np


@dataclasses.dataclass
class ServingStats:
    """Throughput/latency accounting (the TPU analog of mars_model_t's
    inference_us/inference_count stats, include/mars_runtime.h:64-66)."""

    frames: int = 0
    batches: int = 0
    errors: int = 0
    wall_s: float = 0.0
    # bounded ring (newest 4096 batches): a long-running server must
    # not grow stats memory or percentile cost without bound
    batch_latencies_s: "collections.deque" = dataclasses.field(
        default_factory=lambda: collections.deque(maxlen=4096))

    @property
    def fps(self) -> float:
        return self.frames / self.wall_s if self.wall_s else 0.0

    def latency_ms(self, pct: float = 50.0) -> float:
        if not self.batch_latencies_s:
            return 0.0
        return float(np.percentile(
            np.asarray(self.batch_latencies_s), pct) * 1e3)

    def summary(self) -> str:
        return (f"{self.frames} frames in {self.wall_s:.3f}s = "
                f"{self.fps:.1f} fps; batch latency p50 "
                f"{self.latency_ms(50):.2f} ms / p99 "
                f"{self.latency_ms(99):.2f} ms")


_FAILED = object()   # dispatch-failed batch sentinel (slot preserved)


class InferenceTimeout(RuntimeError):
    """A drained batch did not materialize within ``timeout_s`` — the
    backend is presumed wedged and the server marks itself unhealthy
    (``StreamServer.healthy``). Analog of the reference's DMA wait
    timeouts (``src/nna_dma.c:224``)."""


class StreamServer:
    """Pipelined batch server around any jitted ``fn(batch) -> pytree``.

    ``depth`` controls how many batches may be in flight: with depth=2 the
    host enqueues batch N+1 (H2D + dispatch) while the device crunches
    batch N — classic double-buffering.
    """

    def __init__(self, fn: Callable[[jax.Array], Any], depth: int = 2,
                 ingest_format: Any = None,
                 timeout_s: Optional[float] = None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self.fn = fn
        self.depth = depth
        # device layout for the H2D frame transfer (runtime/ingest.py):
        # batch-minor placement deletes the in-graph relayout copy at
        # the stem (+6% e2e measured, v5e b128). Pass
        # ingest.batch_minor_format() (or an auto_ingest_format query).
        self.ingest_format = ingest_format
        # drain watchdog: a wedged backend (observed with the tunneled
        # device after an unsupported-op error) hangs
        # block_until_ready forever. With a timeout the server raises
        # InferenceTimeout instead and marks itself unhealthy — the
        # reference's explicit DMA wait timeouts play the same role
        # (/root/reference/src/nna_dma.c:224).
        self.timeout_s = timeout_s
        self.wedged = False
        self.stats = ServingStats()

    # seam for the watchdog (and tests): materialize one result pytree
    _materialize = staticmethod(jax.block_until_ready)

    @property
    def healthy(self) -> bool:
        return not self.wedged

    def run(self, batches: Iterable[np.ndarray]) -> Iterator[Any]:
        """Feed batches through the pipeline, yielding device results in
        order. Results are yielded as (still-async) jax pytrees; call
        ``jax.block_until_ready``/np.asarray to materialize."""
        inflight: collections.deque = collections.deque()
        self._t_start = time.perf_counter()
        self._wall_base = self.stats.wall_s
        for batch in batches:
            t0 = time.perf_counter()
            try:
                x = jax.device_put(batch, self.ingest_format) \
                    if self.ingest_format is not None \
                    else jax.device_put(batch)
                out = self.fn(x)
            except Exception:
                # dispatch-side failure: keep the slot so outputs stay
                # 1:1 with submitted batches (consumers route results
                # positionally) — surfaced as None like drain failures
                out = _FAILED
            inflight.append((out, t0, len(batch)))
            if len(inflight) >= self.depth:
                yield self._drain_one(inflight)
        while inflight:
            yield self._drain_one(inflight)

    def _drain_one(self, inflight) -> Any:
        """Materialize the oldest in-flight batch. A failed batch (bad
        input, device error) is isolated: counted in ``stats.errors`` and
        surfaced as None instead of killing the stream — the serving-side
        fault containment the reference implements as SIGBUS handlers and
        hardened shims (SURVEY §5 failure detection)."""
        out, t0, n = inflight.popleft()
        if out is _FAILED:
            self.stats.errors += 1
            self.stats.batches += 1
            return None
        if self.wedged:
            self.stats.errors += 1
            self.stats.batches += 1
            return None
        try:
            if self.timeout_s is not None:
                import concurrent.futures
                # the hung materialization thread cannot be cancelled
                # (daemon; leaks only if genuinely wedged, in which
                # case the process is done serving anyway)
                ex = concurrent.futures.ThreadPoolExecutor(
                    1, thread_name_prefix="tat-drain")
                fut = ex.submit(self._materialize, out)
                ex.shutdown(wait=False)
                try:
                    out = fut.result(timeout=self.timeout_s)
                except concurrent.futures.TimeoutError:
                    self.wedged = True
                    self.stats.errors += 1
                    self.stats.batches += 1
                    raise InferenceTimeout(
                        f"batch not ready after {self.timeout_s}s; "
                        "backend presumed wedged — server marked "
                        "unhealthy") from None
            else:
                out = self._materialize(out)
        except InferenceTimeout:
            raise
        except Exception:
            self.stats.errors += 1
            self.stats.batches += 1
            return None
        now = time.perf_counter()
        self.stats.batch_latencies_s.append(now - t0)
        self.stats.frames += n
        self.stats.batches += 1
        # keep wall_s live per drained batch (not only after a full run)
        # so fps is meaningful for partially-consumed streams too
        self.stats.wall_s = self._wall_base + (now - self._t_start)
        return out


class MultiStreamBatcher:
    """Interleave frames from S independent streams into fixed batches.

    Row sources are recorded per batch in ``self.sources`` (a FIFO of
    per-batch lists of ORIGINAL stream indices, -1 for padding rows):
    StreamServer yields results in submission order, so the consumer
    pops ``sources.popleft()`` per drained result to route rows back to
    their cameras — stable across stream exhaustion and pipeline depth.
    This is the multi-camera serving layout (one engine, S feeds) that
    the reference's one-process-per-model design cannot express
    (SURVEY §2.7).
    """

    def __init__(self, num_streams: int, batch: int):
        self.num_streams = num_streams
        self.batch = batch
        self.sources: collections.deque = collections.deque()

    def batches(self, streams: List[Iterator[np.ndarray]]
                ) -> Iterator[np.ndarray]:
        s = 0
        live = list(enumerate(streams))   # (original index, iterator)
        while live:
            rows = []
            srcs = []
            while len(rows) < self.batch and live:
                idx = s % len(live)
                orig, it = live[idx]
                try:
                    rows.append(next(it))
                    srcs.append(orig)
                    s += 1
                except StopIteration:
                    live.pop(idx)
            if not rows:
                return
            while len(rows) < self.batch:   # pad tail batch (static shape)
                rows.append(np.zeros_like(rows[0]))
                srcs.append(-1)
            self.sources.append(srcs)
            yield np.stack(rows)


def serve_file_model(
    model_path: str,
    batches: Iterable[np.ndarray],
    depth: int = 2,
) -> ServingStats:
    """Convenience: serve raw input batches through a `.mars` model and
    return throughput stats."""
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime.engine import Engine

    eng = Engine.from_mars(model_path)
    in_name = eng.graph.inputs[0]
    body, params = eng._fn, eng.params
    fn = jax.jit(lambda x: body(params, {in_name: x}))
    server = StreamServer(fn, depth=depth)
    for _ in server.run(batches):
        pass
    return server.stats
