#!/usr/bin/env python3
"""Backbone-only tier comparison at serving batch.

Protocol: fenced loop over distinct device buffers (validated against
the profiler's device-op sum by examples/protocol_check.py — wall ==
device program time within ~5%; the round-2 chained-scan protocol is
5x pessimistic on whole models because scan serializes the schedule).

Usage: python examples/tier_bench.py [batch] [tiers...]
   env TAT_TIER_PROFILE=1  also dump a per-op profiler breakdown
"""

import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loop_us_per_frame(fn, xs, batch, iters=20):
    import jax
    for x in xs:
        jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(xs[i % len(xs)])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / batch * 1e6


def profile_breakdown(fn, x, batch, top=14):
    import jax
    logdir = "/tmp/tat_tier_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    jax.block_until_ready(fn(x))
    jax.profiler.stop_trace()
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    evs = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    # device ops: pick the pid whose max single event is largest (the
    # whole-program event) and report its children by name
    by_pid = {}
    for e in evs:
        by_pid.setdefault(e["pid"], []).append(e)
    dev = min(by_pid, key=lambda p: min(e.get("dur", 1e12)
                                        for e in by_pid[p]))
    names = {}
    prog = 0.0
    for e in by_pid[dev]:
        d = e.get("dur", 0)
        n = e.get("name", "?")
        if n.startswith("jit_"):
            prog = max(prog, d)
            continue
        names[n] = names.get(n, 0.0) + d
    print(f"    program {prog / batch:7.1f} us/frame; op sum "
          f"{sum(names.values()) / batch:7.1f}; top ops:")
    for n, d in sorted(names.items(), key=lambda kv: -kv[1])[:top]:
        print(f"      {d / batch:7.1f} us/frame  {n[:70]}")


def main():
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tiers = sys.argv[2:] or ["fast", "serving"]

    cfg = zoo.ZooConfig(dtype="int8", in_hw=(640, 640))
    graph = zoo.build_yolov5("s", cfg)
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.integers(-128, 128, (batch, 640, 640, 3),
                                   dtype=np.int8)) for _ in range(4)]

    for tier in tiers:
        opts = (EngineOptions(precision="fast", accum_dtype=jnp.bfloat16)
                if tier == "fast" else EngineOptions(precision=tier))
        eng = Engine(graph, opts)
        in_name = eng.graph.inputs[0]
        out_name = eng.graph.outputs[0]
        body, params = eng._fn, eng.params

        @jax.jit
        def fwd(x, body=body, params=params, in_name=in_name,
                out_name=out_name):
            return body(params, {in_name: x})[out_name]

        us = loop_us_per_frame(fwd, xs, batch)
        print(f"{tier:>8}: {us:8.1f} us/frame backbone "
              f"({1e6 / us:,.0f} fps-equiv)")
        if os.environ.get("TAT_TIER_PROFILE") == "1":
            profile_breakdown(fwd, xs[0], batch)


if __name__ == "__main__":
    main()
