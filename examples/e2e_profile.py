#!/usr/bin/env python3
"""Profile the full bench pipeline (letterbox + backbone + decode + NMS)
and print the device-op breakdown grouped by category."""

import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    bench._enable_compile_cache()
    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))
    pipeline, frames = bench.build_pipeline(batch, "s")
    out = pipeline(frames)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(10):
        out = pipeline(frames)
    jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / 10
    print(f"wall: {wall * 1e6 / batch:.1f} us/frame "
          f"({batch / wall:,.0f} fps)")

    logdir = "/tmp/tat_e2e_profile"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    out = pipeline(frames)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    evs = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    by_pid = {}
    for e in evs:
        by_pid.setdefault(e["pid"], []).append(e)
    dev = min(by_pid, key=lambda p: min(e.get("dur", 1e12)
                                        for e in by_pid[p]))
    cats = {}
    rows = {}
    prog = 0.0
    for e in by_pid[dev]:
        n, d = e.get("name", "?"), e.get("dur", 0)
        if n.startswith("jit_"):
            prog = max(prog, d)
            continue
        cats.setdefault(re.sub(r"[.\d]+$", "", n), [0.0, 0])
        cats[re.sub(r"[.\d]+$", "", n)][0] += d
        cats[re.sub(r"[.\d]+$", "", n)][1] += 1
        rows[n] = rows.get(n, 0.0) + d
    print(f"program: {prog / batch:.1f} us/frame")
    print("== by category (us/frame, count) ==")
    for c, (d, k) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if d / batch < 0.5:
            continue
        print(f"  {d / batch:8.1f}  x{k:<4} {c}")
    print("== top ops ==")
    for n, d in sorted(rows.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {d / batch:8.1f}  {n[:70]}")


if __name__ == "__main__":
    main()
