#!/usr/bin/env python3
"""Bisect bench's FEED pipeline for the execute-time INVALID_ARGUMENT.

cliff_bisect.py proved the conv graph is innocent: the full rewritten
graph passes via ``Engine.run_np`` at the exact (model, rewrite, batch)
configs where ``bench.build_pipeline`` fails. The delta between those
two paths is the feed pipeline, made of four independent elements:

  ingest   batch-minor custom-layout ``jax.device_put`` (runtime/ingest.py)
  s2d      stem_space_to_depth rewrite + 2x2-block frame packing
  pre      letterbox_uint8 + quantize_input_int8 inside the jit
  post     decode_and_parse + nms_batched inside the jit

This ladder toggles them one at a time (via the TAT_BENCH_INGEST /
TAT_BENCH_S2D / TAT_BENCH_PRE / TAT_BENCH_POST diagnostic knobs in
bench.py) on a failing config, each rung in a fresh subprocess — a
failed program can leave the device returning INVALID_ARGUMENT to
subsequent BIG programs (examples/wedge_probe.py), so after any failure
the device is probe-waited with a b128 conv before the next rung.

Known-failing configs (2026-08-19 drains):
  a: yolov5s  fast  TAT_FPN_SPLIT=1  b128   (b<=124 passes)
  b: yolov5m  fast  plain            b96
  c: yolov5s  serving                b112
  d: yolov5n_cal_int8.mars  fast  TAT_FPN_SPLIT=1  b112

Usage:
  python examples/feed_bisect.py [--config a|b|c|d] [--rungs N1,N2,..]
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONFIGS = {
    "a": {"TAT_BENCH_BATCH": "128", "TAT_FPN_SPLIT": "1"},
    "b": {"TAT_BENCH_BATCH": "96", "TAT_BENCH_MODEL": "m"},
    "c": {"TAT_BENCH_BATCH": "112", "TAT_BENCH_TIER": "serving"},
    "d": {"TAT_BENCH_BATCH": "112", "TAT_FPN_SPLIT": "1",
          "TAT_BENCH_MARS": os.path.join(
              ROOT, "models", "yolov5n_cal_int8.mars")},
}

# rung name -> diagnostic-knob overrides (on top of the config).
# "base" strips everything optional; each later rung adds ONE element
# back; "full" is exactly what bench runs.
RUNGS = [
    ("base", {"TAT_BENCH_INGEST": "plain", "TAT_BENCH_S2D": "0",
              "TAT_BENCH_PRE": "0", "TAT_BENCH_POST": "none"}),
    ("+pre", {"TAT_BENCH_INGEST": "plain", "TAT_BENCH_S2D": "0",
              "TAT_BENCH_POST": "none"}),
    ("+post", {"TAT_BENCH_INGEST": "plain", "TAT_BENCH_S2D": "0"}),
    ("+ingest", {"TAT_BENCH_S2D": "0"}),
    ("+s2d", {"TAT_BENCH_INGEST": "plain"}),
    ("full", {}),
]

PROBE_BODY = """
import sys
sys.path.insert(0, {root!r})
import jax
from bench import build_pipeline
import os
batch = int(os.environ["TAT_BENCH_BATCH"])
size = os.environ.get("TAT_BENCH_MODEL", "s")
pipeline, frames = build_pipeline(batch, size)
out = pipeline(frames)
jax.block_until_ready(out)
print("rung ok")
"""

# a tiny probe PASSES on a wedged device; a b128 conv is the smallest
# program class observed to detect the wedge (examples/wedge_probe.py)
WEDGE_PROBE = (
    "import jax, jax.numpy as jnp\n"
    "x = jnp.ones((128, 80, 80, 128), jnp.bfloat16)\n"
    "w = jnp.ones((3, 3, 128, 128), jnp.bfloat16)\n"
    "y = jax.jit(lambda x, w: jax.lax.conv_general_dilated(\n"
    "    x, w, (1, 1), 'SAME',\n"
    "    dimension_numbers=('NHWC', 'HWIO', 'NHWC')))(x, w)\n"
    "jax.block_until_ready(y)\n")


def wait_device_ok(budget_s: float = 600.0) -> bool:
    deadline = time.monotonic() + budget_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", WEDGE_PROBE],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        time.sleep(15.0)


def run_rung(cfg_env: dict, rung_env: dict, timeout: float = 900.0):
    env = dict(os.environ)
    env.update(cfg_env)
    env.update(rung_env)
    try:
        p = subprocess.run(
            [sys.executable, "-c", PROBE_BODY.format(root=ROOT)],
            cwd=ROOT, env=env, capture_output=True, text=True,
            timeout=timeout)
    except subprocess.TimeoutExpired:
        return False, "timeout"
    tail = (p.stdout + p.stderr).strip().splitlines()
    return p.returncode == 0, (tail[-1] if tail else "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="a", choices=sorted(CONFIGS))
    ap.add_argument("--rungs", default="",
                    help="comma-separated rung names (default: all)")
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    wanted = [r.strip() for r in args.rungs.split(",") if r.strip()]
    rungs = [(n, e) for n, e in RUNGS if not wanted or n in wanted]
    print(f"config {args.config}: {cfg}", flush=True)
    for name, extra in rungs:
        ok, detail = run_rung(cfg, extra)
        print(f"  {name:<8} {'PASS' if ok else 'FAIL'}  {detail}",
              flush=True)
        if not ok:
            if not wait_device_ok():
                print("  device did not recover; stopping", flush=True)
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
