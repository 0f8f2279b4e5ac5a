#!/usr/bin/env python3
"""Sweep XLA compiler options on the real-weight v5n bench row.

The one compiler-side lever never swept (round-3 notes tried only
``xla_tpu_scoped_vmem_limit_kib``): XLA-TPU exposes scheduling/fusion
options that can only reach the tunneled remote compiler via
``compiler_options`` (bench.py TAT_XLA_OPTS). Two stages:

1. PROBE: compile a tiny program once per candidate option in a single
   subprocess — unknown flags raise cleanly at compile time, so this
   prices out which options this libtpu build understands without
   burning full bench runs.
2. MEASURE: for each supported candidate, run the full bench row
   (default: the real-v5n 10k-push config) in a subprocess with
   TAT_XLA_OPTS set, and print a ladder vs the control.

    python examples/xla_opts_sweep.py            # probe + measure
    python examples/xla_opts_sweep.py --probe    # probe only
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARS_V5N = os.path.join(ROOT, "models/yolov5n_cal_int8.mars")

# candidate compiler options: scheduling, fusion, and memory knobs that
# plausibly move a fusion-bound single-chip inference program. Values
# chosen to FLIP the expected default.
CANDIDATES = [
    "xla_tpu_enable_latency_hiding_scheduler=true",
    "xla_tpu_enable_experimental_exhaustive_output_fusion=true",
    "xla_tpu_rwb_fusion=false",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions=true",
    "xla_tpu_nested_dot_fusion=true",
    "xla_tpu_dot_dot_fusion=true",
    "xla_tpu_enable_aggressive_loop_fusion_layout_opt=true",
    "xla_tpu_scavenge_vmem_for_fusions=true",
    "xla_tpu_vector_load_fusion_window=2048",
    "xla_tpu_vector_store_fusion_window=1024",
    "xla_tpu_enable_dot_strength_reduction=false",
    "xla_tpu_licm_size_inflation_ratio=2",
    "xla_tpu_copy_fusion_pad_unpad_ratio=0",
    "xla_tpu_async_copy_bandwidth_scaling_factor=1.5",
    "xla_tpu_memory_bound_loop_optimizer_options=enabled:true",
]

PROBE_SRC = r"""
import json, sys
import jax, jax.numpy as jnp
ok, bad = [], []
for opt in sys.argv[1:]:
    k, v = opt.split("=", 1)
    try:
        f = jax.jit(lambda x: (x * 2).sum(), compiler_options={k: v})
        f(jnp.ones((128, 128))).block_until_ready()
        ok.append(opt)
    except Exception as e:
        bad.append([opt, str(e).splitlines()[0][:120]])
print(json.dumps({"ok": ok, "bad": bad}))
"""


def probe(cands):
    r = subprocess.run([sys.executable, "-c", PROBE_SRC] + cands,
                       capture_output=True, text=True, timeout=1200,
                       cwd=ROOT)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    if not line:
        print(r.stdout, r.stderr, sep="\n---\n")
        sys.exit("probe subprocess produced no JSON")
    return json.loads(line)


def bench_row(opts: str, extra_env: dict) -> float:
    env = dict(os.environ, TAT_BENCH_SECOND="0", **extra_env)
    if opts:
        env["TAT_XLA_OPTS"] = opts
    r = subprocess.run([sys.executable, "bench.py"], cwd=ROOT,
                       capture_output=True, text=True, timeout=1800,
                       env=env)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if r.returncode != 0 or not lines:
        print(f"  !! bench failed: {r.stderr.strip().splitlines()[-3:]}")
        return 0.0
    rec = json.loads(lines[-1])
    return 0.0 if rec.get("stale") else float(rec["value"])


def main():
    res = probe(CANDIDATES)
    print("supported options:")
    for o in res["ok"]:
        print(f"  {o}")
    print("rejected options:")
    for o, err in res["bad"]:
        print(f"  {o}  ({err})")
    if "--probe" in sys.argv:
        return

    # v5n 10k-push config (bench secondary-row defaults)
    env = {"TAT_BENCH_MARS": MARS_V5N, "TAT_S2D_DEEP": "1",
           "TAT_FPN_SPLIT": "wide"}
    control = bench_row("", env)
    print(f"control: {control:,.1f} fps")
    rows = []
    for opt in res["ok"]:
        fps = bench_row(opt, env)
        d = (fps / control - 1) * 100 if control else 0.0
        rows.append((opt, fps, d))
        print(f"{opt:62s} {fps:>9,.1f} fps  {d:+.1f}%")
    rows.sort(key=lambda r: -r[1])
    print("\nladder:")
    for opt, fps, d in rows:
        print(f"  {fps:>9,.1f}  {d:+5.1f}%  {opt}")


if __name__ == "__main__":
    main()
