#!/usr/bin/env python3
"""One-shot hardware measurement queue (run when the TPU tunnel is up).

Runs each pending measurement in a SEPARATE subprocess (the tunnel
wedges a process after an unsupported-op error) and prints a summary
table. Each row is a whole-model fenced-loop bench — the only timing
protocol that is trustworthy through the relay (docs/KERNELS.md).

    python examples/hw_queue.py            # all rows
    python examples/hw_queue.py headline   # name-filter
    python examples/hw_queue.py --from X   # resume: skip rows before X
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, argv, extra env)
#
# Round-4 drain notes (2026-08-19, first tunnel-up session):
# - headline (4,386.7 fps, MFU .366) and mars-real-yolov5n (8,357.9)
#   measured and persisted to BENCH_LKG.json; dropped from the queue.
# - TAT_FPN_SPLIT=1 yolov5s fails at exactly b>=128 with an opaque
#   execute-time INVALID_ARGUMENT (b<=112 runs; compiled memory
#   analysis is identical to the passing headline: 1.33 GiB, 44 MiB
#   code) — the split A/B therefore runs at b112 against a b112
#   headline control.
# - a failed serving row left the device returning INVALID_ARGUMENT to
#   every subsequent program until the queue process stopped: rows now
#   probe-and-wait after any failure, and the wedge-prone serving/
#   split-heads rows run LAST.
ROWS = [
    # ALL rewrite rows at b112: merge AND split each fail at b>=128
    # (fresh-compiled plain headline at b128 passes — verified with the
    # cache redirected — so the cliff is specific to rewritten graphs,
    # not to fresh compiles). b112 controls make the A/B fair.
    ("headline-b112", [sys.executable, "bench.py"],
     {"TAT_BENCH_BATCH": "112"}),
    ("merge-b112", [sys.executable, "bench.py"],
     {"TAT_CONV_MERGE": "1", "TAT_BENCH_BATCH": "112"}),
    ("fpn-split-b112", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "112"}),
    ("merge-fpn-b112", [sys.executable, "bench.py"],
     {"TAT_CONV_MERGE": "1", "TAT_FPN_SPLIT": "1",
      "TAT_BENCH_BATCH": "112"}),
    ("fpn-split-all-b112", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "all", "TAT_BENCH_BATCH": "112"}),
    ("mars-b112",
     [sys.executable, "bench.py"],
     {"TAT_BENCH_BATCH": "112",
      "TAT_BENCH_MARS": os.path.join(ROOT, "models/yolov5n_cal_int8.mars")}),
    ("merge-mars-b112",
     [sys.executable, "bench.py"],
     {"TAT_CONV_MERGE": "1", "TAT_BENCH_BATCH": "112",
      "TAT_BENCH_MARS": os.path.join(ROOT, "models/yolov5n_cal_int8.mars")}),
    ("fpn-split-mars-b112",
     [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "112",
      "TAT_BENCH_MARS": os.path.join(ROOT, "models/yolov5n_cal_int8.mars")}),
    ("merge-fpn-mars-b112",
     [sys.executable, "bench.py"],
     {"TAT_CONV_MERGE": "1", "TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "112",
      "TAT_BENCH_MARS": os.path.join(ROOT, "models/yolov5n_cal_int8.mars")}),
    # roofline falsification (VERDICT r3 item 3): chained VMEM-resident
    # dot issue-rate ceiling, int8 vs bf16 vs XLA — decides whether a
    # C3 megakernel can beat the bf16 fast tier at all
    ("mxu-ceiling", [sys.executable, "examples/mxu_ceiling_probe.py"], {}),
    # isolated C3 block: XLA bf16 vs fused pallas int8 chains (the
    # megakernel A/B at the shapes the fast tier spends conv time on)
    ("c3-block-ab", [sys.executable, "examples/c3_block_ab.py"], {}),
    # NMS/decode tail in isolation: exact suppression variants
    ("post-tail", [sys.executable, "examples/postproc_tail_experiment.py"],
     {}),
    # model-size scaling: yolov5m through the same pipeline (the zoo's
    # largest variant; fps should track the 3x MAC ratio vs v5s if the
    # tier stays roofline-bound)
    ("yolov5m", [sys.executable, "bench.py"], {"TAT_BENCH_MODEL": "m"}),
    # plain-graph batch sweep (also a diagnostic: if plain graphs fail
    # at b256/384 the cliff is size-based, not rewrite-specific)
    ("headline-b256", [sys.executable, "bench.py"],
     {"TAT_BENCH_BATCH": "256"}),
    ("headline-b384", [sys.executable, "bench.py"],
     {"TAT_BENCH_BATCH": "384"}),
    ("mars-b256",
     [sys.executable, "bench.py"],
     {"TAT_BENCH_BATCH": "256",
      "TAT_BENCH_MARS": os.path.join(ROOT, "models/yolov5n_cal_int8.mars")}),
    # audio modality: AEC real-time factor on the decompiled .mgk
    # (real weights): one-scan streaming + vmap multi-stream
    ("aec-rtf", [sys.executable, "examples/aec_bench.py"], {}),
    # ACCURACY.md v4: multi-scene eval (3 distinct sources) on the
    # device path, serving tier included (needs TPU), merge/FPN-split
    # row included
    ("accuracy-report",
     [sys.executable, "examples/accuracy_report.py"], {}),
    # sustained serving: host->device ingest overlapped with compute
    # (depth 1 vs 2/3 through StreamServer; the depth ratio is the
    # framework claim, the absolute may be tunnel-H2D-bound)
    ("serve-sustained", [sys.executable, "examples/serve_bench.py"], {}),
    # --- wedge-prone rows last (see drain notes above) ---
    ("serving-base", [sys.executable, "bench.py"],
     {"TAT_BENCH_TIER": "serving"}),
    ("serving-stem-nogrow", [sys.executable, "bench.py"],
     {"TAT_BENCH_TIER": "serving", "TAT_STEM_NOGROW": "1"}),
    ("split-heads", [sys.executable, "examples/split_heads_experiment.py"],
     {}),
]


def _wait_device_ok(budget_s: float = 300.0) -> bool:
    """Probe the device with a LARGE op in a fresh subprocess until it
    answers (a failed program can leave the tunnel returning
    INVALID_ARGUMENT to subsequent programs for a while — observed
    2026-08-19).  A tiny ``ones((2,2)).sum()`` probe PASSES while big
    programs still fail (session-B fence-ab was fed a wedged device
    that way), so the probe is a b128 conv — the smallest program
    class seen to hit the wedge (examples/wedge_probe.py)."""
    import time
    probe = (
        "import jax, jax.numpy as jnp\n"
        "x = jnp.ones((128, 80, 80, 128), jnp.bfloat16)\n"
        "w = jnp.ones((3, 3, 128, 128), jnp.bfloat16)\n"
        "y = jax.jit(lambda x, w: jax.lax.conv_general_dilated(\n"
        "    x, w, (1, 1), 'SAME',\n"
        "    dimension_numbers=('NHWC', 'HWIO', 'NHWC')))(x, w)\n"
        "jax.block_until_ready(y)\n")
    deadline = time.monotonic() + budget_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=240)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        time.sleep(10.0)


def main() -> int:
    pat, start_at = "", ""
    args = sys.argv[1:]
    if args and args[0] == "--from":
        start_at = args[1]
        args = args[2:]
    if args:
        pat = args[0]
    results = []
    started = not start_at
    for row in ROWS:
        name, argv, extra = row[:3]
        row_timeout = row[3] if len(row) > 3 else 2400
        if not started:
            if name == start_at:
                started = True
            else:
                continue
        if pat and pat not in name:
            continue
        env = dict(os.environ, **extra)
        # the queue only starts once a probe confirmed the tunnel is
        # up; if it dies mid-queue, fail each remaining row fast
        # instead of burning bench.py's full wait budget per row (the
        # LKG fallback keeps rows honest either way)
        env.setdefault("TAT_BENCH_WAIT", "120")
        # secondary real-weight row only meaningful on the headline
        # bench; skip it for sweep rows to keep queue wall-time down
        if name != "headline":
            env.setdefault("TAT_BENCH_SECOND", "0")
        print(f"=== {name} ({extra or 'defaults'}) ===", flush=True)
        try:
            p = subprocess.run(argv, cwd=ROOT, env=env, text=True,
                               capture_output=True, timeout=row_timeout)
            rc, out = p.returncode, (p.stdout + p.stderr).strip()
        except subprocess.TimeoutExpired as e:
            # one wedged row must not abort the queue (per-row blast
            # radius is the whole point of the subprocess isolation)
            rc = 124
            part = e.stdout.decode("utf-8", "replace") if e.stdout else ""
            out = (part + f"\n[row timed out after {row_timeout}s]").strip()
        print(out[-2000:], flush=True)
        results.append((name, rc, out.splitlines()[-1] if out else ""))
        failed = rc != 0 or '"value": 0.0' in out
        if failed and not _wait_device_ok():
            print("[device did not recover within 300s; continuing]",
                  flush=True)
    print("\n=== summary ===")
    for name, rc, last in results:
        print(f"{name:24} rc={rc}  {last}")
    return max((rc for _, rc, _ in results), default=0)


if __name__ == "__main__":
    sys.exit(main())
