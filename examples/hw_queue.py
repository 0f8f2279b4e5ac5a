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
# Queue 3 (2026-08-19, post-feed-bisect): examples/feed_bisect.py ran
# the EXACT previously-failing config (v5s split b128) through all six
# feed-element rungs — every rung PASSED, including the full bench
# pipeline. The "b>=128 rewrite cliff" was therefore never
# program-specific: the old probe-and-wait used a tiny ones((2,2))
# probe, which PASSES on a wedged device while big programs still fail
# (examples/wedge_probe.py), so whole stretches of queue rows ran
# against a wedged device and "failed reproducibly". Every cliff row
# is re-queued below under the big-conv probe.
MARS_V5N = os.path.join(ROOT, "models/yolov5n_cal_int8.mars")
# Queue 4 (2026-08-19): the 'cliff' was POISONED COMPILE-CACHE entries
# (executables serialized during device-wedge periods fail at execute
# with INVALID_ARGUMENT forever; bench.py now retries with a fresh
# cache). The poisoned .jax_cache was replaced; every casualty row
# re-runs below, plus the megakernel pricing probe and a fresh
# default-config headline (fpn-split is the default since today).
ROWS = [
    # driver-default config: now fpn-split b128 (expect ~4,515 +
    # real-v5n secondary row in the same JSON line)
    ("headline-default", [sys.executable, "bench.py"], {}),
    # real-weight v5n + split (the 10k-north-star row; never measured
    # un-wedged). If split hurts v5n, bench's secondary row config
    # gets revisited.
    ("mars-split-b128", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "128",
      "TAT_BENCH_MARS": MARS_V5N}),
    ("mars-plain-b128", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "", "TAT_BENCH_BATCH": "128",
      "TAT_BENCH_MARS": MARS_V5N}),
    # model-size scaling rows (poisoned-cache casualties)
    ("v5m-b96", [sys.executable, "bench.py"],
     {"TAT_BENCH_MODEL": "m", "TAT_BENCH_BATCH": "96",
      "TAT_BENCH_SECOND": "0"}),
    ("v5m-b112", [sys.executable, "bench.py"],
     {"TAT_BENCH_MODEL": "m", "TAT_BENCH_BATCH": "112",
      "TAT_BENCH_SECOND": "0"}),
    # megakernel pricing: epilogue + 3x3-tap costs at ceiling
    # conditions (decides whether the C3 megakernel gets built)
    ("megakernel-probe", [sys.executable, "examples/megakernel_probe.py"],
     {}),
    # whole-model fenced-loop protocol validation on TPU (CPU ratio
    # was 0.95; this closes the headline-protocol question)
    ("fence-ab", [sys.executable, "examples/bench_fence_ab.py"], {}),
    # where does the real-v5n frame time go (MFU only .19)
    ("v5n-profile", [sys.executable, "examples/e2e_profile.py"],
     {"TAT_BENCH_MARS": MARS_V5N}),
    # sustained serving through StreamServer (host H2D overlapped)
    ("serve-sustained", [sys.executable, "examples/serve_bench.py"], {}),
    # --- wedge-prone rows last ---
    ("serving-b112", [sys.executable, "bench.py"],
     {"TAT_BENCH_TIER": "serving", "TAT_BENCH_BATCH": "112",
      "TAT_BENCH_SECOND": "0"}),
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
        if not name.startswith("headline"):
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
