#!/usr/bin/env python3
"""Round-4 drain, session B: protocol validation + cliff bisect + sweeps.

Follow-up to examples/hw_queue.py (same per-row subprocess isolation and
device-recovery probing). Rows, in dependency order:

1. fence-ab       whole-model repeat-dispatch vs scan-chained protocol
                  (validates every BENCH_LKG number)
2. mxu-ceiling    re-run with the FIXED scan-chained protocol (the
                  first run's numbers were void — docs/KERNELS.md)
3. c3-block-ab    re-run with the fixed protocol
4. v5n-profile    device-op breakdown of the real-weight yolov5n row
                  (where do its 120 us/frame go — the 10k question)
5. split-b116/120/124   fpn-split batch fine-tune under the b>=128
                  cliff (split-b112 measured 4,405.8, the current best)
6. v5m-b112/b96   yolov5m below the cliff (plain v5m fails at b128)
7. cliff-bisect   localize the INVALID_ARGUMENT to an op (v5n+split
                  b112 config; wedge-prone -> LAST)

Usage: python examples/hw_queue_r4b.py [filter] | [--from NAME]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "examples"))

import hw_queue

hw_queue.ROWS = [
    ("fence-ab", [sys.executable, "examples/bench_fence_ab.py"], {}),
    ("mxu-ceiling-fixed",
     [sys.executable, "examples/mxu_ceiling_probe.py"], {}),
    ("c3-block-ab-fixed", [sys.executable, "examples/c3_block_ab.py"], {}),
    ("v5n-profile", [sys.executable, "examples/e2e_profile.py"],
     {"TAT_BENCH_MARS": os.path.join(ROOT, "models/yolov5n_cal_int8.mars")}),
    ("split-b116", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "116"}),
    ("split-b120", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "120"}),
    ("split-b124", [sys.executable, "bench.py"],
     {"TAT_FPN_SPLIT": "1", "TAT_BENCH_BATCH": "124"}),
    ("v5m-b112", [sys.executable, "bench.py"],
     {"TAT_BENCH_MODEL": "m", "TAT_BENCH_BATCH": "112"}),
    ("v5m-b96", [sys.executable, "bench.py"],
     {"TAT_BENCH_MODEL": "m", "TAT_BENCH_BATCH": "96"}),
    # re-run: died in session A on a sys.path bug (examples/ scripts
    # don't get the repo root on the path; fixed in serve_bench.py)
    ("serve-sustained", [sys.executable, "examples/serve_bench.py"], {}),
    # wedge-prone rows last (serving fails+wedges at its default b128;
    # b112 gives the parity tier its ladder number)
    ("serving-b112", [sys.executable, "bench.py"],
     {"TAT_BENCH_TIER": "serving", "TAT_BENCH_BATCH": "112"}),
    # the bisect intentionally runs failing programs
    # (~10 probes x compile+recovery -> generous timeout)
    ("cliff-bisect", [sys.executable, "examples/cliff_bisect.py"], {}, 7200),
]

if __name__ == "__main__":
    sys.exit(hw_queue.main())
