#!/usr/bin/env python3
"""Bisect the b>=128 / rewritten-graph INVALID_ARGUMENT cliff to an op.

Observed (2026-08-19 drain sessions, docs/KERNELS.md "round-4 A/B"):
every REWRITTEN graph (conv-merge, fpn-split, serving pallas) fails at
execute time with an opaque ``INVALID_ARGUMENT: TPU backend error`` at
b>=128, while the plain graphs pass; real-weight yolov5n + fpn-split
fails even at b112. Compile-time memory analysis of a failing config is
identical to the passing control, so the failure is in the execute path
— this script localizes it.

Protocol: run growing PREFIXES of the failing (model, rewrite, batch)
config — ``Engine.from_mars(..., outputs=[node_k.out])`` truncates the
graph, XLA dead-code-eliminates the rest, and the rewrite pass (applied
after truncation) covers exactly the prefix's patterns — and binary
search the first node index whose prefix fails. Each probe runs in a
fresh subprocess (a failed program can wedge the tunnel); after any
failure the device is probe-waited before the next measurement so a
wedge cannot masquerade as a string of failing prefixes.

Outcomes and what they mean:
  - clean boundary at node k: the cliff is op-local; dump that node and
    its rewritten neighborhood.
  - even tiny prefixes fail: program-level (arg marshalling, donation),
    not an op.
  - full graph passes here but bench fails: the trigger is in bench's
    feed pipeline (s2d ingest / postproc), not the conv graph.

Usage:
  python examples/cliff_bisect.py [--mars PATH] [--batch 112]
                                  [--split 1|all] [--merge] [--tier fast]
  python examples/cliff_bisect.py --probe NAME ...   (internal, subprocess)
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_MARS = os.path.join(ROOT, "models/yolov5n_cal_int8.mars")


def node_output_names(mars_path):
    """Topo-ordered candidate cut points (pre-rewrite graph)."""
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.ir.graph import from_mars
    g = from_mars(M.read_mars(mars_path))
    names = []
    for n in g.nodes:
        if n.outputs:
            names.append(n.outputs[0])
    return names


def probe_cmd(args, out_name):
    cmd = [sys.executable, os.path.abspath(__file__), "--probe", out_name,
           "--mars", args.mars, "--batch", str(args.batch),
           "--tier", args.tier]
    if args.split:
        cmd += ["--split", args.split]
    if args.merge:
        cmd += ["--merge"]
    return cmd


def run_probe(args, out_name, timeout=900):
    """Returns (ok: bool, detail: str)."""
    try:
        p = subprocess.run(probe_cmd(args, out_name), cwd=ROOT,
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False, "timeout"
    tail = (p.stdout + p.stderr).strip().splitlines()
    return p.returncode == 0, (tail[-1] if tail else "")


def wait_device_ok(budget_s=300.0):
    probe = ("import jax, jax.numpy as jnp; "
             "jnp.ones((2, 2)).sum().block_until_ready()")
    deadline = time.monotonic() + budget_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=150)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            return False
        time.sleep(10.0)


def do_probe(args):
    """Subprocess body: build the truncated engine, run one batch."""
    import numpy as np
    from thingino_accel_tpu.runtime.engine import Engine, EngineOptions
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    opts = EngineOptions(
        precision=args.tier,
        conv_merge=bool(args.merge),
        fpn_split=args.split or "",
    )
    outputs = None if args.probe == "__full__" else [args.probe]
    eng = Engine.from_mars(args.mars, opts, outputs=outputs)
    x = np.zeros((args.batch, 640, 640, 3), dtype=np.int8)
    out = eng.run_np(x)
    shapes = {k: v.shape for k, v in out.items()}
    print(f"probe ok: {args.probe} -> {shapes}")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mars", default=DEFAULT_MARS)
    ap.add_argument("--batch", type=int, default=112)
    ap.add_argument("--split", default="1")
    ap.add_argument("--merge", action="store_true")
    ap.add_argument("--tier", default="fast")
    ap.add_argument("--probe", default="")
    args = ap.parse_args()
    if args.probe:
        return do_probe(args)

    names = node_output_names(args.mars)
    n = len(names)
    print(f"{n} cut points in {os.path.basename(args.mars)}; "
          f"config: batch={args.batch} split={args.split!r} "
          f"merge={args.merge} tier={args.tier}", flush=True)

    # sanity anchors: full graph must FAIL, first node must PASS
    ok_full, d = run_probe(args, "__full__")
    print(f"full graph: {'PASS' if ok_full else 'FAIL'}  {d}", flush=True)
    if ok_full:
        print("full graph passes via run_np -> the trigger is in bench's "
              "feed pipeline (s2d ingest / postproc), not the conv graph")
        return 0
    wait_device_ok()
    ok0, d = run_probe(args, names[0])
    print(f"prefix[0] ({names[0]}): {'PASS' if ok0 else 'FAIL'}  {d}",
          flush=True)
    if not ok0:
        if not wait_device_ok():
            print("device did not recover; aborting")
            return 1
        # re-probe once: distinguish wedge-carryover from a real failure
        ok0, d = run_probe(args, names[0])
        print(f"prefix[0] retry: {'PASS' if ok0 else 'FAIL'}  {d}",
              flush=True)
        if not ok0:
            print("even the 1-node prefix fails -> program-level "
                  "(marshalling/donation), not an op")
            return 0

    lo, hi = 0, n - 1          # names[lo] passes; full fails
    # invariant target: find smallest k with prefix fail; full-graph
    # failure stands in for prefix[n-1] until proven otherwise
    while hi - lo > 1:
        mid = (lo + hi) // 2
        ok, d = run_probe(args, names[mid])
        print(f"prefix[{mid}] ({names[mid]}): "
              f"{'PASS' if ok else 'FAIL'}  {d}", flush=True)
        if ok:
            lo = mid
        else:
            if not wait_device_ok():
                print("device did not recover; aborting")
                return 1
            # confirm it is a real failure, not wedge carryover
            ok2, d2 = run_probe(args, names[mid])
            print(f"prefix[{mid}] retry: {'PASS' if ok2 else 'FAIL'}  {d2}",
                  flush=True)
            if ok2:
                lo = mid
            else:
                hi = mid
                wait_device_ok()
    print(f"\nboundary: prefix[{lo}] ({names[lo]}) PASSES, "
          f"prefix[{hi}] ({names[hi]}) FAILS", flush=True)
    # dump the boundary node's neighborhood from the rewritten graph
    from thingino_accel_tpu.formats import mars as M
    from thingino_accel_tpu.ir.graph import from_mars
    from thingino_accel_tpu.ir import passes as P
    g = from_mars(M.read_mars(args.mars))
    g = P.dequantize_graph(g)
    if args.merge:
        P.merge_sibling_convs(g)
    if args.split:
        P.split_concat_convs(
            g, mode="all" if args.split == "all" else "upsample")
    tgt = {names[lo], names[hi]}
    for node in g.nodes:
        if tgt & (set(node.inputs) | set(node.outputs)):
            print(f"  {node!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
