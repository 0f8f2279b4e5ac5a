#!/usr/bin/env python3
"""Dump the optimized HLO of the bench pipeline and print the shapes/
layouts of the expensive non-fusion ops (copies, converts) so relayout
sources can be attributed to graph positions."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    bench._enable_compile_cache()
    batch = int(os.environ.get("TAT_BENCH_BATCH", "128"))
    pipeline, frames = bench.build_pipeline(batch, "s")
    compiled = pipeline.lower(frames).compile()
    txt = compiled.as_text()
    pat = os.environ.get("TAT_HLO_PAT", r"copy|convert|transpose|bitcast")
    want = re.compile(r"^\s*(\S+) = \S+ (" + pat + r")[.\d]*\(")
    for line in txt.splitlines():
        m = want.match(line)
        if m:
            print(line.strip()[:240])
    out = os.environ.get("TAT_HLO_OUT")
    if out:
        with open(out, "w") as f:
            f.write(txt)
        print(f"# full HLO -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
