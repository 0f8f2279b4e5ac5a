"""Central configuration registry.

The reference's config surface is compile-time macros (USE_MXU), env
vars (VENUS_AIP_SMOKE), and CLI flags (SURVEY §5). Here everything is
runtime: EngineOptions for per-engine knobs, and this env registry for
process-level defaults. All variables are prefixed ``TAT_``.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, tuple] = {}


def _register(name: str, default: Any, parse: Callable[[str], Any],
              doc: str) -> None:
    _REGISTRY[name] = (default, parse, doc)


def get(name: str) -> Any:
    default, parse, _ = _REGISTRY[name]
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return parse(raw)
    except (TypeError, ValueError):
        return default


def describe() -> str:
    lines = ["thingino-accel-tpu environment configuration:"]
    for name, (default, _, doc) in sorted(_REGISTRY.items()):
        cur = get(name)
        mark = "*" if cur != default else " "
        lines.append(f" {mark} {name:<22} = {cur!r:<12} {doc}")
    return "\n".join(lines)


_bool = lambda s: s.strip().lower() not in (
    "0", "false", "no", "off", "")

_register("TAT_CONV_BACKEND", "xla", str,
          "int8 conv backend: xla | pallas (the USE_MXU analog)")
_register("TAT_BENCH_BATCH", 0, int, "bench.py batch override")
_register("TAT_BENCH_ITERS", 10, int, "bench.py timed iterations")
_register("TAT_BENCH_WAIT", 1800, int,
          "bench.py: seconds to wait for the TPU tunnel to answer "
          "before giving up (it goes UNAVAILABLE for stretches; "
          "0 = no wait)")
_register("TAT_BENCH_MODEL", "s", str, "bench.py yolov5 size letter")
_register("TAT_BENCH_EXACT", False, _bool,
          "bench the exact int8 tier instead of fast bf16")
_register("TAT_TPU_TESTS", False, _bool,
          "let the test suite target real TPU hardware")
_register("TAT_LOG", "warn", str, "log level: debug|info|warn|error")
_register("TAT_FAST_SILU", False, _bool,
          "serving tier: rational fast-sigmoid SiLU epilogue "
          "(|silu err| < 6e-3); default off — Mosaic's exp sigmoid "
          "measured faster on v5e")
_register("TAT_SILU_TANH", False, _bool,
          "fast tier: tanh-form sigmoid in f32/bf16 SiLU "
          "(no divide in the conv+SiLU fusion)")
_register("TAT_SERVING_COMPUTE", "int8", str,
          "serving-tier MXU compute dtype: int8 (exact int32 MACs) | "
          "bf16 (int8 HBM I/O, in-VMEM cast, f32 accumulation — "
          "exact while K*K*C <= 1024)")
_register("TAT_CONV_MERGE", False, _bool,
          "fast tier: merge sibling convs over the same input into one "
          "wider conv + SPLIT (exact; doubles MXU lane utilization on "
          "the C3 cv1/cv2 pairs)")
_register("TAT_FPN_SPLIT", "wide", str,
          "fast tier: split 1x1 convs over channel concats into "
          "per-part dots (upsampled parts computed at low res, the "
          "broadcast fuses into the add). '1' = upsample-concats only "
          "(FPN nodes); 'wide' = those plus concats with every part "
          ">= 128 channels (SPPF/PAN, lane-aligned splits); 'all' = "
          "every 1x1-over-concat (measured -4.7%); '' = off. "
          "DEFAULT 'wide' since 2026-08-20: v5s 4,855.1 vs 4,804.0 "
          "fps (chain=4 b128) and real-v5n deep 9,646.8 vs 9,620.7; "
          "detection-set parity across ''/'1'/'wide' PROVEN on real "
          "scenes at conf 0.25/0.10 (examples/split_mode_parity.py; "
          "≤2-quanta unit bound, tests/test_fpn_split.py)")
_register("TAT_STEM_NOGROW", False, _bool,
          "serving tier: limit the XLA stem stage to the thin-channel "
          "seed convs (cin < 16); the convs it would grow into run on "
          "the folded pallas path instead, so the stage-exit f32 "
          "accumulator read+quantize happens once, on the stem output")
_register("TAT_S2D_DEEP", False, _bool,
          "bench/serving graphs: extend the s2d ingest fold one stage "
          "deeper (stem emits 2x2 space-to-depth layout; the 3x3 s2 "
          "downsample becomes 2x2 s1 at 4x contraction width). "
          "Measured v5e b128: real-v5n 8,443 fps (best row, +1.8% "
          "over plain); v5s slightly negative — bench.py's secondary "
          "real-v5n row pins it ON regardless of the main config")
_register("TAT_HEAD_SEM", False, _bool,
          "permute detect-head channels semantic-major/anchor-minor "
          "(ir/passes.semantic_detect_heads) and decode with "
          "contiguous slices — removes the lane-splitting (A,85) "
          "reshape relayout copies (~15 us/frame v5n@640 b128). "
          "Measured NET-NEGATIVE on v5e b128 (v5n 7,566 vs 8,443; "
          "v5s 4,088 vs 4,422): the A-wide slice decode re-introduces "
          "more relayout than the copies it deletes — kept as a "
          "documented negative (docs/KERNELS.md round-5)")
_register("TAT_HEAD_MM", False, _bool,
          "decode heads without the lane-splitting (A,85) reshape: "
          "narrow 5-wide slices for box/obj + one masked variadic "
          "(max,argmax) reduce per anchor over the NATIVE head layout "
          "(yolo.decode_and_parse_mm) — no graph rewrite, bit-identical "
          "outputs; targets the full-head relayout copies")
_register("TAT_QBF16_EXIT", False, _bool,
          "serving tier: bf16 stem-stage exits consumed in-kernel; "
          "default off (measured net-negative on v5e)")
