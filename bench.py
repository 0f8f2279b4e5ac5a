"""Headline benchmark: YOLOv5s-int8 @640 end-to-end frames/sec on one chip.

Metric per BASELINE.json: e2e including preprocessing (letterbox +
quantize) and postprocessing (anchor decode + class-aware NMS), all on
device in one jitted program. Baseline (north star): 10,000 fps.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Env knobs:
  TAT_BENCH_BATCH   batch size (default 128)
  TAT_BENCH_ITERS   timed iterations per measurement (default 30)
  TAT_BENCH_MODEL   yolov5 size letter (default "s")
  TAT_BENCH_TIER    "fast" (default) | "serving" | "exact"
  TAT_BENCH_EXACT   1 = alias for TAT_BENCH_TIER=exact
  TAT_BENCH_F32ACC  1 = f32 conv accumulation (default bf16)
  TAT_BENCH_MARS    path to a real .mars model to run through the same
                    pipeline (e.g. models/yolov5n_cal_int8.mars)
  TAT_BENCH_S2D     fixed-camera space-to-depth ingest: stem rewritten
                    6x6s2c3 -> 3x3s1c12, frames fed in 2x2-block order
                    (ir/passes.stem_space_to_depth; +2.2%,
                    bit-identical detections). Default 1 — the bench's
                    feed is a pre-sized fixed-camera batch either way,
                    and the host writes the same bytes once in either
                    order; 0 = row-major NHWC ingest (4,265 vs 4,382
                    fps measured).
  TAT_BENCH_WAIT    seconds to wait for the TPU tunnel to answer before
                    measuring (default 1200; it goes UNAVAILABLE for
                    multi-hour stretches). If the budget expires (or the
                    measurement itself fails), the last-known-good
                    result from BENCH_LKG.json is emitted with
                    ``"stale": true`` and its original timestamp — a
                    silent rc=124 or a 0.0 are both worse than an
                    honestly-labelled cached number. 0 disables waiting.
  TAT_BENCH_CHAIN   N distinct microbatches per device program (default
                    4 when run as a script; measure() alone defaults 1).
                    Honest serving semantics — N*batch frames in,
                    N*batch detection sets out — that amortizes the
                    per-dispatch gap through the tunneled runtime.
                    Ladder (KERNELS.md round-5): v5n 9,094 (1) ->
                    9,433 (2) -> 9,620.7 (4) -> 9,497/9,595 (6/8);
                    v5s 4,712.8 (1) -> 4,804.0 (4) -> 4,728.6 (8).
  TAT_BENCH_CHAIN_MODE  "inline" (default; N jit args, ingest layouts
                    preserved) | "scan" (lax.scan; one body compile but
                    the stacked feed drops the ingest layout: -2..-4%,
                    kept as the documented negative)
  TAT_CONV_MERGE    fast tier: merge sibling convs (see utils/config.py)
  TAT_FPN_SPLIT     fast tier: split 1x1-over-concat convs; upsampled
                    parts run at low resolution. DEFAULT "wide"
                    (utils/config.py): upsample-concats plus concats
                    whose every part is >= 128 channels (SPPF/PAN).
                    Measured chain=4 b128: v5s 4,855.1 vs 4,804.0
                    ("1") vs 4,712.8 (""); real-v5n deep 9,646.8 vs
                    9,620.7 (""). Detection parity across modes proven
                    on real scenes (examples/split_mode_parity.py).
                    "all" = every eligible concat (measured -4.7%);
                    "" to disable.

  TAT_DECODE        "pallas" = Pallas head-decode kernel (one native-
                    layout HBM read of each head, no relayout copy;
                    ops/decode_kernel.py) | "" (default) XLA decode
  TAT_XLA_OPTS      comma-separated ``flag=value`` XLA compiler options
                    forwarded to the (tunneled) compiler, e.g.
                    ``xla_tpu_scoped_vmem_limit_kib=65536`` — plain
                    XLA_FLAGS does not reach it. Sweep:
                    examples/xla_opts_sweep.py.

Diagnostic knobs (examples/feed_bisect.py — isolate which feed-pipeline
element triggers the opaque execute-time INVALID_ARGUMENT on some
configs; not perf configs, never the default):
  TAT_BENCH_INGEST  "bm" (default) batch-minor ingest layout | "plain"
                    row-major device_put
  TAT_BENCH_PRE     0 = skip letterbox+quantize (cast only)
  TAT_BENCH_POST    "parse" (default) | "topk" | "none" (raw heads)
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


def _enable_compile_cache() -> None:
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()


def _lkg_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_LKG.json")


def _config_tag() -> str:
    """Env-knob fingerprint so a cached row is only reused for the SAME
    bench configuration."""
    keys = ("TAT_BENCH_BATCH", "TAT_BENCH_MODEL", "TAT_BENCH_TIER",
            "TAT_BENCH_EXACT", "TAT_BENCH_MARS", "TAT_BENCH_S2D",
            "TAT_CONV_MERGE", "TAT_FPN_SPLIT", "TAT_STEM_NOGROW",
            "TAT_BENCH_POST", "TAT_BENCH_F32ACC",
            "TAT_BENCH_INGEST", "TAT_BENCH_PRE", "TAT_HEAD_PAD",
            "TAT_S2D_DEEP", "TAT_HEAD_SEM", "TAT_HEAD_MM", "TAT_NMS_POOL",
            "TAT_DEFER_CLS", "TAT_TOPK_GROUP", "TAT_BENCH_CHAIN",
            "TAT_XLA_OPTS", "TAT_DECODE")
    return "|".join(f"{k}={os.environ.get(k, '')}" for k in keys)


def _load_lkg_all() -> dict:
    """LKG store: {config_tag: result_record}. Also migrates the
    legacy single-record layout."""
    try:
        with open(_lkg_path()) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    if "metric" in data:                     # legacy single record
        return {data.get("config", _config_tag()): data}
    return data


def _save_lkg(result: dict) -> None:
    import datetime
    rec = dict(result)
    rec["recorded_at"] = datetime.datetime.now(
        datetime.timezone.utc).isoformat(timespec="seconds")
    store = _load_lkg_all()
    store[_config_tag()] = rec
    try:
        with open(_lkg_path(), "w") as f:
            json.dump(store, f)
    except OSError as e:
        print(f"# could not persist LKG: {e}", file=sys.stderr)


def _lkg_lookup(store: dict) -> Optional[dict]:
    """Tag-tolerant LKG lookup: the knob list GROWS across rounds, so a
    row recorded under an older (shorter) tag must still match when
    every shared knob agrees and every knob missing from the old tag is
    at its default ('') in the current one — otherwise adding a knob
    silently disables the stale-result fallback for all prior rows."""
    tag = _config_tag()
    if tag in store:
        return store[tag]
    want = dict(kv.split("=", 1) for kv in tag.split("|"))
    best = None
    for key, rec in store.items():
        have = dict(kv.split("=", 1) for kv in key.split("|") if "=" in kv)
        if all(want.get(k, "") == have.get(k, "")
               for k in set(want) | set(have)):
            if best is None or (rec.get("recorded_at", "")
                                > best.get("recorded_at", "")):
                best = rec
    return best


def _emit_lkg(reason: str) -> bool:
    """Print the last-known-good result for THIS bench config (marked
    stale). True if emitted."""
    rec = _lkg_lookup(_load_lkg_all())
    if not rec:
        print("# no LKG for this bench config", file=sys.stderr)
        return False
    rec = dict(rec)
    rec.pop("config", None)
    rec["stale"] = True
    rec["stale_reason"] = reason
    print(json.dumps(rec))
    return True


def _wait_for_backend() -> bool:
    """Wait until the TPU tunnel answers; False if the budget ran out.

    The tunneled backend goes UNAVAILABLE for multi-hour stretches; a
    bench run that starts during one records a meaningless 0.0. Probe
    with a tiny op in a SUBPROCESS (an in-process failed init can wedge
    the tunnel client permanently) and retry up to TAT_BENCH_WAIT
    seconds (default 1200 — capped so the driver's own budget isn't
    silently exceeded, cf. the explicit DMA timeouts the reference uses,
    /root/reference/src/nna_dma.c:224; 0 disables)."""
    import subprocess
    budget = float(os.environ.get("TAT_BENCH_WAIT", "1200"))
    if budget <= 0:
        return True
    deadline = time.monotonic() + budget
    probe = ("import jax, jax.numpy as jnp; "
             "jnp.ones((2, 2)).sum().block_until_ready()")
    first = True
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=150)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() > deadline:
            print("# backend still unavailable after "
                  f"{budget:.0f}s wait budget", file=sys.stderr)
            return False
        if first:
            print("# backend unavailable; retrying (TAT_BENCH_WAIT="
                  f"{budget:.0f}s) ...", file=sys.stderr)
            first = False
        time.sleep(min(60.0, max(5.0, deadline - time.monotonic())))


# side-channel from build_pipeline to main() (callers unpack the
# return tuple positionally; don't widen it)
LAST_INFO: dict = {}


def _jit(fn):
    """jax.jit honoring TAT_XLA_OPTS: comma-separated ``flag=value``
    XLA compiler options (e.g. ``xla_tpu_scoped_vmem_limit_kib=65536``)
    forwarded to the (possibly remote/tunneled) compiler — plain
    XLA_FLAGS does not reach it (docs/KERNELS.md round-3 layout
    negatives). Unknown flags fail at compile time, loudly."""
    import jax
    opts = os.environ.get("TAT_XLA_OPTS", "")
    if not opts:
        wrapped = jax.jit(fn)
    else:
        wrapped = jax.jit(fn, compiler_options=dict(
            kv.split("=", 1) for kv in opts.split(",") if "=" in kv))
    # keep the raw fn reachable: compiler_options are only legal on the
    # TOP-LEVEL jit, so build_chained must trace the unjitted body
    # inside its chain wrappers (nested jits are inlined anyway)
    wrapped._tat_raw = fn
    return wrapped


def build_pipeline(batch: int, size: str, return_raw: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from thingino_accel_tpu.models import yolo, zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions

    mars_path = os.environ.get("TAT_BENCH_MARS")
    if mars_path:
        # real-weight model (e.g. models/yolov5n_cal_int8.mars, the
        # PTQ-calibrated model behind ACCURACY.md) through the same
        # e2e pipeline; rewire to the raw detect-conv heads
        from thingino_accel_tpu.formats import mars as M
        from thingino_accel_tpu.ir.graph import from_mars
        graph = from_mars(M.read_mars(mars_path))
        det = yolo.find_detect_outputs(graph)
        if det:
            graph = graph.with_outputs(det)
    else:
        cfg = zoo.ZooConfig(dtype="int8", in_hw=(640, 640))
        graph = zoo.build_yolov5(size, cfg)
    if os.environ.get("TAT_HEAD_PAD", "0") != "0":
        # pad per-anchor head groups 85 -> 128 (zero weight rows): the
        # decode reshape becomes lane-aligned, deleting the full-head
        # relayout copies (10.6 us/frame v5n; ir/passes.py docstring)
        from thingino_accel_tpu.ir.passes import pad_detect_heads
        pad_detect_heads(graph)
    # mm decode: no graph rewrite — decode-side restructuring only
    # (narrow slices + masked native-layout class reduces; yolo.py
    # decode_and_parse_mm). Mutually exclusive with TAT_HEAD_SEM.
    head_mm = os.environ.get("TAT_HEAD_MM", "0") != "0"
    head_sem = False
    if not head_mm and os.environ.get("TAT_HEAD_SEM", "0") != "0":
        # permute head channels semantic-major/anchor-minor: decode
        # consumes contiguous slices, no lane-splitting reshape, no
        # full-head relayout copies (ir/passes.semantic_detect_heads)
        from thingino_accel_tpu.ir.passes import semantic_detect_heads
        head_sem = semantic_detect_heads(graph) > 0
    s2d = False
    if os.environ.get("TAT_BENCH_S2D", "1") != "0":
        # fixed-camera s2d ingest: stem rewritten to 3x3 s1 cin=12,
        # frames fed in 2x2-block order (host writes that order during
        # the H2D DMA; +2.2% e2e, bit-identical detections —
        # ir/passes.stem_space_to_depth). No-op (False) for graphs
        # without an eligible stem.
        from thingino_accel_tpu.ir.passes import stem_space_to_depth
        s2d = stem_space_to_depth(graph)
        if s2d and os.environ.get("TAT_S2D_DEEP", "0") != "0":
            # fold one stage deeper: stem emits s2d output, the 3x3 s2
            # downsample becomes 2x2 s1 at 4x the contraction width
            # (bit-exact; ir/passes.fold_stage2_downsample)
            from thingino_accel_tpu.ir.passes import fold_stage2_downsample
            fold_stage2_downsample(graph)
    precision = os.environ.get("TAT_BENCH_TIER", "fast")
    if os.environ.get("TAT_BENCH_EXACT") == "1":
        precision = "exact"
    accum = (None if os.environ.get("TAT_BENCH_F32ACC") == "1"
             else jnp.bfloat16)   # bf16 accumulation: +~15% (docs/KERNELS.md)
    # fast tier: keep head outputs in bf16 (quantize_outputs=False) —
    # the int8 edge costs a relayout + clamp/convert per head (~20
    # us/frame) and decode consumes them immediately; bf16 heads are
    # strictly closer to the f32 oracle than int8-requantized ones.
    eng = Engine(graph, EngineOptions(
        precision=precision, accum_dtype=accum,
        quantize_outputs=(precision != "fast")))
    in_name = eng.graph.inputs[0]
    out_names = list(eng.graph.outputs)
    out_scales = ([eng.graph.tensors[o].quant.scale for o in out_names]
                  if precision != "fast" else None)
    body = eng._fn
    params = eng.params

    in_t = eng.graph.tensors[in_name]
    in_hw = (in_t.shape[1], in_t.shape[2])

    # per-frame MAC count for the MFU line (graph shapes carry the
    # zoo's build batch; normalize it out)
    from thingino_accel_tpu.ir.graph import count_macs
    g_batch = max(1, int(in_t.shape[0])) if len(in_t.shape) == 4 else 1
    LAST_INFO["macs_per_frame"] = count_macs(eng.graph) // g_batch

    post = os.environ.get("TAT_BENCH_POST", "parse")
    pre = os.environ.get("TAT_BENCH_PRE", "1") != "0"

    @_jit
    def pipeline(frames_u8):
        if pre:
            lb = yolo.letterbox_uint8(frames_u8, in_hw)
            # fast tier: keep the quantized integer VALUES in bf16 — the
            # engine's input DEQUANT accepts any real dtype and the int8
            # thin-channel materialization costs a relayout
            x = yolo.quantize_input_int8(
                lb, dtype=jnp.bfloat16 if precision == "fast" else jnp.int8)
        else:
            # diagnostic (feed_bisect): skip letterbox+quantize, cast only
            x = frames_u8.astype(
                jnp.bfloat16 if precision == "fast" else jnp.int8)
        feats = body(params, {in_name: x})
        heads = [feats[k] for k in out_names]
        if post == "none":
            # diagnostic (feed_bisect): raw head tensors, no decode/NMS
            return heads
        if post == "topk":
            # single-pass confidences + survivor-only box decode.
            # Measured SLOWER e2e than decode_and_parse (3,622 vs
            # 4,008 fps, v5e round 3): XLA fuses the full decode into
            # the head producers, while this path's gathers don't fuse.
            dets = yolo.detect_postprocess_topk(
                heads, scales=out_scales, max_dets=100)
            return dets.boxes, dets.scores, dets.classes, dets.valid
        # int8 heads decode directly (scales applied on the consumed
        # channels only) — one 1-byte HBM pass instead of f32 copies
        if head_mm:
            boxes, scores, classes = yolo.decode_and_parse_mm(
                heads, scales=out_scales)
        elif os.environ.get("TAT_DECODE", "") == "pallas":
            # Mosaic kernel consuming the heads in native layout — the
            # route KERNELS.md's head-copy verdict names as the only
            # one it never priced (ops/decode_kernel.py)
            from thingino_accel_tpu.ops.decode_kernel import (
                decode_and_parse_pallas)
            boxes, scores, classes = decode_and_parse_pallas(
                heads, yolo.YOLOV5_ANCHORS, yolo.YOLOV5_STRIDES,
                scales=out_scales)
        elif head_sem:
            boxes, scores, classes = yolo.decode_and_parse_semantic(
                heads, scales=out_scales,
                class_reduce=os.environ.get("TAT_HEAD_SEM_REDUCE",
                                            "reshape"))
        else:
            # TAT_DEFER_CLS: skip the full-N class argmax — the third
            # return becomes the raw class-logit tensor and the argmax
            # runs on the pre-NMS survivors only (exact: argmax is
            # scale-invariant and every read candidate survives top-k)
            defer = os.environ.get("TAT_DEFER_CLS", "0") != "0"
            boxes, scores, classes = yolo.decode_and_parse(
                heads, scales=out_scales, defer_classes=defer)
        # TAT_NMS_POOL: suppression-pool depth. DEFAULT 128 since round
        # 5: detection-set parity with pool 512 PROVEN on the accuracy
        # eval's real scenes at conf 0.25 AND 0.10
        # (examples/nms_pool_parity.py; pool 100 fails the proof), and
        # the O(K^2) suppression tail shrinks +7.7% e2e on real-v5n
        # (8,443 -> 9,094 fps b128). The pool only changes results when
        # a frame carries more above-threshold candidates than POOL.
        # TAT_TOPK_GROUP: group-max prefilter width (default 8; exact
        # for any group; 16 measured slower).
        dets = yolo.nms_batched(
            boxes, scores, classes, max_dets=100,
            pre_nms=int(os.environ.get("TAT_NMS_POOL", "128")),
            topk_group=int(os.environ.get("TAT_TOPK_GROUP", "8")),
            classes_are_logits=(not head_mm and not head_sem
                                and os.environ.get("TAT_DEFER_CLS", "0")
                                != "0"))
        return dets.boxes, dets.scores, dets.classes, dets.valid

    # frames land on device in the ingest layout (batch-minor: the
    # layout XLA's stem emitter consumes with no in-graph relayout —
    # the H2D DMA writes every byte once either way, so this is free
    # in real serving; runtime/ingest.py, +6% e2e measured).
    from thingino_accel_tpu.runtime.ingest import ingest
    # s2d graphs carry the REWRITTEN input shape (H/2, W/2, 4C): raw
    # camera frames are at 2x that, packed by space_to_depth_frames
    raw = np.random.default_rng(0).integers(
        0, 256,
        ((batch, in_hw[0] * 2, in_hw[1] * 2, 3) if s2d
         else (batch,) + in_hw + (3,)),
        dtype=np.uint8)
    if s2d:
        raw = yolo.space_to_depth_frames(raw)   # the camera-DMA order
    if os.environ.get("TAT_BENCH_INGEST", "bm") == "plain":
        # diagnostic (feed_bisect): row-major placement, in-graph relayout
        frames = jax.device_put(raw, jax.devices()[0])
    else:
        frames = ingest(raw)
    if return_raw:
        # sustained-serving benches feed HOST batches through
        # StreamServer themselves (examples/serve_bench.py)
        return pipeline, frames, raw
    return pipeline, frames


def build_chained(pipeline, frames, batch: int, chain: int, mode: str):
    """Wrap ``pipeline`` so one device program processes ``chain``
    DISTINCT microbatches of ``batch`` frames — honest e2e serving
    semantics (N*batch frames in, N*batch detection sets out) that
    amortizes the per-program dispatch gap (wall - program time,
    ~6-7 us/frame at b128 through the tunneled runtime). Two modes:

    - inline (default): N ingested buffers as jit args — inlined body
      copies, input layouts PRESERVED, compile ~N x body. Measured
      single-peaked at chain=4 (v5n 9,094 -> 9,620.7 fps);
    - scan: lax.scan over stacked frames — one body compile, but
      stacking drops the ingest layout and the in-scan relayout
      measured -2.4..-4% (v5n 8,727/8,878 at chain 2/4 vs 9,094
      unchained); kept as the documented negative.

    Returns ``(run, feed, frames_per_call)``. Per-microbatch outputs
    are exactly ``pipeline(buf_i)`` (tested on CPU in
    tests/test_bench_utils.py).
    """
    import jax
    # trace the raw body inside chain wrappers: a nested jit carrying
    # compiler_options (TAT_XLA_OPTS) is a ValueError, and nested jits
    # are inlined by the tracer anyway — identical program either way
    body = getattr(pipeline, "_tat_raw", pipeline)
    if chain > 1 and mode == "scan":
        stacked = jax.numpy.stack([frames] * chain)

        @_jit
        def chained_scan(xs):
            return jax.lax.scan(lambda c, x: (c, body(x)),
                                0, xs)[1]

        return chained_scan, (stacked,), batch * chain
    if chain > 1:
        import numpy as np
        from thingino_accel_tpu.runtime.ingest import ingest as _ingest
        bufs = [frames]
        host = np.asarray(frames)
        rng = np.random.default_rng(1)
        for _ in range(chain - 1):
            # distinct data per microbatch (prevents any cross-step
            # CSE/hoisting), same ingest layout as the primary buffer
            perm = rng.permutation(host.shape[0])
            bufs.append(_ingest(np.ascontiguousarray(host[perm])))

        @_jit
        def chained_inline(*xs):
            return tuple(body(x) for x in xs)

        return chained_inline, tuple(bufs), batch * chain
    return pipeline, (frames,), batch


def measure(batch: int, size: str, iters: int) -> float:
    import jax
    pipeline, frames = build_pipeline(batch, size)
    run, feed, per_call = build_chained(
        pipeline, frames, batch,
        int(os.environ.get("TAT_BENCH_CHAIN", "1")),
        os.environ.get("TAT_BENCH_CHAIN_MODE", "inline"))
    out = run(*feed)                # compile + warmup
    jax.block_until_ready(out)
    out = run(*feed)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*feed)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return per_call * iters / dt


def _retry_fresh_cache() -> bool:
    """Re-exec this bench once with a pristine compile-cache dir.

    An executable serialized to the persistent cache while the
    device/tunnel was wedged fails at execute with an opaque
    INVALID_ARGUMENT forever after — a poisoned entry reproduces the
    failure on every later (healthy) run of that config. Found
    2026-08-19: the 'b>=128 rewrite cliff' was exactly this; the same
    config passes at full speed with a fresh cache
    (examples/feed_bisect.py). The retry subprocess re-measures with
    TAT_JAX_CACHE pointed at a scratch dir, re-emits its JSON line,
    and persists the LKG itself. True if the retry produced a line."""
    if os.environ.get("TAT_BENCH_CACHE_RETRY") == "1":
        return False          # already the retry; don't recurse
    import subprocess
    import tempfile
    print("# INVALID_ARGUMENT with persistent cache: retrying with a "
          "fresh cache dir (poisoned-entry defense)", file=sys.stderr)
    env = dict(os.environ)
    env["TAT_BENCH_CACHE_RETRY"] = "1"
    env["TAT_JAX_CACHE"] = tempfile.mkdtemp(prefix="tat_cache_retry_")
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        print("# fresh-cache retry timed out", file=sys.stderr)
        return False
    sys.stderr.write(r.stderr)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    if r.returncode == 0 and line:
        print(line)
        return True
    return False


# chip peak, one v5e: 197 TFLOP/s bf16, 394 TOP/s int8
_PEAK = {"bf16": 197e12, "int8": 394e12}


def main() -> None:
    # default the chain depth EXPLICITLY (before any _config_tag use)
    # so the LKG tag always records what was measured: 4 distinct
    # microbatches per device program — the measured-best dispatch
    # amortization (v5n 9,094 -> 9,620.7 fps, v5s 4,712.8 -> 4,804.0;
    # chain 6/8 plateau at 9,497/9,595 — docs/KERNELS.md round-5
    # chain ladder). TAT_BENCH_CHAIN=1 restores single-dispatch.
    os.environ.setdefault("TAT_BENCH_CHAIN", "4")
    if not _wait_for_backend():
        if _emit_lkg("backend unavailable at bench time"):
            return
        # No cached result to fall back on: emit an honest zero line
        # rather than hanging ~25 min in backend init (rc=124, no line).
        print(json.dumps({
            "metric": "yolov5-int8@640 e2e frames/sec/chip",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": "TPU backend unavailable and no BENCH_LKG.json"}))
        return
    _enable_compile_cache()
    size = os.environ.get("TAT_BENCH_MODEL", "s")
    iters = int(os.environ.get("TAT_BENCH_ITERS", "30"))
    if os.environ.get("TAT_BENCH_BATCH"):
        batches = [int(os.environ["TAT_BENCH_BATCH"])]
    else:
        batches = [128]

    best_fps, best_batch = 0.0, 0
    saw_invalid_argument = False
    for b in batches:
        try:
            fps = measure(b, size, iters)
        except Exception as e:  # OOM at large batch, mid-run outage etc.
            print(f"# batch {b} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
            saw_invalid_argument |= "INVALID_ARGUMENT" in str(e)
            continue
        print(f"# batch {b}: {fps:.1f} fps", file=sys.stderr)
        if fps > best_fps:
            best_fps, best_batch = fps, b

    if best_fps <= 0.0 and saw_invalid_argument and _retry_fresh_cache():
        return

    if best_fps <= 0.0:
        if _emit_lkg("measurement failed"):
            return

    model_tag = (os.path.basename(os.environ["TAT_BENCH_MARS"])
                 if os.environ.get("TAT_BENCH_MARS") else f"yolov5{size}")
    tier = os.environ.get("TAT_BENCH_TIER", "fast")
    if os.environ.get("TAT_BENCH_EXACT") == "1":
        tier = "exact"
    if tier != "fast":
        model_tag += f"[{tier}]"
    chain = int(os.environ.get("TAT_BENCH_CHAIN", "1"))
    batch_tag = (f"{chain}x{best_batch} "
                 f"{os.environ.get('TAT_BENCH_CHAIN_MODE', 'inline')}"
                 "-chained" if chain > 1 else str(best_batch))
    result = {
        "metric": f"{model_tag}-int8@640 e2e frames/sec/chip "
                  f"(decode+NMS incl., batch {batch_tag})",
        "value": round(best_fps, 1),
        "unit": "fps",
        "vs_baseline": round(best_fps / 10000.0, 4),
    }
    macs = LAST_INFO.get("macs_per_frame")
    if macs and best_fps > 0:
        # model FLOPs (2*MACs) at the measured rate vs chip peak for
        # the tier's MXU dtype (fast = bf16 convs; serving/exact =
        # int8 dots)
        basis = "bf16" if tier == "fast" else "int8"
        result["mfu"] = round(best_fps * macs * 2 / _PEAK[basis], 4)
        result["mfu_basis"] = basis

    # secondary driver-captured row: REAL calibrated weights (yolov5n).
    # No real yolov5s weights ship in-env (documented limitation), so
    # the real-weight story rides in the same JSON line the driver
    # records. TAT_BENCH_SECOND=0 disables; skipped automatically for
    # non-default configs (queue rows measure their own thing).
    v5n = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "models", "yolov5n_cal_int8.mars")
    if (best_fps > 0 and os.environ.get("TAT_BENCH_SECOND", "1") != "0"
            and not os.environ.get("TAT_BENCH_MARS")
            and tier == "fast" and os.path.exists(v5n)):
        # the secondary row runs its own measured-best config, not the
        # main row's: deep s2d fold ON, fpn-split "wide" (v5n round-5
        # ladder: deep+wide 9,646.8 > deep-only 9,620.7 chain=4;
        # earlier chain=1: deep-only 8,443 > deep+upsample-split 8,404
        # — upsample-split hurts v5n's thin channels, but the wide
        # mode's lane-aligned SPPF/PAN splits help; docs/KERNELS.md)
        # subprocess isolation: measured +3% vs in-process (9,094 vs
        # 8,798 fps) — the main row's engine leaves HBM fragmented and
        # executables resident. Compile cache makes the re-init cheap.
        # Falls back to in-process on any subprocess failure.
        import subprocess
        fps2 = None
        env = dict(os.environ, TAT_BENCH_MARS=v5n, TAT_S2D_DEEP="1",
                   TAT_FPN_SPLIT="wide", TAT_BENCH_SECOND="0")
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, timeout=1800, env=env, text=True)
            lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")]
            if r.returncode == 0 and lines:
                rec = json.loads(lines[-1])
                if not rec.get("stale"):
                    fps2 = float(rec["value"])
        except Exception as e:
            print(f"# v5n subprocess row failed: {e}", file=sys.stderr)
        if fps2 is None:
            prev = {k: os.environ.get(k) for k in
                    ("TAT_BENCH_MARS", "TAT_S2D_DEEP", "TAT_FPN_SPLIT")}
            os.environ["TAT_BENCH_MARS"] = v5n
            os.environ["TAT_S2D_DEEP"] = "1"
            os.environ["TAT_FPN_SPLIT"] = "wide"
            try:
                fps2 = measure(best_batch or 128, size, iters)
            except Exception as e:
                print(f"# real-weight v5n row failed: {e}",
                      file=sys.stderr)
            finally:
                for k, v in prev.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
        if fps2 is not None:
            result["real_yolov5n_fps"] = round(fps2, 1)
            result["real_yolov5n_vs_baseline"] = round(fps2 / 10000.0, 4)

    if best_fps > 0:
        _save_lkg(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
