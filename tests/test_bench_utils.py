"""Unit tests for bench.py's LKG store + ir.graph.count_macs."""

import json
import sys

import numpy as np
import pytest


sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def test_count_macs_hand_computed():
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.ir.graph import count_macs
    g = zoo.build_tiny(zoo.ZooConfig(dtype="float32", in_hw=(32, 32)),
                       in_hw=(32, 32))
    total = 0
    for n in g.nodes:
        if n.op not in ("CONV2D", "DEPTHWISE_CONV2D", "FC"):
            continue
        out = g.tensors[n.outputs[0]].shape
        w = g.tensors[n.inputs[1]].shape
        total += int(np.prod(out)) * int(np.prod(w[1:]))
    assert count_macs(g) == total > 0


def test_count_macs_yolov5s_matches_published():
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.ir.graph import count_macs
    g = zoo.build_yolov5("s", zoo.ZooConfig(dtype="int8",
                                            in_hw=(640, 640)))
    b = g.tensors[g.inputs[0]].shape[0]
    gflops = 2 * count_macs(g) / b / 1e9
    # ultralytics reports 16.5 GFLOPs for yolov5s@640
    assert 15.5 < gflops < 17.5, gflops


def test_lkg_store_per_config(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_lkg_path",
                        lambda: str(tmp_path / "lkg.json"))
    monkeypatch.delenv("TAT_CONV_MERGE", raising=False)
    r1 = {"metric": "m", "value": 100.0, "unit": "fps",
          "vs_baseline": 0.01}
    bench._save_lkg(r1)
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    bench._save_lkg({"metric": "m", "value": 200.0, "unit": "fps",
                     "vs_baseline": 0.02})
    store = json.loads((tmp_path / "lkg.json").read_text())
    assert len(store) == 2                      # per-config records

    # emit picks the record matching the CURRENT env config
    printed = []
    monkeypatch.setattr("builtins.print", lambda *a, **k:
                        printed.append(a[0] if a else ""))
    assert bench._emit_lkg("test")
    rec = json.loads(printed[-1])
    assert rec["value"] == 200.0 and rec["stale"] is True

    monkeypatch.delenv("TAT_CONV_MERGE")
    printed.clear()
    assert bench._emit_lkg("test")
    rec = json.loads(printed[-1])
    assert rec["value"] == 100.0


def test_lkg_migrates_legacy_single_record(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_lkg_path",
                        lambda: str(tmp_path / "lkg.json"))
    legacy = {"metric": "m", "value": 42.0, "unit": "fps",
              "vs_baseline": 0.004, "config": bench._config_tag()}
    (tmp_path / "lkg.json").write_text(json.dumps(legacy))
    store = bench._load_lkg_all()
    assert store[bench._config_tag()]["value"] == 42.0


def test_lkg_lookup_tolerates_grown_knob_list(monkeypatch):
    # a row recorded before TAT_NMS_POOL/TAT_HEAD_MM existed must still
    # match the current (longer) tag when every shared knob agrees
    for k in ("TAT_BENCH_BATCH", "TAT_CONV_MERGE", "TAT_NMS_POOL",
              "TAT_HEAD_MM"):
        monkeypatch.delenv(k, raising=False)
    old_key = ("TAT_BENCH_BATCH=|TAT_BENCH_MODEL=|TAT_BENCH_TIER=|"
               "TAT_BENCH_EXACT=|TAT_BENCH_MARS=|TAT_BENCH_S2D=|"
               "TAT_CONV_MERGE=|TAT_FPN_SPLIT=|TAT_STEM_NOGROW=|"
               "TAT_BENCH_POST=|TAT_BENCH_F32ACC=")
    store = {old_key: {"metric": "m", "value": 42.0}}
    assert bench._lkg_lookup(store) == {"metric": "m", "value": 42.0}
    # but NOT when a shared knob differs ...
    monkeypatch.setenv("TAT_CONV_MERGE", "1")
    assert bench._lkg_lookup(store) is None
    monkeypatch.delenv("TAT_CONV_MERGE")
    # ... or when a NEW knob is set away from its default
    monkeypatch.setenv("TAT_NMS_POOL", "128")
    assert bench._lkg_lookup(store) is None


def test_build_chained_inline_per_microbatch_equivalence():
    """The inline chain's per-microbatch outputs are exactly
    pipeline(buf_i): one device program, N distinct buffers in, N
    results out (the semantics behind the TAT_BENCH_CHAIN=4 default)."""
    import jax
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime.ingest import ingest

    @jax.jit
    def pipeline(x):
        # stand-in with per-frame structure (order-sensitive in B)
        return (x.astype(jnp.float32) ** 2).sum(axis=(1, 2, 3)) \
            + jnp.arange(x.shape[0], dtype=jnp.float32)

    rng = np.random.default_rng(7)
    host = rng.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)
    frames = ingest(host)
    run, feed, per_call = bench.build_chained(
        pipeline, frames, batch=6, chain=3, mode="inline")
    assert per_call == 18 and len(feed) == 3
    outs = run(*feed)
    assert len(outs) == 3
    for buf, out in zip(feed, outs):
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(pipeline(buf)), rtol=1e-6)
    # microbatches are DISTINCT data (no cross-step CSE possible) but
    # the same multiset of frames (permutations of the primary buffer)
    a0, a1 = np.asarray(feed[0]), np.asarray(feed[1])
    assert not np.array_equal(a0, a1)
    assert np.array_equal(np.sort(a0.reshape(6, -1), axis=0),
                          np.sort(a1.reshape(6, -1), axis=0))


def test_build_chained_chain1_passthrough():
    import jax.numpy as jnp
    pipeline = lambda x: x  # noqa: E731
    frames = jnp.zeros((4, 2, 2, 3), jnp.uint8)
    run, feed, per_call = bench.build_chained(
        pipeline, frames, batch=4, chain=1, mode="inline")
    assert run is pipeline and per_call == 4 and feed == (frames,)


def test_chained_jit_with_xla_opts_is_top_level_only(monkeypatch):
    """Regression: compiler_options are legal ONLY on the top-level
    jit. A _jit pipeline nested inside the chain wrapper raised
    'can only be passed to top-level jax.jit' and zeroed every
    TAT_XLA_OPTS sweep row; build_chained must trace the raw body."""
    import jax.numpy as jnp
    from thingino_accel_tpu.runtime.ingest import ingest
    monkeypatch.setenv("TAT_XLA_OPTS", "xla_backend_optimization_level=2")
    pipeline = bench._jit(
        lambda x: x.astype(jnp.float32).sum(axis=(1, 2, 3)))
    host = np.random.default_rng(3).integers(
        0, 256, (4, 8, 8, 3), dtype=np.uint8)
    frames = ingest(host)
    for mode in ("inline", "scan"):
        run, feed, per_call = bench.build_chained(
            pipeline, frames, batch=4, chain=2, mode=mode)
        outs = run(*feed)   # would raise ValueError before the fix
        ref = pipeline(frames)
        got = outs[0] if mode == "inline" else outs[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6)


def test_jit_honors_tat_xla_opts(monkeypatch):
    """TAT_XLA_OPTS parses flag=value pairs into compiler_options and
    the jitted fn still runs; empty/unset is a plain jax.jit."""
    import jax.numpy as jnp
    monkeypatch.delenv("TAT_XLA_OPTS", raising=False)
    f = bench._jit(lambda x: x + 1)
    np.testing.assert_array_equal(np.asarray(f(jnp.zeros(3))), np.ones(3))
    # a benign, universally-supported XLA option
    monkeypatch.setenv("TAT_XLA_OPTS", "xla_backend_optimization_level=2")
    g = bench._jit(lambda x: x * 2)
    np.testing.assert_array_equal(np.asarray(g(jnp.ones(3))),
                                  np.full(3, 2.0))
