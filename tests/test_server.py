"""Serving engine: bucketed micro-batching, determinism, stats, CLI."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from trajsde_tpu.data.synthetic import make_raw_scene, make_scene_batch
from trajsde_tpu.server import ServingEngine

from test_models_forward import make_baseline, make_sde

A, L = 8, 12


@pytest.fixture(scope="module")
def engine_setup():
    rng = np.random.default_rng(0)
    model = make_sde()
    scene = make_scene_batch(rng, batch_size=1, num_actors=A, num_lanes=L)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )["params"]
    return model, params


def _mk_engine(model, params, **kw):
    kw.setdefault("num_actors", A)
    kw.setdefault("num_lanes", L)
    kw.setdefault("engine", "scan")  # CPU-friendly exact forward
    kw.setdefault("batch_buckets", (1, 2, 4))
    return ServingEngine(model, params, **kw)


def test_predict_contract_and_bucketing(engine_setup, rng):
    model, params = engine_setup
    eng = _mk_engine(model, params)
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6) for s in range(3)]
    out = eng.predict(scenes)  # 3 → bucket 4, padded with a copy
    assert len(out) == 3
    K, Tf = model.decoder.num_modes, model.decoder.future_steps
    for r in out:
        assert r["loc"].shape == (K, A, Tf, 2)
        assert r["pi"].shape == (A, K)
        assert r["agent_world"].shape == (K, Tf, 2)
        assert r["agent_pi"].shape == (K,)
        np.testing.assert_allclose(r["agent_pi"].sum(), 1.0, rtol=1e-5)
        assert np.isfinite(r["loc"]).all() and np.isfinite(r["agent_world"]).all()
    eng.close()


def test_predict_is_deterministic_per_counter(engine_setup, rng):
    model, params = engine_setup
    scenes = [make_raw_scene(rng, 0, num_actors=5, num_lanes=6) for _ in range(2)]
    outs = []
    for _ in range(2):  # fresh engine → same key counter → same noise draw
        eng = _mk_engine(model, params, seed=7)
        outs.append(eng.predict(scenes))
        eng.close()
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a["loc"], b["loc"])
        np.testing.assert_array_equal(a["agent_world"], b["agent_world"])


def test_baseline_model_serves_through_scan(rng):
    """The scan engine must serve the baseline (non-SDE) model family too:
    PredictionModel.__call__ has no `ood` kwarg, so the engine may only
    forward it when OOD scoring was requested (round-5 regression)."""
    model = make_baseline()
    scene = make_scene_batch(np.random.default_rng(0), batch_size=1,
                             num_actors=A, num_lanes=L)
    params = jax.jit(model.init)({"params": jax.random.key(0)}, scene)["params"]
    eng = _mk_engine(model, params)
    try:
        (r,) = eng.predict([make_raw_scene(rng, 0, num_actors=5, num_lanes=6)])
    finally:
        eng.close()
    K, Tf = model.decoder.num_modes, model.decoder.future_steps
    assert r["agent_world"].shape == (K, Tf, 2)
    assert np.isfinite(r["agent_world"]).all()


def test_predict_pipeline_matches_serial(engine_setup, rng):
    """Pipelined bulk predict (one batch in flight, default) must be
    bit-equal to the serial path: identical chunking, bucket choice, and
    (seed, counter) key stream — only the host/device overlap differs."""
    model, params = engine_setup
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6)
              for s in range(7)]  # max_batch=2 → 4 chunks, last ragged
    outs = []
    for pipeline in (False, True):
        eng = _mk_engine(model, params, seed=5, max_batch=2)
        outs.append(eng.predict(scenes, pipeline=pipeline))
        eng.close()
    assert len(outs[0]) == len(outs[1]) == 7
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a["loc"], b["loc"])
        np.testing.assert_array_equal(a["agent_world"], b["agent_world"])
        assert int(a["seq_id"]) == int(b["seq_id"])


def test_agent_world_frame_round_trip(engine_setup, rng):
    """agent_world must be the agent-frame modes rotated by the agent's
    heading and offset by its reference-time position (``test.py``'s
    submission math)."""
    model, params = engine_setup
    eng = _mk_engine(model, params, seed=3)
    raw = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)
    (r,) = eng.predict([raw])
    eng.close()

    from trajsde_tpu.data.grid import align_to_grid
    from trajsde_tpu.data.pack import pack_scenes

    scene = pack_scenes([align_to_grid(dict(raw, source=0))], A, L)
    ai = int(np.asarray(scene.agent_index)[0])
    ang = float(np.asarray(scene.rotate_angles)[0, ai])
    c, s = np.cos(ang), np.sin(ang)
    rot_t = np.array([[c, s], [-s, c]], np.float32)
    origin = np.asarray(scene.positions)[0, ai, 20]
    expect = r["loc"][:, ai] @ rot_t + origin
    np.testing.assert_allclose(r["agent_world"], expect, atol=1e-4)


def test_mix_seed_streams_do_not_overlap():
    """Adjacent engine seeds must not replay each other's kernel-decoder
    noise: the pre-fix ``seed*1000003 + counter`` made engine s at counter
    1000003+k collide with engine s+1 at counter k."""
    from trajsde_tpu.server import derive_key_data, mix_seed

    seen = {}
    for s in (0, 1, 2, -1, 12345):
        for c in range(1, 200):
            v = mix_seed(s, c)
            assert 0 <= v < 2**31
            assert v not in seen, f"{v} from both {seen.get(v)} and {(s, c)}"
            seen[v] = (s, c)
    # the documented collision shape of the multiplicative scheme
    assert mix_seed(0, 1000003 + 7) != mix_seed(1, 7)
    # negative seeds are valid and deterministic
    np.testing.assert_array_equal(
        derive_key_data(-1, 3, (2,)), derive_key_data(-1, 3, (2,))
    )


def test_delta_mode_world_projection(engine_setup, rng):
    """is_gtabs=False: model outputs are per-step displacements in GRID
    space (nuScenes rows carry the ÷5 scaling, ``data/grid.py:64-72``);
    agent_world must cumsum them and multiply nuScenes rows back to meters
    before rotating/offsetting into the world frame."""
    model, params = engine_setup
    eng = _mk_engine(model, params, seed=5, is_gtabs=False)
    raw = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)  # source 0 = nuScenes
    (r,) = eng.predict([raw])
    eng.close()

    from trajsde_tpu.data.grid import NUS_SCALE, align_to_grid
    from trajsde_tpu.data.pack import pack_scenes

    scene = pack_scenes([align_to_grid(dict(raw, source=0), is_gtabs=False)], A, L)
    ai = int(np.asarray(scene.agent_index)[0])
    ang = float(np.asarray(scene.rotate_angles)[0, ai])
    c, s = np.cos(ang), np.sin(ang)
    rot_t = np.array([[c, s], [-s, c]], np.float32)
    origin = np.asarray(scene.positions)[0, ai, 20]
    # r["loc"] is the cumulative-absolute GRID-space trajectory; the world
    # projection re-scales nuScenes rows to meters before the rigid motion
    expect = (r["loc"][:, ai] * NUS_SCALE) @ rot_t + origin
    np.testing.assert_allclose(r["agent_world"], expect, atol=1e-3)


def test_ood_serving_scan_matches_direct(engine_setup, rng):
    """ood=True attaches per-actor ensemble stds; the engine's (seed,
    counter) key stream must reproduce the direct model's OOD forward
    (models/prediction.py ood=True), and predictions must decode from the
    ensemble-MEAN embedding — the reference eval semantics served live
    (reference ``test.py --ood`` → ``model_base_mix_sde.py:89-98``)."""
    model, params = engine_setup
    eng = _mk_engine(model, params, ood=True, batch_buckets=(1,), seed=11)
    raw = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)
    (res,) = eng.predict([raw])
    eng.close()
    assert res["ood_std"].shape == (A,)
    assert np.isfinite(res["ood_std"]).all()

    from trajsde_tpu.data.pack import pack_scenes
    from trajsde_tpu.server import align_scene, derive_key_data

    scene = pack_scenes([align_scene(raw)[0]], A, L)
    kd = derive_key_data(11, 1, jax.random.key_data(jax.random.key(0)).shape)

    # jit the direct forward like the engine's pipeline (an eager apply
    # fuses differently and drifts a few ulps on the SDE paths)
    @jax.jit
    def direct(p, s, key_data):
        return model.apply(
            {"params": p}, s, ood=True,
            rngs={"sde": jax.random.wrap_key_data(key_data)},
        )

    out = direct(params, scene, kd)
    np.testing.assert_allclose(
        res["ood_std"], np.asarray(out["stds"][0]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        res["loc"], np.asarray(out["loc"][0, ..., :2]), rtol=1e-4, atol=1e-5
    )
    # the focal scalar is the agent row of the per-actor scores
    ai = int(np.asarray(scene.agent_index)[0])
    np.testing.assert_allclose(res["agent_std"], res["ood_std"][ai], rtol=1e-6)
    assert float(res["agent_std"]) > 0


def test_ood_serving_kernel_engine_matches_scan_scores(engine_setup, rng):
    """The kernel engine's OOD scores come from the same encoder ensemble
    (the Pallas splice only replaces the decoder rollout) — per-actor stds
    must match the scan engine's for the same (seed, counter) stream."""
    model, params = engine_setup
    raw = make_raw_scene(rng, 1, num_actors=5, num_lanes=6)
    outs = {}
    for engine in ("kernel", "scan"):
        eng = _mk_engine(
            model, params, engine=engine, ood=True, batch_buckets=(1,), seed=7
        )
        (outs[engine],) = eng.predict([raw])
        eng.close()
    np.testing.assert_allclose(
        outs["kernel"]["ood_std"], outs["scan"]["ood_std"], rtol=1e-4, atol=1e-5
    )
    assert np.isfinite(outs["kernel"]["loc"]).all()


def test_ood_requires_capable_engine(engine_setup):
    from test_models_forward import make_baseline

    model, params = engine_setup
    # baseline encoder has no forward_ood → loud NotImplementedError
    with pytest.raises(NotImplementedError, match="forward_ood"):
        ServingEngine(
            make_baseline(), {}, num_actors=A, num_lanes=L,
            engine="scan", ood=True,
        )
    # frozen export artifacts cannot carry the OOD ensemble
    with pytest.raises(ValueError, match="ood"):
        ServingEngine(
            model, params, num_actors=A, num_lanes=L,
            engine="exported", ood=True,
        )


def test_slim_results_match_full(engine_setup, rng):
    """slim=True returns only the focal-agent fields, numerically equal to
    the full engine's (same (seed, counter) key stream): the dense
    per-actor grids are dropped from the jitted pipeline's OUTPUT, not
    from the math agent_world gathers from."""
    model, params = engine_setup
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6) for s in range(3)]
    full = _mk_engine(model, params, seed=11)
    slim = _mk_engine(model, params, seed=11, slim=True)
    try:
        a = full.predict(scenes)
        b = slim.predict(scenes)
    finally:
        full.close()
        slim.close()
    for ra, rb in zip(a, b):
        assert "loc" not in rb and "pi" not in rb
        assert "loc" in ra and "pi" in ra
        np.testing.assert_allclose(rb["agent_world"], ra["agent_world"], atol=1e-5)
        np.testing.assert_allclose(rb["agent_pi"], ra["agent_pi"], atol=1e-6)
        assert int(rb["seq_id"]) == int(ra["seq_id"])


def test_slim_keeps_ood_scores(engine_setup, rng):
    model, params = engine_setup
    eng = _mk_engine(model, params, slim=True, ood=True)
    try:
        (r,) = eng.predict([make_raw_scene(rng, 0, num_actors=5, num_lanes=6)])
    finally:
        eng.close()
    assert "loc" not in r
    assert r["ood_std"].shape == (A,) and np.isfinite(r["agent_std"])


def test_slim_rejects_exported_engine(engine_setup):
    """An export artifact's StableHLO pipeline is frozen with the full
    result set; slim=True must refuse it loudly."""
    model, params = engine_setup

    class _FakeExport:
        manifest = {"key_data": {"shape": (2,)}}
        decoder = model.decoder

    with pytest.raises(ValueError, match="slim"):
        ServingEngine(
            _FakeExport(), None, num_actors=A, num_lanes=L,
            engine="exported", batch_buckets=(1, 2, 4), slim=True,
        )


def test_micro_batcher_groups_and_stats(engine_setup, rng):
    model, params = engine_setup
    eng = _mk_engine(model, params, max_wait_ms=200.0)
    eng.warmup(make_raw_scene(rng, 0, num_actors=5, num_lanes=6))
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6) for s in range(5)]
    futs = [eng.submit(s) for s in scenes]
    results = [f.result(timeout=120) for f in futs]
    assert all(np.isfinite(r["agent_world"]).all() for r in results)
    st = eng.stats()
    assert st["served"] >= 5
    assert st["p50_ms"] > 0 and st["p99_ms"] >= st["p50_ms"]
    # the 200 ms window must have grouped concurrent requests
    assert st["mean_batch"] > 1.0
    eng.close()
    with pytest.raises(RuntimeError):
        eng.submit(scenes[0])


def test_cancelled_future_does_not_kill_worker(engine_setup, rng):
    """A caller cancelling its queued Future must not race the worker's
    set_result into an InvalidStateError that kills the worker thread
    (round-5 review finding): later submissions must still resolve."""
    model, params = engine_setup
    eng = _mk_engine(model, params, max_wait_ms=1.0)
    scene = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)
    eng.warmup(scene)
    try:
        for _ in range(10):  # race the worker from both queue states
            f = eng.submit(scene)
            f.cancel()
        survivor = eng.submit(scene)
        r = survivor.result(timeout=120)  # worker alive → this resolves
        assert np.isfinite(r["agent_world"]).all()
        assert eng._worker.is_alive()
    finally:
        eng.close()


def test_sharded_serving_matches_unsharded(engine_setup, rng):
    """shard=True partitions each bucket over the data mesh; results must be
    bit-comparable to the single-device path (same key counter → same noise),
    up to cross-device reduction reassociation."""
    model, params = engine_setup
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6) for s in range(4)]
    outs = []
    for shard in (False, True):
        eng = _mk_engine(model, params, seed=11, shard=shard)
        if shard:
            # bucket 4 on 8 virtual devices → gcd gives a 4-wide data mesh
            from trajsde_tpu.parallel.mesh import DATA_AXIS

            assert eng._meshes[4].shape[DATA_AXIS] == 4
            assert eng._meshes[1].shape[DATA_AXIS] == 1
        outs.append(eng.predict(scenes))
        eng.close()
    for a, b in zip(*outs):
        np.testing.assert_allclose(a["loc"], b["loc"], atol=1e-5)
        np.testing.assert_allclose(a["agent_world"], b["agent_world"], atol=1e-4)
        np.testing.assert_allclose(a["agent_pi"], b["agent_pi"], atol=1e-5)


@pytest.mark.slow
def test_sharded_kernel_matches_unsharded(engine_setup, rng):
    """shard=True with the kernel engine wraps the Pallas rollout in
    shard_map over the flattened B·F·A row axis.  With explicit noise
    (the CPU interpreter path) rows are merely split across devices, so
    the sharded result must equal the unsharded kernel run exactly."""
    model, params = engine_setup
    scenes = [make_raw_scene(rng, s % 2, num_actors=5, num_lanes=6)
              for s in range(3)]
    outs = []
    for shard in (False, True):
        eng = _mk_engine(model, params, engine="kernel", seed=13, shard=shard)
        if shard:
            # rows = bucket·K·A is divisible by 8 even at bucket 1
            # (1·10·8 = 80), so every bucket fans out over all 8 devices
            assert set(eng._kserves) == {1, 2, 4}
            assert len(set(map(id, eng._kserves.values()))) == 1
        outs.append(eng.predict(scenes))
        eng.close()
    for a, b in zip(*outs):
        np.testing.assert_allclose(a["loc"], b["loc"], atol=1e-5)
        np.testing.assert_allclose(a["agent_world"], b["agent_world"], atol=1e-4)
        np.testing.assert_allclose(a["agent_pi"], b["agent_pi"], atol=1e-5)


def test_shard_rejects_exported_engine(engine_setup):
    """A deserialized StableHLO artifact is an opaque call the partitioner
    cannot split; shard=True must refuse it loudly (kernel and scan are
    both shardable now)."""
    model, params = engine_setup

    class _FakeExport:
        manifest = {"key_data": {"shape": (2,)}}
        decoder = model.decoder

    with pytest.raises(ValueError, match="export"):
        ServingEngine(
            _FakeExport(), None, num_actors=A, num_lanes=L,
            engine="exported", batch_buckets=(1, 2, 4), shard=True,
        )


def test_submit_propagates_errors(engine_setup, rng):
    model, params = engine_setup
    eng = _mk_engine(model, params, max_wait_ms=200.0)
    # malformed scene fails ITS OWN caller synchronously (validation runs
    # before enqueue) — it must not poison a concurrent micro-batch
    good = eng.submit(make_raw_scene(rng, 0, num_actors=5, num_lanes=6))
    with pytest.raises(Exception):
        eng.submit({"not": np.zeros(1)}).result(timeout=120)
    r = good.result(timeout=120)
    assert np.isfinite(r["agent_world"]).all()
    # a scene with no seq_id field reports -1, not its micro-batch slot
    assert int(r["seq_id"]) == -1
    eng.close()


def test_http_endpoint(engine_setup, rng):
    """HTTP front-end: concurrent POST /predict requests share device
    dispatches via the micro-batcher; stats/health/errors served."""
    import io
    import json as _json
    import urllib.error
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from trajsde_tpu.httpd import run_http_server

    model, params = engine_setup
    eng = _mk_engine(model, params, max_wait_ms=300.0)
    eng.warmup(make_raw_scene(rng, 0, num_actors=5, num_lanes=6))
    server, port = run_http_server(eng, "127.0.0.1", 0)
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert _json.loads(r.read())["status"] == "ok"

        def post_scene(i):
            raw = make_raw_scene(rng, i % 2, num_actors=5, num_lanes=6)
            buf = io.BytesIO()
            np.savez(buf, **raw)
            req = urllib.request.Request(
                f"{base}/predict", data=buf.getvalue(),
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(req, timeout=300) as r:
                return _json.loads(r.read())

        with ThreadPoolExecutor(4) as ex:
            results = list(ex.map(post_scene, range(4)))
        K, Tf = model.decoder.num_modes, model.decoder.future_steps
        for res in results:
            world = np.asarray(res["agent_world"])
            assert world.shape == (K, Tf, 2) and np.isfinite(world).all()
            np.testing.assert_allclose(np.sum(res["agent_pi"]), 1.0, rtol=1e-5)

        # binary result path: Accept: application/x-npz → npz bytes (the
        # cheap-encode bulk-client path)
        raw = make_raw_scene(rng, 0, num_actors=5, num_lanes=6)
        buf = io.BytesIO()
        np.savez(buf, **raw)
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream",
                     "Accept": "application/x-npz"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "application/x-npz"
            with np.load(io.BytesIO(r.read())) as z:
                assert z["agent_world"].shape == (K, Tf, 2)
                assert np.isfinite(z["agent_world"]).all()
                assert z["loc"].shape == (K, A, Tf, 2)  # full engine

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            st = _json.loads(r.read())
        assert st["served"] >= 4
        # the 300 ms batching window must have grouped concurrent posts
        assert st["mean_batch"] > 1.0

        # malformed body → 400; unknown path → 404 (engine stays alive)
        req = urllib.request.Request(
            f"{base}/predict", data=b"junk",
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404
        # oversized Content-Length → 413 before the body is allocated
        from trajsde_tpu import httpd as _httpd

        req = urllib.request.Request(
            f"{base}/predict", data=b"x",
            headers={"Content-Length": str(_httpd.MAX_BODY_BYTES + 1)},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 413
        # a VALID npz holding a malformed scene is the client's error too
        # (submit() validates synchronously → 400, not 500)
        buf = io.BytesIO()
        np.savez(buf, not_a_scene=np.zeros(3))
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert post_scene(0)["agent_pi"]  # still serving after errors
    finally:
        server.shutdown()
        eng.close()


@pytest.mark.slow
def test_serve_cli_batch_and_daemon(tmp_path, rng):
    from test_cli import ENV, _make_config, _make_data

    _make_data(tmp_path, rng)
    cfg = _make_config(tmp_path)

    # train one epoch to get a checkpoint
    r = subprocess.run(
        [sys.executable, "train.py", "-c", cfg, "-n", "srv", "--epochs", "1",
         "--logdir", str(tmp_path / "logs")],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    ckpt = str(tmp_path / "logs" / "srv" / "checkpoints" / "step_00000002")

    in_dir = str(tmp_path / "data" / "nuScenes" / "val")
    out_dir = str(tmp_path / "preds")
    r = subprocess.run(
        [sys.executable, "serve.py", "-c", cfg, "--ckpt", ckpt,
         "--input-dir", in_dir, "--output-dir", out_dir,
         "--num-actors", "6", "--num-lanes", "8", "--max-batch", "4"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    assert stats["served"] == 4
    preds = sorted(os.listdir(out_dir))
    assert len(preds) == 4
    d = np.load(os.path.join(out_dir, preds[0]))
    assert d["agent_world"].shape[-1] == 2 and np.isfinite(d["agent_world"]).all()

    # --ood batch mode: every prediction additionally carries the paper's
    # OOD scores (per-actor ensemble stds + the focal scalar)
    out_ood = str(tmp_path / "preds_ood")
    r = subprocess.run(
        [sys.executable, "serve.py", "-c", cfg, "--ckpt", ckpt,
         "--input-dir", in_dir, "--output-dir", out_ood,
         "--num-actors", "6", "--num-lanes", "8", "--max-batch", "4",
         "--ood"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    d = np.load(os.path.join(out_ood, sorted(os.listdir(out_ood))[0]))
    assert d["ood_std"].shape == (6,) and np.isfinite(d["ood_std"]).all()
    # stochastic-ensemble stds are strictly positive for a real agent
    assert float(d["agent_std"]) > 0

    # daemon mode: two requests over stdin
    reqs = "".join(
        json.dumps({"id": f"r{i}", "npz": os.path.join(in_dir, f"s{i}.npz")}) + "\n"
        for i in range(2)
    )
    r = subprocess.run(
        [sys.executable, "serve.py", "-c", cfg, "--ckpt", ckpt, "--daemon",
         "--output-dir", str(tmp_path / "preds2"),
         "--num-actors", "6", "--num-lanes", "8"],
        input=reqs, env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()]
    replies = [l for l in lines if "id" in l]
    assert {l["id"] for l in replies} == {"r0", "r1"}
    for l in replies:
        assert os.path.exists(l["out"])

    # INTERACTIVE request/response: the client waits for each reply before
    # sending the next request (and before closing stdin) — replies must
    # flush as futures land, not when the next stdin line arrives; a
    # malformed request answers {id, error} and the daemon keeps serving
    p = subprocess.Popen(
        [sys.executable, "serve.py", "-c", cfg, "--ckpt", ckpt, "--daemon",
         "--output-dir", str(tmp_path / "preds3"),
         "--num-actors", "6", "--num-lanes", "8", "--max-wait-ms", "50"],
        env=ENV, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, bufsize=1,
    )
    try:
        def rpc(req):
            p.stdin.write(json.dumps(req) + "\n")
            p.stdin.flush()
            return json.loads(p.stdout.readline())

        r1 = rpc({"id": "x", "npz": os.path.join(in_dir, "s0.npz")})
        assert r1["id"] == "x" and os.path.exists(r1["out"])
        rbad = rpc({"id": "y", "npz": str(tmp_path / "missing.npz")})
        assert "error" in rbad
        r2 = rpc({"id": "z", "npz": os.path.join(in_dir, "s1.npz")})
        assert r2["id"] == "z" and os.path.exists(r2["out"])
    finally:
        p.stdin.close()
        p.wait(timeout=120)

    # sharded KERNEL engine e2e: --shard --engine kernel shard_maps the
    # Pallas rollout over the flattened row axis (interpret mode + explicit
    # noise on CPU → must reproduce the unsharded kernel run exactly)
    out_k = str(tmp_path / "preds_kernel")
    out_ks = str(tmp_path / "preds_kernel_shard")
    for extra, kout in ((["--engine", "kernel"], out_k),
                        (["--engine", "kernel", "--shard"], out_ks)):
        r = subprocess.run(
            [sys.executable, "serve.py", "-c", cfg, "--ckpt", ckpt,
             "--input-dir", in_dir, "--output-dir", kout,
             "--num-actors", "6", "--num-lanes", "8", "--max-batch", "4",
             *extra],
            env=ENV, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
    for f in sorted(os.listdir(out_ks)):
        a, b = np.load(os.path.join(out_ks, f)), np.load(os.path.join(out_k, f))
        np.testing.assert_allclose(a["agent_world"], b["agent_world"], atol=1e-4)
        np.testing.assert_allclose(a["loc"], b["loc"], atol=1e-5)

    # export the pipeline, then serve from the artifact with NO config or
    # checkpoint; long batching window on both runs so the micro-batcher
    # groups identically (grouping changes the key stream)
    art = str(tmp_path / "artifact")
    r = subprocess.run(
        [sys.executable, "serve.py", "-c", cfg, "--ckpt", ckpt,
         "--input-dir", in_dir, "--output-dir", str(tmp_path / "unused"),
         "--num-actors", "6", "--num-lanes", "8", "--max-batch", "4",
         "--export", art],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["buckets"] == [1, 2, 4]

    out_ref = str(tmp_path / "preds_ref")
    out_exp = str(tmp_path / "preds_exp")
    for extra, out_dir2 in (
        (["-c", cfg, "--ckpt", ckpt, "--num-actors", "6", "--num-lanes", "8"],
         out_ref),
        (["--from-export", art], out_exp),
    ):
        r = subprocess.run(
            [sys.executable, "serve.py", *extra, "--input-dir", in_dir,
             "--output-dir", out_dir2, "--max-batch", "4",
             "--max-wait-ms", "20000"],
            env=ENV, capture_output=True, text=True, timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
    for f in sorted(os.listdir(out_exp)):
        a, b = np.load(os.path.join(out_exp, f)), np.load(os.path.join(out_ref, f))
        np.testing.assert_allclose(a["agent_world"], b["agent_world"], atol=1e-4)


def test_json_ready_handles_bf16():
    """bf16 model outputs (the production dtype recipe) must serialize:
    ml_dtypes scalars are not json-encodable without the float32 cast."""
    import json

    import jax.numpy as jnp

    from trajsde_tpu.httpd import _json_ready

    out = _json_ready(
        {
            "loc": np.asarray(jnp.ones((2, 3), jnp.bfloat16)),
            "pi": np.float32([0.5, 0.5]),
            "seq_id": np.int32(7),
        }
    )
    s = json.loads(json.dumps(out))
    assert s["seq_id"] == 7 and s["loc"][0][0] == 1.0
