"""Distribution semantics: sharded == unsharded results, checkpoint best-k,
NaN-guard failure detection."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.losses import l2_loss
from trajsde_tpu.parallel import mesh as mesh_lib
from trajsde_tpu.train.loop import TrainState, create_train_state, make_eval_step, make_train_step
from trajsde_tpu.train.metrics import make_metrics

from tests.test_models_forward import make_baseline


def test_sharded_eval_matches_unsharded(rng):
    """Metric (sum, count) must be identical under data-parallel sharding —
    the torchmetrics dist_reduce_fx='sum' equivalence (SURVEY §2.9)."""
    scene = make_scene_batch(rng, batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1])
    model = make_baseline()
    state = create_train_state(model, optax.adamw(1e-3), scene)
    metrics = make_metrics(
        ["ADE_T", "FDE_T", "MR_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}] * 3
    )
    eval_step = make_eval_step(model, metrics)
    plain = eval_step(state.params, scene, jax.random.key(0), np.int32(0))

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    sharded_scene = mesh_lib.shard_batch(scene, mesh)
    sharded_params = jax.device_put(state.params, mesh_lib.replicated(mesh))
    sharded = eval_step(sharded_params, sharded_scene, jax.random.key(0), np.int32(0))
    for name in ("ADE_T", "FDE_T", "MR_T"):
        np.testing.assert_allclose(
            np.asarray(plain[name][0]), np.asarray(sharded[name][0]), rtol=1e-5
        )
        assert int(plain[name][1]) == int(sharded[name][1])


@pytest.mark.slow
def test_sharded_train_step_matches_unsharded(rng):
    """One gradient step over the 8-device mesh must produce the SAME
    parameters as the unsharded step — the DDP-allreduce equivalence for
    training (VERDICT r1 item 6)."""
    scene = make_scene_batch(rng, batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1])
    model = make_baseline()
    # SGD so the param delta IS lr·grad: AdamW's sign normalization would
    # amplify f32 reduction-order noise on near-zero grads to ~5% and the
    # test would measure the optimizer, not the psum
    opt = optax.sgd(0.1)
    state = create_train_state(model, opt, scene)
    step = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)

    plain_state, plain_logs = step(state, scene)

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    sh_scene = mesh_lib.shard_batch(scene, mesh)
    sh_state = jax.device_put(state, mesh_lib.replicated(mesh))
    sh_new, sh_logs = step(sh_state, sh_scene)

    np.testing.assert_allclose(
        float(plain_logs["train/total"]), float(sh_logs["train/total"]), rtol=1e-5
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(plain_state.params)[0],
        jax.tree_util.tree_flatten_with_path(sh_new.params)[0],
    ):
        # rtol: the 8-way psum sums 8 per-shard partials where the unsharded
        # step sums all 1536 rows in one order; on leaves whose grads are
        # O(100) sums of near-cancelling LN-backward terms the f32
        # reassociation noise alone reaches ~1e-4 relative (measured
        # max 1.1e-4), so the bound is 5e-4 — still 100× below any real
        # gradient-averaging bug
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_init_multihost_single_process_noop(monkeypatch):
    """Single-process entry is a no-op (the same CLI works everywhere)."""
    monkeypatch.delenv("TRAJSDE_COORDINATOR", raising=False)
    monkeypatch.delenv("TRAJSDE_NUM_PROCESSES", raising=False)
    assert mesh_lib.init_multihost() == 1
    assert mesh_lib.init_multihost(num_processes=1) == 1


@pytest.mark.slow
def test_multihost_two_process_grads_match(tmp_path):
    """REAL multi-process execution (VERDICT r2 item #5): two localhost CPU
    processes join via ``jax.distributed.initialize`` (through
    ``init_multihost``), build one GLOBAL 4-device mesh, and compute
    sharded baseline-model gradients that must match each process's own
    single-host gradients.  The reference gets this from Lightning DDP
    (``/root/reference/train.py:35``)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            assert p.returncode == 0, err.decode()[-3000:]
    finally:
        # one worker timing out / failing must not leave its sibling
        # blocked at a coordination barrier holding the port and a CPU
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i in range(2):
        with open(os.path.join(str(tmp_path), f"proc{i}.json")) as f:
            r = json.load(f)
        assert r["process_count"] == 2
        assert r["device_count"] == 4
        assert r["local_device_count"] == 2
        # psum reassociation noise only (same bound as the in-process test)
        assert r["maxrel"] < 5e-4, r


def test_nan_guard_skips_bad_step(rng):
    """A poisoned batch must not corrupt parameters."""
    scene = make_scene_batch(rng, batch_size=2, num_actors=6, num_lanes=8)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    step = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)

    import dataclasses

    bad = dataclasses.replace(scene, x=scene.x.at[0, 0, 0, 0].set(jnp.nan))
    p0 = jax.tree.leaves(state.params)[0].copy()
    new_state, logs = step(state, bad)
    assert float(logs["train/step_skipped"]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(new_state.params)[0]), np.asarray(p0)
    )
    # a clean batch still trains
    new_state, logs = step(new_state, scene)
    assert float(logs["train/step_skipped"]) == 0.0
    assert not np.allclose(
        np.asarray(jax.tree.leaves(new_state.params)[0]), np.asarray(p0)
    )


def test_checkpoint_best_k_pruning(tmp_path, rng):
    from trajsde_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), save_top_k=2, mode="min")
    state = TrainState(
        params={"w": jnp.ones(3)}, opt_state={}, step=jnp.int32(0), key=jax.random.key(0)
    )
    for step, metric in [(1, 5.0), (2, 3.0), (3, 4.0), (4, 1.0)]:
        mgr.save(state.replace(step=jnp.int32(step)), metric=metric, step=step)
    best = mgr.best()
    assert best["metric"] == 1.0
    kept = {e["step"] for e in mgr._board}
    assert 4 in kept and 2 in kept and 1 not in kept  # top-2 = metrics 1.0, 3.0


@pytest.mark.slow
def test_zero1_optimizer_sharding_matches_replicated(rng):
    """ZeRO-1: Adam moments sharded over the data axis must produce the
    SAME parameters as the fully replicated step — the layouts change the
    collective schedule (reduce-scatter/all-gather), not the math."""
    scene = make_scene_batch(rng, batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1])
    model = make_baseline()
    opt = optax.adamw(1e-3, weight_decay=1e-4)
    state = create_train_state(model, opt, scene)
    step = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    sh_scene = mesh_lib.shard_batch(scene, mesh)

    # replicated baseline
    rep_state = jax.device_put(state, mesh_lib.replicated(mesh))
    rep_new, _ = step(rep_state, sh_scene)

    # ZeRO-1: params replicated, optimizer state sharded over `data`
    z_state = rep_state.replace(
        opt_state=mesh_lib.shard_opt_state(rep_state.opt_state, mesh)
    )
    sharded_leaves = [
        x for x in jax.tree.leaves(z_state.opt_state)
        if hasattr(x, "sharding") and x.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert sharded_leaves, "no optimizer-state tensor was actually partitioned"
    z_new, _ = step(z_state, sh_scene)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(rep_new.params)[0],
        jax.tree_util.tree_flatten_with_path(z_new.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )
    # the updated optimizer state keeps its ZeRO layout across steps
    z2, _ = step(z_new, sh_scene)
    still_sharded = [
        x for x in jax.tree.leaves(z2.opt_state)
        if hasattr(x, "sharding") and x.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert still_sharded, "ZeRO layout lost after one step"


def test_mesh_for_batch_uses_largest_dividing_device_count():
    """The data mesh takes the largest divisor of the batch that fits the
    host, not the gcd (batch 12 on 8 devices: 6 chips, not 4)."""
    assert mesh_lib.make_mesh_for_batch(12).shape[mesh_lib.DATA_AXIS] == 6
    assert mesh_lib.make_mesh_for_batch(8).shape[mesh_lib.DATA_AXIS] == 8
    assert mesh_lib.make_mesh_for_batch(7).shape[mesh_lib.DATA_AXIS] == 7
    assert mesh_lib.make_mesh_for_batch(3).shape[mesh_lib.DATA_AXIS] == 3
    assert mesh_lib.make_mesh_for_batch(13).shape[mesh_lib.DATA_AXIS] == 1
    assert mesh_lib.make_mesh_for_batch(48).shape[mesh_lib.DATA_AXIS] == 8


@pytest.mark.slow
def test_elastic_restore_across_mesh_sizes(rng, tmp_path):
    """Production elasticity: a ZeRO-1 checkpoint written from an 8-device
    mesh restores onto a 4-device mesh with its own sharded layouts —
    orbax reshards to the target on restore, so device-count changes
    between runs (resize, partial outage) don't invalidate checkpoints.
    The reference's Lightning/DDP checkpoints are rank-agnostic too; this
    proves the analog for the sharded-optimizer layout we add."""
    from trajsde_tpu.train.checkpoint import CheckpointManager

    scene = make_scene_batch(rng, batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1])
    model = make_baseline()
    opt = optax.adamw(1e-3, weight_decay=1e-4)
    step = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)

    mesh8 = mesh_lib.make_mesh(n_data=8, n_model=1)
    state = create_train_state(model, opt, scene)
    state = jax.device_put(state, mesh_lib.replicated(mesh8))
    state = state.replace(
        opt_state=mesh_lib.shard_opt_state(state.opt_state, mesh8)
    )
    state, _ = step(state, mesh_lib.shard_batch(scene, mesh8))
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, metric=1.0, step=1)
    mgr.wait()

    # fresh-process analog: a 4-device mesh target with its own layouts
    mesh4 = mesh_lib.make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    target = create_train_state(model, opt, scene)
    target = jax.device_put(target, mesh_lib.replicated(mesh4))
    target = target.replace(
        opt_state=mesh_lib.shard_opt_state(target.opt_state, mesh4)
    )
    restored = mgr.restore(target)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(restored.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    assert int(restored.step) == int(state.step)
    # the 4-device layout actually took (opt state sharded over mesh4) …
    resharded = [
        x for x in jax.tree.leaves(restored.opt_state)
        if hasattr(x, "sharding")
        and x.sharding.spec != jax.sharding.PartitionSpec()
    ]
    assert resharded, "restored optimizer state lost its ZeRO layout"
    assert all(len(x.sharding.device_set) == 4 for x in resharded)
    # … and the restored state trains on the smaller mesh
    new, logs = step(restored, mesh_lib.shard_batch(scene, mesh4))
    assert np.isfinite(float(logs["train/total"]))
    assert float(logs["train/step_skipped"]) == 0.0


@pytest.mark.slow
def test_accumulated_step_sharded_matches_replicated(rng):
    """Gradient accumulation under SPMD: a [K, B, ...] group sharded with
    batch_axis=1 (micro axis scanned locally, scenes over ``data``) must
    produce the same parameters as the replicated accumulated step."""
    scene = make_scene_batch(rng, batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1])
    group = jax.tree.map(lambda x: jnp.stack([x, x]), scene)  # [2, 8, ...]
    model = make_baseline()
    opt = optax.sgd(0.1)
    state = create_train_state(model, opt, scene)
    step = make_train_step(
        model, opt, [("L2", 1.0, l2_loss)], donate=False, accum_steps=2
    )

    plain, _ = step(state, group)

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    sh_group = mesh_lib.shard_batch(group, mesh, batch_axis=1)
    leaf = jax.tree.leaves(sh_group)[0]
    assert not leaf.sharding.is_fully_replicated  # scene axis actually sharded
    sh_state = jax.device_put(state, mesh_lib.replicated(mesh))
    sh_new, _ = step(sh_state, sh_group)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(plain.params)[0],
        jax.tree_util.tree_flatten_with_path(sh_new.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_async_checkpoint_round_trip(tmp_path):
    """async_save overlaps the orbax write; restore/next-save wait for the
    in-flight write, and pruning never deletes an unfinished checkpoint."""
    from trajsde_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), save_top_k=2, mode="min", async_save=True)
    state = TrainState(
        params={"w": jnp.arange(4.0)}, opt_state={}, step=jnp.int32(0),
        key=jax.random.key(0),
    )
    for step, metric in [(1, 5.0), (2, 3.0), (3, 1.0)]:
        mgr.save(state.replace(step=jnp.int32(step)), metric=metric, step=step)
    mgr.wait()
    best = mgr.best()
    assert best["metric"] == 1.0
    restored = mgr.restore(state, path=best["path"])
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))
    # pruned entry's directory is gone, kept ones exist
    import os
    kept = {e["step"] for e in mgr._board}
    assert kept == {2, 3}
    assert not os.path.exists(str(tmp_path / "step_00000001"))


def test_checkpoint_resave_replaces_stale_weights(tmp_path):
    """Rollback-resume: re-saving an existing step with different weights
    must overwrite the directory and rebind the board entry — the old
    behavior skipped the write and bound the new metric to stale weights."""
    from trajsde_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), save_top_k=3, mode="min")
    mk = lambda v: TrainState(
        params={"w": jnp.full(3, v)}, opt_state={}, step=jnp.int32(5),
        key=jax.random.key(0),
    )
    mgr.save(mk(1.0), metric=9.0, step=5)
    mgr.save(mk(2.0), metric=1.0, step=5)  # same step, better run, new weights
    assert [e for e in mgr._board if e["step"] == 5][0]["metric"] == 1.0
    assert sum(e["step"] == 5 for e in mgr._board) == 1  # no duplicate entry
    restored = mgr.restore(mk(0.0))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), 2.0)


def test_checkpoint_board_drops_missing_dirs(tmp_path):
    """Entries whose directories vanished (interrupted prune) are dropped
    at load so latest()/restore() never picks a deleted checkpoint."""
    import shutil

    from trajsde_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), save_top_k=3)
    st = TrainState(
        params={"w": jnp.ones(3)}, opt_state={}, step=jnp.int32(0),
        key=jax.random.key(0),
    )
    mgr.save(st.replace(step=jnp.int32(1)), metric=2.0, step=1)
    mgr.save(st.replace(step=jnp.int32(2)), metric=1.0, step=2)
    shutil.rmtree(mgr._path(2))  # simulate interrupted prune
    mgr2 = CheckpointManager(str(tmp_path), save_top_k=3)
    assert [e["step"] for e in mgr2._board] == [1]
    assert mgr2.latest()["step"] == 1


def test_restore_params_rejects_shape_mismatch(tmp_path):
    """--wonly warm start must refuse same-size-but-different-shape leaves
    instead of silently reshaping a transposed kernel."""
    import pytest as _pytest

    from trajsde_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path))
    st = TrainState(
        params={"w": jnp.ones((2, 6))}, opt_state={}, step=jnp.int32(0),
        key=jax.random.key(0),
    )
    mgr.save(st, metric=1.0, step=1)
    with _pytest.raises(ValueError, match="refusing to reinterpret"):
        mgr.restore_params({"w": jnp.zeros((6, 2))}, mgr._path(1))
    ok = mgr.restore_params({"w": jnp.zeros((2, 6))}, mgr._path(1))
    np.testing.assert_array_equal(np.asarray(ok["w"]), 1.0)
