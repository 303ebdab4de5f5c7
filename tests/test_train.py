"""Training-step tests: loss decreases, metrics flow, multi-device sharding."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np
import optax

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.losses import diff_bce_loss, l2_loss
from trajsde_tpu.parallel import mesh as mesh_lib
from trajsde_tpu.train.loop import (
    Trainer,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from trajsde_tpu.train.metrics import make_metrics

from tests.test_models_forward import make_baseline, make_sde

B, A, L = 4, 8, 12


def _scene(rng, batch=B):
    return make_scene_batch(rng, batch_size=batch, num_actors=A, num_lanes=L, sources=[0, 1])


@pytest.mark.slow
def test_sde_train_step_decreases_loss(rng):
    scene = _scene(rng)
    model = make_sde()
    opt = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, opt, scene)
    losses = [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)]
    step = make_train_step(model, opt, losses, donate=False)
    state, logs0 = step(state, scene)
    for _ in range(8):
        state, logs = step(state, scene)
    assert float(logs["train/total"]) < float(logs0["train/total"])
    assert np.isfinite(float(logs["train/L2"]))
    assert np.isfinite(float(logs["train/DiffBCE"]))


@pytest.mark.slow
def test_grads_flow_to_all_params(rng):
    """Every parameter that the shipped config trains must receive gradient."""
    scene = _scene(rng)
    model = make_sde()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)

    def loss_fn(params):
        out = model.apply(
            {"params": params}, scene, deterministic=False,
            rngs={"sde": jax.random.key(1), "dropout": jax.random.key(2)},
        )
        return l2_loss(out["y"], out) + diff_bce_loss(out["y"], out)

    grads = jax.grad(loss_fn)(state.params)
    zero_paths = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
        if float(jnp.abs(g).max()) == 0.0
    ]
    # parity: with the shipped L2+DiffBCE losses the reference also leaves
    # the mode-score (pi) and scale heads untrained (SURVEY §2.7 — no loss
    # consumes them); everything else must receive gradient
    for path in zero_paths:
        assert ("pi_" in path) or ("scale_" in path), f"dead param: {path}"


def test_eval_step_and_metrics(rng):
    scene = _scene(rng)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    metrics = make_metrics(
        ["ADE_T", "FDE_T", "MR_T"],
        [{"dataset": "nuScenes", "end_idcs": [59, 29]}] * 3,
    )
    eval_step = make_eval_step(model, metrics)
    contribs = eval_step(state.params, scene, jax.random.key(0), np.int32(0))
    for m in metrics:
        m.accumulate(contribs[m.name])
        value = m.compute()
        assert np.isfinite(value)
    assert metrics[0].compute() > 0


@pytest.mark.slow
def test_sharded_train_step_8dev(rng):
    """Full DP train step over an 8-device mesh (virtual CPU devices)."""
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    scene = _scene(rng, batch=8)
    scene = mesh_lib.shard_batch(scene, mesh)
    model = make_sde()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    state = jax.device_put(state, mesh_lib.replicated(mesh))
    losses = [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)]
    step = make_train_step(model, opt, losses, donate=False)
    new_state, logs = step(state, scene)
    assert np.isfinite(float(logs["train/total"]))
    # params stay replicated; grads were psum'd across the data axis
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_trainer_fit_one_epoch(rng, tmp_path):
    scene = _scene(rng)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    metrics = make_metrics(
        ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}]
    )
    from trajsde_tpu.train.checkpoint import CheckpointManager
    from trajsde_tpu.train.logging import ExperimentLogger

    trainer = Trainer(
        model=model,
        optimizer=opt,
        losses=[("L2", 1.0, l2_loss)],
        metrics=metrics,
        logger=ExperimentLogger(str(tmp_path / "logs"), use_tensorboard=False),
        checkpointer=CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2),
        monitor="ADE_T",
    )
    state = trainer.fit(
        state,
        train_batches=lambda: [scene, scene],
        val_batches=lambda: [scene],
        max_epochs=2,
    )
    assert trainer.checkpointer.best() is not None
    restored = trainer.checkpointer.restore(state)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_monitor_typo_raises(rng, tmp_path):
    """A monitor name that matches no registered metric must fail at
    fit() entry — otherwise every checkpoint saves with metric=None and
    the pruner can destroy the real best."""
    import pytest

    from trajsde_tpu.train.checkpoint import CheckpointManager

    scene = _scene(rng)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    metrics = make_metrics(
        ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}]
    )
    trainer = Trainer(
        model=model,
        optimizer=opt,
        losses=[("L2", 1.0, l2_loss)],
        metrics=metrics,
        checkpointer=CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2),
        monitor="ADE",  # typo: the metric is ADE_T
    )
    with pytest.raises(ValueError, match="not a registered metric"):
        trainer.fit(
            state,
            train_batches=lambda: [scene],
            val_batches=lambda: [scene],
            max_epochs=1,
        )


@pytest.mark.slow
def test_preemption_mid_eval_saves_unscored(rng, tmp_path):
    """SIGTERM during the val pass → the eval loop stops early and the
    emergency checkpoint saves UNSCORED (partial metrics must not enter
    the leaderboard as a real monitor value)."""
    import os
    import signal

    from trajsde_tpu.train.checkpoint import CheckpointManager

    scene = _scene(rng)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    metrics = make_metrics(
        ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}]
    )
    trainer = Trainer(
        model=model,
        optimizer=opt,
        losses=[("L2", 1.0, l2_loss)],
        metrics=metrics,
        checkpointer=CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2),
        monitor="ADE_T",
    )

    def val_then_sigterm():
        yield scene
        os.kill(os.getpid(), signal.SIGTERM)
        yield scene
        yield scene

    out = trainer.fit(
        state,
        train_batches=lambda: [scene],
        val_batches=val_then_sigterm,
        max_epochs=3,
    )
    assert trainer._preempted
    assert int(out.step) == 1  # epoch 1 trained; nothing after the signal
    entry = trainer.checkpointer.latest()
    assert entry is not None and entry["metric"] is None
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL


@pytest.mark.slow
def test_training_is_deterministic(rng):
    """Fixed seeds ⇒ bit-identical parameters after several steps."""
    scene = _scene(rng)
    model = make_sde()
    opt = optax.adamw(1e-3)
    losses = [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)]

    def run():
        state = create_train_state(model, opt, scene, seed=7)
        step = make_train_step(model, opt, losses, donate=False)
        for _ in range(3):
            state, _ = step(state, scene)
        return state.params

    p1, p2 = run(), run()
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_preemption_saves_and_returns(rng, tmp_path):
    """SIGTERM mid-epoch → in-flight step completes, an emergency
    checkpoint lands (kept by the pruner), fit returns cleanly, and a
    resume continues from the saved step."""
    import os
    import signal

    scene = _scene(rng)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    metrics = make_metrics(
        ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}]
    )
    from trajsde_tpu.train.checkpoint import CheckpointManager

    trainer = Trainer(
        model=model,
        optimizer=opt,
        losses=[("L2", 1.0, l2_loss)],
        metrics=metrics,
        checkpointer=CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2),
        monitor="ADE_T",
    )

    def batches_then_sigterm():
        yield scene
        os.kill(os.getpid(), signal.SIGTERM)  # caught by the trainer's handler
        yield scene
        yield scene

    out = trainer.fit(
        state,
        train_batches=batches_then_sigterm,
        val_batches=lambda: [scene],
        max_epochs=5,
    )
    # the prefetcher pulls ahead, so the signal lands while step 1's data
    # is in flight: step 1 completes, nothing after it runs
    assert int(out.step) == 1
    assert trainer._preempted
    entry = trainer.checkpointer.latest()
    assert entry is not None and entry["metric"] is None
    # default handlers are restored on exit
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    restored = trainer.checkpointer.restore(out)
    assert int(restored.step) == 1
    # fit() must clear the stale preemption flag itself on entry
    resumed = trainer.fit(
        restored,
        train_batches=lambda: [scene],
        val_batches=lambda: [scene],
        max_epochs=1,
    )
    assert int(resumed.step) == 2


@pytest.mark.slow
def test_chained_step_matches_sequential(rng):
    """chain_steps=C scans C FULL optimizer updates in one dispatch; the
    parameters must equal C sequential single-step calls exactly — the
    key stream is identical (each inner update splits state.key the same
    way), so this is the same math with C× fewer dispatches."""
    from tests.test_models_forward import make_baseline

    model = make_baseline()
    b1 = make_scene_batch(
        np.random.default_rng(5), batch_size=2, num_actors=6, num_lanes=8, sources=[0, 1]
    )
    b2 = make_scene_batch(
        np.random.default_rng(6), batch_size=2, num_actors=6, num_lanes=8, sources=[0, 1]
    )
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, b1)
    step1 = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)
    step_c = make_train_step(
        model, opt, [("L2", 1.0, l2_loss)], donate=False, chain_steps=2
    )

    s_seq, l1 = step1(state, b1)
    s_seq, l2 = step1(s_seq, b2)

    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), b1, b2)
    s_chn, lc = step_c(state, stacked)

    np.testing.assert_allclose(
        float(lc["train/total"]),
        (float(l1["train/total"]) + float(l2["train/total"])) / 2.0,
        rtol=1e-6,
    )
    assert int(s_chn.step) == int(s_seq.step) == 2
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_seq.params)[0],
        jax.tree_util.tree_flatten_with_path(s_chn.params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch(rng):
    """accum_steps=2 over two stacked half-batches must produce the SAME
    parameters as one step on the concatenated batch: with equal micro
    sizes the mean of the micro-mean-loss grads IS the full-batch
    mean-loss grad.  Dropout is 0 so the comparison is exact up to
    reassociation (SGD ⇒ the param delta is lr·grad)."""
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import MLPDecoder
    from trajsde_tpu.models.local_encoder import LocalEncoder
    from trajsde_tpu.models.prediction import PredictionModel
    from tests.test_models_forward import TH, TF, D, K

    model = PredictionModel(
        encoder=LocalEncoder(historical_steps=TH, embed_dim=D, num_heads=4, dropout=0.0),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=K, num_heads=4, dropout=0.0
        ),
        decoder=MLPDecoder(
            local_channels=D, global_channels=D, future_steps=TF, num_modes=K
        ),
    )
    full = make_scene_batch(
        np.random.default_rng(3), batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1]
    )
    half = lambda sl: jax.tree.map(lambda x: x[sl], full)
    micro = jax.tree.map(
        lambda *xs: jnp.stack(xs), half(slice(0, 4)), half(slice(4, 8))
    )

    opt = optax.sgd(0.1)
    state = create_train_state(model, opt, full)
    step_full = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)
    step_acc = make_train_step(
        model, opt, [("L2", 1.0, l2_loss)], donate=False, accum_steps=2
    )

    # NOTE: the WTA loss is a masked mean, so the accumulated objective is
    # the MEAN OF THE MICRO LOSSES (exactly Lightning's
    # accumulate_grad_batches semantics), which differs from the
    # full-batch masked mean when micro mask counts differ.  The exact
    # invariant: with SGD, the accumulated param delta is the average of
    # the two half-batch deltas.
    s1, l1 = step_full(state, half(slice(0, 4)))
    s2, l2 = step_full(state, half(slice(4, 8)))
    acc_state, acc_logs = step_acc(state, micro)

    np.testing.assert_allclose(
        float(acc_logs["train/total"]),
        (float(l1["train/total"]) + float(l2["train/total"])) / 2.0,
        rtol=1e-5,
    )
    for (path, p0), (_, a1), (_, a2), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(s1.params)[0],
        jax.tree_util.tree_flatten_with_path(s2.params)[0],
        jax.tree_util.tree_flatten_with_path(acc_state.params)[0],
    ):
        want = np.asarray(p0) + (
            (np.asarray(a1) - np.asarray(p0)) + (np.asarray(a2) - np.asarray(p0))
        ) / 2.0
        np.testing.assert_allclose(
            np.asarray(b), want, rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    assert int(acc_state.step) == 1  # k micro batches = ONE optimizer step


def test_group_microbatches_buckets_and_partials(rng):
    """Host-side grouping: same-shape batches stack together (bucket-mode
    loaders emit mixed (A, L) shapes), the trailing partial group still
    trains, and numpy leaves stack host-side (no device dispatch)."""
    from trajsde_tpu.train.loop import group_microbatches

    def scene(actors):
        return make_scene_batch(
            np.random.default_rng(actors), batch_size=4, num_actors=actors,
            num_lanes=8, sources=[0, 1],
        )

    stream = [scene(6), scene(8), scene(6), scene(6)]  # shapes: A=6 ×3, A=8 ×1
    groups = list(group_microbatches(iter(stream), 2))
    shapes = sorted(tuple(g.x.shape) for g in groups)
    # A=6: one full pair + nothing left over... 3 batches → [2,...] + [1,...]
    # A=8: a single partial [1,...]
    assert shapes == sorted(
        [(2, 4, 6) + stream[0].x.shape[2:], (1, 4, 6) + stream[0].x.shape[2:],
         (1, 4, 8) + stream[1].x.shape[2:]]
    )
    total_micro = sum(g.x.shape[0] for g in groups)
    assert total_micro == len(stream)  # nothing dropped

    # lane buckets vary INDEPENDENTLY of actor buckets: same A, different L
    # must NOT group together (the key covers every leaf shape)
    def lane_scene(lanes):
        return make_scene_batch(
            np.random.default_rng(lanes), batch_size=4, num_actors=6,
            num_lanes=lanes, sources=[0, 1],
        )

    mixed = [lane_scene(8), lane_scene(16), lane_scene(8), lane_scene(16)]
    lane_groups = list(group_microbatches(iter(mixed), 2))
    assert sorted(g.lane_positions.shape[:3] for g in lane_groups) == [
        (2, 4, 8), (2, 4, 16)
    ]


@pytest.mark.slow
def test_compiled_shape_count_bounded_under_bucketing_and_accum(rng):
    """Executable-count bound (VERDICT r2 item #9): streaming mixed bucket
    shapes through ``group_microbatches`` + the accumulated train step must
    compile at most ``n_buckets × 2`` variants (one full-K group plus at
    most one partial trailing group per bucket) — and a second epoch of the
    same stream must add ZERO new executables."""
    from trajsde_tpu.train.loop import group_microbatches

    def scene(actors, seed):
        return make_scene_batch(
            np.random.default_rng(seed), batch_size=2, num_actors=actors,
            num_lanes=8, sources=[0, 1],
        )

    # two actor buckets, 3 batches each → per bucket: one K=2 group + one
    # K=1 partial
    def epoch_stream():
        return iter(
            [scene(4, 0), scene(6, 1), scene(4, 2), scene(6, 3), scene(4, 4),
             scene(6, 5)]
        )

    model = make_baseline()
    opt = optax.sgd(0.1)
    state = create_train_state(model, opt, scene(4, 0))
    step = make_train_step(
        model, opt, [("L2", 1.0, l2_loss)], donate=False, accum_steps=2
    )

    for group in group_microbatches(epoch_stream(), 2):
        state, _ = step(state, group)
    n_buckets = 2
    first_epoch = step._cache_size()
    assert first_epoch <= n_buckets * 2, (
        f"{first_epoch} compiled executables for {n_buckets} buckets"
    )

    for group in group_microbatches(epoch_stream(), 2):
        state, _ = step(state, group)
    assert step._cache_size() == first_epoch, "second epoch recompiled"
