"""Wire-format batch tests: pack/unpack exactness, step equivalence.

The wire format (``data/wire.py``) packs a host ``SceneBatch`` into one
flat buffer per dtype before the device transfer; the jitted steps
relayout in-trace.  Exactness is the whole contract: bytes move, values
never change.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from trajsde_tpu.data.scene import SceneBatch, strip_for_device
from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.data.wire import WireBatch, pack_wire, unpack_if_wire, unpack_wire
from trajsde_tpu.losses import l2_loss
from trajsde_tpu.parallel import mesh as mesh_lib
from trajsde_tpu.train.loop import (
    Trainer,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from trajsde_tpu.train.metrics import make_metrics

from tests.test_models_forward import make_baseline


def _np_scene(seed=0, batch=2, actors=6, lanes=8) -> SceneBatch:
    scene = make_scene_batch(
        np.random.default_rng(seed),
        batch_size=batch,
        num_actors=actors,
        num_lanes=lanes,
        sources=[0, 1],
    )
    return jax.tree.map(np.asarray, scene)


def _assert_scene_equal(a: SceneBatch, b: SceneBatch):
    for name in SceneBatch.__dataclass_fields__:
        if name in ("spec",):
            continue
        va, vb = getattr(a, name), getattr(b, name)
        if va is None or vb is None:
            assert va is None and vb is None, name
            continue
        va, vb = np.asarray(va), np.asarray(vb)
        assert va.dtype == vb.dtype, name
        assert va.shape == vb.shape, name
        np.testing.assert_array_equal(va, vb, err_msg=name)


def test_pack_unpack_roundtrip_bitwise():
    scene = _np_scene()
    wire = pack_wire(scene)
    # one buffer per dtype: float32 + bool + int32 = 3 transfers, not ~15
    assert len(jax.tree.leaves(wire)) <= 3
    assert wire.lead_shape == (2,)
    back = jax.jit(unpack_wire)(wire)
    _assert_scene_equal(back, scene)


def test_pack_unpack_with_none_fields():
    scene = strip_for_device(_np_scene(seed=1))  # drops goal_idcs/has_goal
    scene = scene.replace(seq_id=None)
    back = jax.jit(unpack_wire)(pack_wire(scene))
    assert back.goal_idcs is None and back.has_goal is None
    assert back.seq_id is None
    _assert_scene_equal(back, scene)


def test_pack_unpack_inline_threshold():
    """inline_min_bytes leaves big fields native and packs the small
    tail; roundtrip stays bitwise and lead_shape still tracks group
    stacking."""
    scene = _np_scene(seed=9)
    big = max(np.asarray(x).nbytes for x in jax.tree.leaves(scene))
    wire = pack_wire(scene, inline_min_bytes=big)  # exactly one inline field
    assert len(wire.inline) >= 1
    assert wire.lead_shape == (2,)
    _assert_scene_equal(jax.jit(unpack_wire)(wire), scene)
    # stacking adds a lead axis to inline AND packed arrays alike
    stacked = jax.tree.map(lambda a, b: np.stack([a, b]), wire, wire)
    assert stacked.lead_shape == (2, 2)
    back = unpack_wire(stacked)
    _assert_scene_equal(jax.tree.map(lambda x: np.asarray(x[1]), back), scene)


def test_unpack_if_wire_passthrough():
    scene = _np_scene(seed=2)
    assert unpack_if_wire(scene) is scene


def test_device_prefetch_passes_prepacked_wirebatch_through():
    # ADVICE r4: a caller yielding a host-side (numpy) WireBatch must not
    # be mistaken for a SceneBatch and stripped (AttributeError on .x) —
    # the isinstance(item, SceneBatch) guard routes it straight to
    # device_put.  Pin that contract.
    from trajsde_tpu.train.loop import device_prefetch

    scene = strip_for_device(_np_scene(seed=3))
    wire = pack_wire(scene)
    assert all(isinstance(b, np.ndarray) for b in jax.tree.leaves(wire))
    out = list(device_prefetch(iter([wire, wire]), wire=True))
    assert len(out) == 2
    for item in out:
        assert isinstance(item, WireBatch)
        _assert_scene_equal(unpack_wire(item), scene)


def test_wire_survives_group_stacking():
    """group_microbatches np.stacks wire batches like plain ones: unpack
    must rebuild the grouped [K, B, ...] field shapes (spec offsets are
    per-scene, so a new leading axis costs nothing)."""
    s1, s2 = _np_scene(seed=3), _np_scene(seed=4)
    w1, w2 = pack_wire(s1), pack_wire(s2)
    stacked = jax.tree.map(lambda a, b: np.stack([a, b]), w1, w2)
    assert stacked.lead_shape == (2, 2)
    back = unpack_wire(stacked)
    _assert_scene_equal(
        jax.tree.map(lambda x: np.asarray(x[0]), back), s1
    )
    _assert_scene_equal(
        jax.tree.map(lambda x: np.asarray(x[1]), back), s2
    )
    # and packing an already-grouped batch lands on the same layout
    grouped = jax.tree.map(lambda a, b: np.stack([a, b]), s1, s2)
    _assert_scene_equal(unpack_wire(pack_wire(grouped)), grouped)


def test_wire_train_step_matches_plain(rng):
    """The jitted step must produce bit-identical parameters from a wire
    batch and its unpacked original (same key stream, same math)."""
    scene = _np_scene(seed=5)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    step = make_train_step(model, opt, [("L2", 1.0, l2_loss)], donate=False)

    s_plain, l_plain = step(state, scene)
    s_wire, l_wire = step(state, pack_wire(scene))

    assert float(l_plain["train/total"]) == float(l_wire["train/total"])
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_plain.params)[0],
        jax.tree_util.tree_flatten_with_path(s_wire.params)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(path)
        )


def test_wire_eval_step_matches_plain(rng):
    scene = _np_scene(seed=6)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    metrics = make_metrics(
        ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}]
    )
    ev = make_eval_step(model, metrics)
    key = jax.random.key(7)
    c_plain = ev(state.params, scene, key, np.int32(0))
    c_wire = ev(state.params, pack_wire(scene), key, np.int32(0))
    for name in c_plain:
        for a, b in zip(
            jax.tree.leaves(c_plain[name]), jax.tree.leaves(c_wire[name])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wire_shards_along_scene_axis():
    """shard_batch is pytree-generic: wire buffers [B, per_scene] shard
    over the data axis exactly like the unpacked fields."""
    assert len(jax.devices()) == 8
    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    scene = _np_scene(seed=7, batch=8)
    wire = mesh_lib.shard_batch(pack_wire(scene), mesh)
    for leaf in jax.tree.leaves(wire):
        assert not leaf.sharding.is_fully_replicated
    _assert_scene_equal(jax.jit(unpack_wire)(wire), scene)


@pytest.mark.slow
def test_trainer_fit_wire_end_to_end(rng, tmp_path):
    """Trainer(wire=True) routes host batches through pack_wire inside
    device_prefetch; fit + evaluate must work and reproduce the plain
    run's parameters bit-for-bit."""
    scene = _np_scene(seed=8, batch=4)
    model = make_baseline()
    opt = optax.adamw(1e-3)

    def fit(wire):
        # fresh state per run: the Trainer's jitted step donates its
        # input state, so a shared one would be consumed by the first fit
        state0 = create_train_state(model, opt, scene)
        metrics = make_metrics(
            ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [59, 29]}]
        )
        trainer = Trainer(
            model=model,
            optimizer=opt,
            losses=[("L2", 1.0, l2_loss)],
            metrics=metrics,
            monitor="ADE_T",
            wire=wire,
        )
        return trainer.fit(
            state0,
            train_batches=lambda: [scene, scene],
            val_batches=lambda: [scene],
            max_epochs=1,
        )

    s_plain, s_wire = fit(False), fit(True)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_plain.params)[0],
        jax.tree_util.tree_flatten_with_path(s_wire.params)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(path)
        )
