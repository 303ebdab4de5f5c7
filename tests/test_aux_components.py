"""Tests for auxiliary components: ODE solvers, logqp KL, clustering,
ts_drop, leave_only_agent, viz, embeddings."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.data.transforms import leave_only_agent, ts_drop
from trajsde_tpu.ops.odeint import get_timesteps, odeint_euler, odeint_rk4
from trajsde_tpu.ops.sdeint import euler_maruyama_logqp
from trajsde_tpu.utils.clustering import cluster_and_rank, kmeans_endpoints


def test_odeint_euler_exponential_decay():
    ys = odeint_euler(lambda t, y: -y, jnp.ones((2, 3)), jnp.linspace(0, 1, 11))
    np.testing.assert_allclose(np.asarray(ys[-1]), 0.9**10, rtol=1e-5)


def test_odeint_rk4_beats_euler():
    ts = jnp.linspace(0, 1, 11)
    exact = np.exp(-1.0)
    e = float(odeint_euler(lambda t, y: -y, jnp.ones(()) [None], ts)[-1][0])
    r = float(odeint_rk4(lambda t, y: -y, jnp.ones(())[None], ts)[-1][0])
    assert abs(r - exact) < abs(e - exact) / 100


def test_get_timesteps_grids():
    ts_a = np.asarray(get_timesteps("Argoverse"))
    assert ts_a.shape == (50,) and ts_a[19] == 0.0
    ts_n = np.asarray(get_timesteps("nuScenes"))
    assert ts_n.shape == (16,) and ts_n[4] == 0.0


def test_logqp_zero_when_posterior_equals_prior():
    f = lambda t, y: 1.0 * (0.0 - y)
    h = f
    g = lambda t, y: jnp.full(y.shape[:-1] + (1,), 0.5)
    ys, kl = euler_maruyama_logqp(
        f, g, h, jnp.ones((8, 4)), jnp.linspace(0, 1, 11), jax.random.key(0)
    )
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-7)
    # distinct drifts ⇒ strictly positive KL
    _, kl2 = euler_maruyama_logqp(
        lambda t, y: f(t, y) + 1.0, g, h, jnp.ones((8, 4)),
        jnp.linspace(0, 1, 11), jax.random.key(0),
    )
    assert float(np.asarray(kl2).min()) > 0


def test_kmeans_and_ranking(rng):
    # two well-separated endpoint clusters, 3:1 mass
    t = np.linspace(0, 1, 10, dtype=np.float32)[None, :, None]
    a = np.tile(t * np.array([10.0, 0.0], np.float32), (6, 1, 1))
    b = np.tile(t * np.array([-10.0, 0.0], np.float32), (2, 1, 1))
    trajs = np.concatenate([a, b]) + rng.normal(0, 0.05, (8, 10, 2)).astype(np.float32)
    modes, probs = cluster_and_rank(trajs, k=2)
    assert probs[0] >= probs[1] and abs(probs[0] - 0.75) < 1e-6
    assert abs(modes[0, -1, 0] - 10.0) < 1.0

    assign, centers = kmeans_endpoints(jnp.asarray(trajs), jax.random.key(0), k=2)
    assert len(np.unique(np.asarray(assign))) == 2


def test_ts_drop_semantics(rng):
    scene = make_scene_batch(rng, batch_size=2, num_actors=6, num_lanes=8)
    dropped = ts_drop(scene, rate=0.9, key=jax.random.key(0))
    # the reference-step column is never dropped
    np.testing.assert_array_equal(
        np.asarray(dropped.padding_mask[:, :, 20]),
        np.asarray(scene.padding_mask[:, :, 20]),
    )
    # bos steps are never dropped
    bos = np.asarray(scene.bos_mask)
    pad_h = np.asarray(dropped.padding_mask)[:, :, :21]
    orig_h = np.asarray(scene.padding_mask)[:, :, :21]
    np.testing.assert_array_equal(pad_h[bos], orig_h[bos])
    # dropped steps zero the features and extend padding
    newly = pad_h & ~orig_h
    assert newly.any()
    assert np.all(np.asarray(dropped.x)[newly] == 0.0)


def test_leave_only_agent(rng):
    scene = make_scene_batch(rng, batch_size=3, num_actors=6, num_lanes=8)
    only = leave_only_agent(scene)
    assert only.x.shape == (3, 1, 21, 2)
    np.testing.assert_array_equal(np.asarray(only.agent_index), 0)
    for b in range(3):
        a = int(scene.agent_index[b])
        np.testing.assert_array_equal(
            np.asarray(only.x[b, 0]), np.asarray(scene.x[b, a])
        )


def test_viz_outputs_files(rng, tmp_path):
    from trajsde_tpu.utils import viz

    scene = make_scene_batch(rng, batch_size=1, num_actors=4, num_lanes=6)
    p1 = viz.viz_scene(scene, 0, str(tmp_path / "scene.png"))
    fake_out = {"loc": np.zeros((1, 3, 4, 60, 2), np.float32)}
    p2 = viz.viz_predictions(scene, fake_out, 0, str(tmp_path / "pred.png"))
    p3 = viz.viz_ood(scene, np.zeros((1, 4), np.float32), 0, str(tmp_path / "ood.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_concat_embedding_shape(rng):
    from trajsde_tpu.models.embedding import MultipleInputConcatEmbedding

    mod = MultipleInputConcatEmbedding(64)
    x = [jnp.ones((5, 2)), jnp.ones((5, 2))]
    params = mod.init(jax.random.key(0), x)
    out = mod.apply(params, x)
    assert out.shape == (5, 64)


def test_nodecay_mask():
    """HiVT-style decay masking: biases/norms/tokens excluded."""
    from trajsde_tpu.train.optim import decay_mask

    params = {
        "encoder": {
            "attn": {"lin_q": {"kernel": np.ones((4, 4)), "bias": np.ones(4)}},
            "norm1": {"scale": np.ones(4), "bias": np.ones(4)},
            "bos_token": np.ones((21, 4)),
            "gru": {"update_gate_0": {"kernel": np.ones((4, 4))}},
        }
    }
    mask = decay_mask(params)
    assert mask["encoder"]["attn"]["lin_q"]["kernel"] is True
    assert mask["encoder"]["attn"]["lin_q"]["bias"] is False
    assert mask["encoder"]["norm1"]["scale"] is False
    assert mask["encoder"]["bos_token"] is False
    assert mask["encoder"]["gru"]["update_gate_0"]["kernel"] is False


def test_reduction_mlp_shapes(rng):
    import jax
    from trajsde_tpu.models.layers import ReductionMLP

    mod = ReductionMLP(input_dim=32, output_dim=8, num_layers=2)
    x = jnp.ones((5, 32))
    params = mod.init(jax.random.key(0), x)
    out = mod.apply(params, x)
    assert out.shape == (5, 8)
    # width schedule matches the reference MLP (util.py:168,178): the
    # input layer and the FIRST hidden layer share max(out, in/f); for
    # (in=32, out=8, f=0.5, num_layers=2) that is [32→64, 64→64, 64→8]
    kernels = [
        params["params"][f"Dense_{i}"]["kernel"].shape for i in range(3)
    ]
    assert kernels == [(32, 64), (64, 64), (64, 8)], kernels


def test_cpu_cache_dir_is_isa_keyed(tmp_path, monkeypatch):
    """The CPU compile-cache path must change when the host CPU feature
    set changes — stale cross-boot XLA:CPU artifacts SIGILL / flake when
    deserialized (round-4 field observation; utils/cache.py)."""
    import trajsde_tpu.utils.cache as cache_mod

    here = cache_mod.cpu_cache_dir()
    assert here.startswith("/tmp/jax_cache_trajsde_cpu_")
    assert here == cache_mod.cpu_cache_dir()  # deterministic per host
    other_host = tmp_path / "cpuinfo"
    other_host.write_text("flags\t\t: fp asimd sve2\n")
    real_open = open
    monkeypatch.setattr(
        "builtins.open",
        lambda f, *a, **k: real_open(
            other_host if f == "/proc/cpuinfo" else f, *a, **k
        ),
    )
    assert cache_mod.cpu_cache_dir() != here
