"""Packed-matmul parity: the horizontally packed SDE-step/GRU compute
paths (hstack layer-0, block-diagonal deeper layers — full MXU width)
must be numerically identical to the per-layer ``nn.Dense`` paths, for
outputs AND gradients, with the SAME parameter tree (scope names and
initializers are shared, so checkpoints are interchangeable and even the
initial values coincide)."""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.models.layers import GRUUnit
from trajsde_tpu.models.sde import SDEGRUStep, SDEStep

TOL = dict(rtol=2e-6, atol=2e-6)


def _grads(apply_fn, params, *args):
    return jax.grad(lambda p: jnp.sum(apply_fn(p, *args) ** 2))(params)


def _assert_trees_close(a, b):
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y),
            err_msg=jax.tree_util.keystr(path), **TOL,
        )


def test_gru_unit_packed_parity(rng):
    N, D = 9, 16
    h = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=N) < 0.6)

    packed = GRUUnit(latent_dim=D, n_units=D, packed=True)
    plain = GRUUnit(latent_dim=D, n_units=D, packed=False)
    vp = packed.init(jax.random.key(0), h, x, mask)
    vu = plain.init(jax.random.key(0), h, x, mask)
    # identical trees AND identical initial values (same scope-derived RNG)
    _assert_trees_close(vp["params"], vu["params"])

    fn_p = lambda p, *a: packed.apply({"params": p}, *a)
    fn_u = lambda p, *a: plain.apply({"params": p}, *a)
    np.testing.assert_allclose(
        np.asarray(fn_p(vp["params"], h, x, mask)),
        np.asarray(fn_u(vp["params"], h, x, mask)), **TOL,
    )
    _assert_trees_close(
        _grads(fn_p, vp["params"], h, x, mask),
        _grads(fn_u, vp["params"], h, x, mask),
    )


def test_sde_step_packed_parity(rng):
    N, D = 9, 16
    y = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    xs = (jnp.float32(0.37), jnp.float32(0.1))

    packed = SDEStep(embed_dim=D, packed=True)
    plain = SDEStep(embed_dim=D, packed=False)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    vp = packed.init(rngs, y, xs)
    vu = plain.init(rngs, y, xs)
    _assert_trees_close(vp["params"], vu["params"])

    def out(mod, p):
        y1, _ = mod.apply({"params": p}, y, xs, rngs={"sde": jax.random.key(2)})
        return y1

    np.testing.assert_allclose(
        np.asarray(out(packed, vp["params"])), np.asarray(out(plain, vp["params"])), **TOL
    )
    _assert_trees_close(
        jax.grad(lambda p: jnp.sum(out(packed, p) ** 2))(vp["params"]),
        jax.grad(lambda p: jnp.sum(out(plain, p) ** 2))(vp["params"]),
    )


def test_sde_gru_step_packed_parity(rng):
    N, D = 9, 16
    h = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    nus = jnp.asarray(rng.uniform(size=N) < 0.5)
    obs = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    obs_mask = jnp.asarray(rng.uniform(size=N) < 0.7)
    xs = (obs, obs_mask, jnp.float32(0.2), jnp.float32(0.1))

    packed = SDEGRUStep(embed_dim=D, packed=True)
    plain = SDEGRUStep(embed_dim=D, packed=False)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    vp = packed.init(rngs, (h, nus), xs)
    vu = plain.init(rngs, (h, nus), xs)
    _assert_trees_close(vp["params"], vu["params"])

    def out(mod, p):
        (h1, _), (hy, g) = mod.apply(
            {"params": p}, (h, nus), xs, rngs={"sde": jax.random.key(2)}
        )
        return jnp.sum(h1 ** 2) + jnp.sum(g ** 2)

    np.testing.assert_allclose(
        float(out(packed, vp["params"])), float(out(plain, vp["params"])), **TOL
    )
    _assert_trees_close(
        jax.grad(lambda p: out(packed, p))(vp["params"]),
        jax.grad(lambda p: out(plain, p))(vp["params"]),
    )


def test_flagship_forward_packed_parity(rng):
    """Full SDE model: packed vs unpacked forwards agree end to end."""
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _scene
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.prediction import PredictionModelSDENet
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    def build(packed):
        D, TH, TF = 32, 21, 60
        return PredictionModelSDENet(
            encoder=LocalEncoderSDESep(
                historical_steps=TH, embed_dim=D, num_heads=4, packed=packed,
            ),
            aggregator=GlobalInteractor(
                historical_steps=TH, embed_dim=D, num_modes=2, num_heads=4
            ),
            decoder=SDEDecoder(
                local_channels=D, global_channels=D, future_steps=TF,
                num_modes=2, packed=packed,
            ),
        )

    scene = _scene(batch_size=2, num_actors=5, num_lanes=6)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    mp = build(True)
    mu = build(False)
    vp = mp.init(rngs, scene)
    out_p = mp.apply(vp, scene, rngs={"sde": jax.random.key(2)})
    out_u = mu.apply(vp, scene, rngs={"sde": jax.random.key(2)})
    for k in ("loc", "pi", "diff_in", "diff_out"):
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_u[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )
