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


def _assert_trees_close(a, b, tol=None):
    for (path, x), (_, y) in zip(
        jax.tree_util.tree_flatten_with_path(a)[0],
        jax.tree_util.tree_flatten_with_path(b)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y),
            err_msg=jax.tree_util.keystr(path), **(tol or TOL),
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


def test_edge_attention_packed_parity(rng):
    """Both EdgeAttention variants (per-pair kv; node+edge kv) packed vs
    per-layer: same params, same outputs, same grads."""
    from trajsde_tpu.models.layers import EdgeAttention

    B, Nq, Nk, D, H = 2, 5, 7, 16, 4
    center = jnp.asarray(rng.normal(size=(B, Nq, D)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, Nq, Nk)) < 0.5)
    kv_pair = jnp.asarray(rng.normal(size=(B, Nq, Nk, D)).astype(np.float32))
    kv_node = jnp.asarray(rng.normal(size=(B, Nk, D)).astype(np.float32))
    kv_edge = jnp.asarray(rng.normal(size=(B, Nq, Nk, D)).astype(np.float32))

    for kwargs in (dict(kv_pair=kv_pair), dict(kv_node=kv_node, kv_edge=kv_edge)):
        packed = EdgeAttention(D, H, packed=True)
        plain = EdgeAttention(D, H, packed=False)
        vp = packed.init(jax.random.key(0), center, mask, **kwargs)
        vu = plain.init(jax.random.key(0), center, mask, **kwargs)
        _assert_trees_close(vp["params"], vu["params"])

        def out(mod, p):
            return mod.apply({"params": p}, center, mask, **kwargs)

        np.testing.assert_allclose(
            np.asarray(out(packed, vp["params"])),
            np.asarray(out(plain, vp["params"])), **TOL,
        )
        # grads: the packed backward computes dW over the concatenated
        # output then slices — same sum, different accumulation order, so
        # allow reassociation-level noise
        _assert_trees_close(
            jax.grad(lambda p: jnp.sum(out(packed, p) ** 2))(vp["params"]),
            jax.grad(lambda p: jnp.sum(out(plain, p) ** 2))(vp["params"]),
            tol=dict(rtol=1e-4, atol=1e-5),
        )


def test_multi_embedding_packed_parity(rng):
    """Σᵢ hᵢ @ Wᵢ as one vstacked matmul: same params, outputs, grads."""
    from trajsde_tpu.models.embedding import MultipleInputEmbedding

    D = 16
    xs = [jnp.asarray(rng.normal(size=(9, 2)).astype(np.float32)) for _ in range(2)]
    packed = MultipleInputEmbedding(D, packed=True)
    plain = MultipleInputEmbedding(D, packed=False)
    vp = packed.init(jax.random.key(0), xs)
    vu = plain.init(jax.random.key(0), xs)
    _assert_trees_close(vp["params"], vu["params"])

    def out(mod, p):
        return mod.apply({"params": p}, xs)

    np.testing.assert_allclose(
        np.asarray(out(packed, vp["params"])), np.asarray(out(plain, vp["params"])), **TOL
    )
    _assert_trees_close(
        jax.grad(lambda p: jnp.sum(out(packed, p) ** 2))(vp["params"]),
        jax.grad(lambda p: jnp.sum(out(plain, p) ** 2))(vp["params"]),
        # K=128 single accumulation vs two K=64 sums: ~1e-7-relative forward
        # reassociation noise, amplified by the LayerNorm backward into the
        # tiny layer-0 bias grads
        tol=dict(rtol=1e-2, atol=1e-4),
    )
