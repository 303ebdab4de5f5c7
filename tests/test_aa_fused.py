"""Fused AA pair-chain op (ops/pallas/aa_fused.py): value + gradient parity
against the linen path, with an IDENTICAL parameter tree (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.models.local_encoder import AAEncoder
from trajsde_tpu.ops.pallas.aa_attention import pack_aa_params
from trajsde_tpu.ops.pallas.aa_fused import (
    W_ORDER,
    FusedCfg,
    fused_pair_attention,
    reference_pair_attention,
)


def _aa_inputs(rng, B=2, T=4, Aq=5, Ak=4):
    x_q = jnp.asarray(rng.normal(0, 2, (B, T, Aq, 2)), jnp.float32)
    x_k = jnp.asarray(rng.normal(0, 2, (B, T, Ak, 2)), jnp.float32)
    ang = rng.uniform(-np.pi, np.pi, (B, Aq))
    c, s = np.cos(ang), np.sin(ang)
    rot = jnp.asarray(np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2), jnp.float32)
    bos = jnp.asarray(rng.uniform(size=(B, Aq, T)) < 0.2)
    mask = jnp.asarray(rng.uniform(size=(B, T, Aq, Ak)) < 0.6)
    edge = jnp.asarray(rng.normal(0, 10, (B, T, Aq, Ak, 2)), jnp.float32)
    return x_q, x_k, rot, bos, mask, edge


def test_fused_encoder_matches_linen(rng):
    """Same params → same forward AND same grads, fused vs linen."""
    B, T, Aq, Ak, D, H = 2, 4, 5, 4, 16, 4
    inputs = _aa_inputs(rng, B, T, Aq, Ak)
    linen_enc = AAEncoder(historical_steps=T, embed_dim=D, num_heads=H)
    fused_enc = AAEncoder(historical_steps=T, embed_dim=D, num_heads=H, fused=True, rows_fwd=10)

    params = linen_enc.init(jax.random.key(0), *inputs)["params"]
    params_f = fused_enc.init(jax.random.key(0), *inputs)["params"]
    # identical parameter trees (paths AND shapes) — checkpoints interchange
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(params_f)[0]
    assert [(p, v.shape) for p, v in flat_a] == [(p, v.shape) for p, v in flat_b]

    out_l = linen_enc.apply({"params": params}, *inputs)
    out_f = fused_enc.apply({"params": params}, *inputs)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_l), rtol=1e-4, atol=1e-5)

    ct = jnp.asarray(rng.normal(size=out_l.shape), jnp.float32)

    def loss(mod):
        return lambda p, xq: jnp.sum(mod.apply({"params": p}, xq, *inputs[1:]) * ct)

    gl_p, gl_x = jax.grad(loss(linen_enc), argnums=(0, 1))(params, inputs[0])
    gf_p, gf_x = jax.grad(loss(fused_enc), argnums=(0, 1))(params, inputs[0])
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gl_x), rtol=1e-3, atol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(gl_p)[0],
        jax.tree_util.tree_flatten_with_path(gf_p)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_dropout_grad_matches_reference(rng):
    """Dropout keep-mask path: fused VJP == autodiff of the jnp reference."""
    B, T, Aq, Ak, D, H = 1, 2, 3, 4, 16, 4
    enc = AAEncoder(historical_steps=T, embed_dim=D, num_heads=H)
    inputs = _aa_inputs(rng, B, T, Aq, Ak)
    params = enc.init(jax.random.key(0), *inputs)["params"]
    packed = pack_aa_params(params)
    ws = tuple(jnp.asarray(packed[k], jnp.float32) for k in W_ORDER)

    q = jnp.asarray(rng.normal(size=(B, T, Aq, D)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(B, T, Aq, Ak, 4)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(B, T, Aq, Ak)) < 0.7, jnp.float32)
    keep = jnp.asarray(rng.uniform(size=(B, T, Aq, Ak, H)) < 0.9, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(B, T, Aq, D)), jnp.float32)
    cfg = FusedCfg(Aq=Aq, Ak=Ak, D=D, H=H, rows_fwd=3, rows_bwd=3,
                   dropout_rate=0.1, dtype="float32", interpret=True)

    def lf(q_, u_, ws_):
        return jnp.sum(fused_pair_attention(cfg, q_, u_, mask, keep, ws_) * ct)

    def lr(q_, u_, ws_):
        return jnp.sum(
            reference_pair_attention(q_, u_, mask, keep, ws_, Ak=Ak, H=H, dropout_rate=0.1) * ct
        )

    gf = jax.grad(lf, argnums=(0, 1, 2))(q, u, ws)
    gr = jax.grad(lr, argnums=(0, 1, 2))(q, u, ws)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), rtol=1e-4, atol=1e-5)
    # op contract: u is scene-data-only, so the fused VJP returns a zero
    # cotangent for it by design (the kernel never computes du)
    np.testing.assert_array_equal(np.asarray(gf[1]), 0.0)
    assert float(jnp.max(jnp.abs(gr[1]))) > 0  # the math itself is not degenerate
    for a, b in zip(gf[2], gr[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fused_sde_encoder_forward(rng):
    """The full SDE encoder with fused=True: same params, same output."""
    from trajsde_tpu.data.synthetic import make_scene_batch
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    scene = make_scene_batch(rng, batch_size=2, num_actors=4, num_lanes=8)
    kw = dict(historical_steps=21, embed_dim=16, num_heads=4)
    enc_l = LocalEncoderSDESep(**kw)
    enc_f = LocalEncoderSDESep(**kw, fused=True)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    params = enc_l.init(rngs, scene)["params"]
    out_l = enc_l.apply({"params": params}, scene, rngs={"sde": jax.random.key(2)})
    out_f = enc_f.apply({"params": params}, scene, rngs={"sde": jax.random.key(2)})
    for a, b in zip(out_l, out_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5
        )
