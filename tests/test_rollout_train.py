"""Differentiable fused decoder rollout (sde_rollout_train custom VJP):
value + gradient parity vs a lax.scan reference with shared math, and the
SDEDecoder fused=True integration (identical parameter tree)."""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.ops.pallas.sde_rollout import (
    W_ROLLOUT_ORDER,
    _euler_step,
    sde_rollout_train,
)


def _params(rng, D):
    p = dict(
        wf0=rng.normal(0, 0.3, (D, D)), wf0t=rng.normal(0, 0.3, (2, D)),
        bf0=np.zeros((1, D)),
        wf1=rng.normal(0, 0.3, (D, D)), bf1=np.zeros((1, D)),
        wf2=rng.normal(0, 0.3, (D, D)), bf2=np.zeros((1, D)),
        wg0=rng.normal(0, 0.3, (D, D)), wg0t=rng.normal(0, 0.3, (2, D)),
        bg0=np.zeros((1, D)),
        wg1=rng.normal(0, 0.3, (D, D)), bg1=np.zeros((1, D)),
        wgo=rng.normal(0, 0.3, (D, 1)), bgo=np.zeros((1, 1)),
    )
    return {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}


def test_rollout_train_matches_scan(rng):
    N, D, T = 12, 8, 6
    p = _params(rng, D)
    y0 = jnp.asarray(rng.normal(0, 0.5, (N, D)), jnp.float32)
    ts = jnp.linspace(0.0, 1.0, T + 1)
    t0s, dts = ts[:-1], ts[1:] - ts[:-1]
    noise = jnp.asarray(rng.normal(size=(T, N, D)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(T, N, D)), jnp.float32)

    def ref(y0_, p_):
        ws = tuple(p_[k] for k in W_ROLLOUT_ORDER)

        def step(y, inp):
            t0, dt, z = inp
            y1 = _euler_step(y, jnp.sin(t0), jnp.cos(t0), dt, jnp.sqrt(dt), z, ws)
            return y1, y1

        _, ys = jax.lax.scan(step, y0_, (t0s, dts, noise))
        return ys

    def ker(y0_, p_):
        # block_rows=4 < N forces multi-tile; unroll=3 forces multi-block
        return sde_rollout_train(
            y0_, p_, t0s, dts, jnp.int32(0), num_steps=T,
            block_rows=4, interpret=True, noise=noise, unroll=3,
        )

    np.testing.assert_allclose(
        np.asarray(ker(y0, p)), np.asarray(ref(y0, p)), atol=1e-5
    )

    lr = lambda y0_, p_: jnp.sum(ref(y0_, p_) * ct)
    lk = lambda y0_, p_: jnp.sum(ker(y0_, p_) * ct)
    gy_r, gp_r = jax.grad(lr, argnums=(0, 1))(y0, p)
    gy_k, gp_k = jax.grad(lk, argnums=(0, 1))(y0, p)
    np.testing.assert_allclose(np.asarray(gy_k), np.asarray(gy_r), atol=1e-5)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(gp_k[k]), np.asarray(gp_r[k]), atol=1e-4, err_msg=k
        )


def test_rollout_train_row_padding(rng):
    """N not divisible by block_rows: padded rows must not perturb grads."""
    N, D, T = 10, 8, 4
    p = _params(rng, D)
    y0 = jnp.asarray(rng.normal(0, 0.5, (N, D)), jnp.float32)
    ts = jnp.linspace(0.0, 1.0, T + 1)
    t0s, dts = ts[:-1], ts[1:] - ts[:-1]
    noise = jnp.asarray(rng.normal(size=(T, N, D)), jnp.float32)

    def loss(block_rows):
        def fn(y0_):
            ys = sde_rollout_train(
                y0_, p, t0s, dts, jnp.int32(0), num_steps=T,
                block_rows=block_rows, interpret=True, noise=noise, unroll=2,
            )
            return jnp.sum(ys**2)

        return jax.value_and_grad(fn)(y0)

    v_a, g_a = loss(N)   # single exact tile
    v_b, g_b = loss(4)   # 4 + 4 + 2-padded tile
    np.testing.assert_allclose(float(v_b), float(v_a), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_a), atol=1e-5)


def test_sde_decoder_fused_integration(rng):
    """fused=True decoder: identical parameter tree, finite loss + grads."""
    from trajsde_tpu.data.synthetic import make_scene_batch
    from trajsde_tpu.models.decoders import SDEDecoder

    scene = make_scene_batch(rng, batch_size=2, num_actors=3, num_lanes=4)
    B, A, D, F, Tf = 2, 3, 8, 2, 12
    local = jnp.asarray(rng.normal(size=(B, A, D)), jnp.float32)
    glob = jnp.asarray(rng.normal(size=(B, F, A, D)), jnp.float32)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}

    dec_s = SDEDecoder(local_channels=D, global_channels=D,
                       future_steps=Tf, num_modes=F)
    dec_f = SDEDecoder(local_channels=D, global_channels=D,
                       future_steps=Tf, num_modes=F, fused=True,
                       rollout_rows=8, rollout_unroll=3)
    p_s = dec_s.init(rngs, scene, local, glob)["params"]
    p_f = dec_f.init(rngs, scene, local, glob)["params"]
    flat_s = jax.tree_util.tree_flatten_with_path(p_s)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(p_f)[0]
    assert [(k, v.shape) for k, v in flat_s] == [(k, v.shape) for k, v in flat_f]

    def loss(p):
        out = dec_f.apply({"params": p}, scene, local, glob,
                          rngs={"sde": jax.random.key(2)})
        return jnp.sum(out["loc"] ** 2) + jnp.sum(out["pi"] ** 2)

    val, grads = jax.value_and_grad(loss)(p_f)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # rollout params receive gradient through the kernel VJP
    gro = jax.tree_util.tree_leaves(grads["sde_rollout"])
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in gro)
