"""End-to-end forward-pass shape/validity tests for both model families."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.models.aggregator import GlobalInteractor
from trajsde_tpu.models.decoders import MLPDecoder, SDEDecoder
from trajsde_tpu.models.local_encoder import LocalEncoder
from trajsde_tpu.models.prediction import PredictionModel, PredictionModelSDENet
from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

B, A, L, TH, TF, D, K = 2, 8, 12, 21, 60, 64, 10


def _scene(rng):
    return make_scene_batch(rng, batch_size=B, num_actors=A, num_lanes=L, sources=[0, 1])


def make_baseline():
    return PredictionModel(
        encoder=LocalEncoder(historical_steps=TH, embed_dim=D, num_heads=4),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=K, num_heads=4
        ),
        decoder=MLPDecoder(
            local_channels=D, global_channels=D, future_steps=TF, num_modes=K
        ),
    )


def make_sde():
    return PredictionModelSDENet(
        encoder=LocalEncoderSDESep(historical_steps=TH, embed_dim=D, num_heads=8),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=K, num_heads=8
        ),
        decoder=SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF, num_modes=K
        ),
    )


def test_baseline_forward(rng):
    scene = _scene(rng)
    model = make_baseline()
    params = jax.jit(model.init)(jax.random.key(0), scene)
    out = jax.jit(model.apply)(params, scene)
    assert out["loc"].shape == (B, K, A, TF, 4)
    assert out["pi"].shape == (B, A, K)
    assert out["reg_mask"].shape == (B, A, TF)
    assert out["y"].shape == (B, A, TF, 2)
    assert np.all(np.isfinite(out["loc"]))
    # scale channel is elu+1+min_scale > 0
    assert np.all(np.asarray(out["loc"][..., 2:]) > 0)


def test_sde_forward(rng):
    scene = _scene(rng)
    model = make_sde()
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    params = jax.jit(model.init)(rngs, scene)
    out = jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    assert out["loc"].shape == (B, K, A, TF, 4)
    assert out["diff_in"].shape == (B,)
    assert out["diff_out"].shape == (B,)
    assert np.all((np.asarray(out["diff_in"]) > 0) & (np.asarray(out["diff_in"]) < 1))
    assert np.all(np.isfinite(out["loc"]))
    assert np.asarray(out["label_in"]).sum() == 0
    assert np.asarray(out["label_out"]).sum() == B


def test_sde_forward_ood(rng):
    scene = _scene(rng)
    model = make_sde()
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    params = jax.jit(model.init)(rngs, scene)
    out = jax.jit(lambda p, s, k: model.apply(p, s, ood=True, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    assert out["stds"].shape == (B, A)
    assert np.all(np.asarray(out["stds"]) >= 0)


def test_sde_paths_reproducible(rng):
    """Same sde rng → identical Brownian paths (capability the reference lacks)."""
    scene = _scene(rng)
    model = make_sde()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    fwd = jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))
    out1 = fwd(params, scene, jax.random.key(7))
    out2 = fwd(params, scene, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(out1["loc"]), np.asarray(out2["loc"]))
    out3 = fwd(params, scene, jax.random.key(8))
    assert not np.allclose(np.asarray(out1["loc"]), np.asarray(out3["loc"]))


def test_remat_forward_equivalence(rng):
    """remat=True must be a pure memory/time tradeoff — identical outputs."""
    scene = _scene(rng)
    enc = LocalEncoderSDESep(historical_steps=TH, embed_dim=D, num_heads=8)
    enc_r = LocalEncoderSDESep(historical_steps=TH, embed_dim=D, num_heads=8, remat=True)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    params = jax.jit(enc.init)(rngs, scene)
    out = jax.jit(lambda p, s, k: enc.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    out_r = jax.jit(lambda p, s, k: enc_r.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out_r[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(out_r[1]), atol=1e-6)


def test_bf16_mixed_precision_forward(rng):
    """dtype=bfloat16 computes close to f32 with f32 params and f32 outputs."""
    scene = _scene(rng)
    f32 = make_sde()
    bf16 = PredictionModelSDENet(
        encoder=LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8, dtype=jnp.bfloat16
        ),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=K, num_heads=8,
            dtype=jnp.bfloat16,
        ),
        decoder=SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF, num_modes=K,
            dtype=jnp.bfloat16,
        ),
    )
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    params = jax.jit(f32.init)(rngs, scene)
    # identical param tree (params stay f32 in mixed precision)
    p16 = jax.jit(bf16.init)(rngs, scene)
    assert jax.tree.all(
        jax.tree.map(lambda a, b: a.dtype == b.dtype, params, p16)
    )
    out32 = jax.jit(lambda p, s, k: f32.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    out16 = jax.jit(lambda p, s, k: bf16.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    assert out16["loc"].dtype == jnp.float32
    # stochastic paths diverge under precision, so compare coarse statistics
    assert np.isfinite(np.asarray(out16["loc"])).all()
    np.testing.assert_allclose(
        float(jnp.abs(out32["pi"]).mean()),
        float(jnp.abs(out16["pi"]).mean()),
        rtol=0.15,
    )


def test_aggregator_rotate_false(rng):
    """The non-rotated rel-embed path (``agg_hivt.py:29-30,44-45``)."""
    scene = _scene(rng)
    agg = GlobalInteractor(
        historical_steps=TH, embed_dim=D, num_modes=K, num_heads=4, rotate=False
    )
    local = jnp.ones((B, A, D))
    params = jax.jit(agg.init)(jax.random.key(0), scene, local)
    out = jax.jit(agg.apply)(params, scene, local)
    assert out.shape == (B, K, A, D)
    assert np.isfinite(np.asarray(out)).all()


def test_laplace_nll_config_trains(rng):
    """A config using the LaplaceNLL loss plugs in and produces gradients."""
    import optax
    from trajsde_tpu.losses import laplace_nll_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    scene = _scene(rng)
    model = make_baseline()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, scene)
    step = make_train_step(model, opt, [("LaplaceNLLLoss", 1.0, laplace_nll_loss)], donate=False)
    state, logs = step(state, scene)
    assert np.isfinite(float(logs["train/total"]))
    # the scale head now receives gradient (unlike the L2-only recipe)
    state2, logs2 = step(state, scene)
    assert float(logs2["train/total"]) != float(logs["train/total"])


def test_sde_forward_ood_chunked_matches(rng):
    """ood_chunk (the production-shape memory fallback, VERDICT r2 #7)
    must not change the math: with the diffusion heads zeroed the ensemble
    members are identical, so the chunked and unchunked folds produce
    EXACTLY the same embeddings and zero stds."""
    scene = make_scene_batch(rng, batch_size=2, num_actors=4, num_lanes=6)
    kw = dict(historical_steps=TH, embed_dim=16, num_heads=4, eval_iter=4)
    enc_full = LocalEncoderSDESep(**kw)
    enc_chunk = LocalEncoderSDESep(**kw, ood_chunk=2)
    variables = enc_full.init(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    params = jax.device_get(variables["params"])
    for g_name in ("g_nus", "g_argo"):
        head = params["sde_rnn"][g_name]["dense_out"]
        head["kernel"] = jnp.zeros_like(head["kernel"])
        head["bias"] = jnp.full_like(head["bias"], -40.0)

    out_f, std_f = enc_full.apply(
        {"params": params}, scene, rngs={"sde": jax.random.key(2)},
        method="forward_ood",
    )
    out_c, std_c = enc_chunk.apply(
        {"params": params}, scene, rngs={"sde": jax.random.key(2)},
        method="forward_ood",
    )
    assert float(np.abs(np.asarray(std_f)).max()) < 1e-6
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(std_c), np.asarray(std_f), atol=1e-6)

    # invalid chunk size fails loudly
    with pytest.raises(ValueError):
        LocalEncoderSDESep(**kw, ood_chunk=3).apply(
            {"params": params}, scene, rngs={"sde": jax.random.key(2)},
            method="forward_ood",
        )


def test_unsupported_encoder_knobs_raise(rng):
    """Knob combinations outside the implemented envelope fail LOUDLY at
    init, not silently degrade (the module's stated policy)."""
    scene = _scene(rng)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    # eos gather rule requires ref_time == historical_steps - 1 (any other
    # pairing can take_along_axis out of bounds → NaN under jit)
    with pytest.raises(ValueError, match="ref_time"):
        LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8, ref_time=TH - 5
        ).init(rngs, scene)
    # the reference SDE AAEncoder hardcodes bos substitution
    with pytest.raises(NotImplementedError, match="input_diff"):
        LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8, input_diff=False
        ).init(rngs, scene)
    # run_backwards=false is a dead branch in the reference (its forward
    # iteration feeds descending ts into sdeint_dual's check_contract)
    with pytest.raises(NotImplementedError, match="run_backwards"):
        LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8, run_backwards=False
        ).init(rngs, scene)
    # minimum_step below the observation spacing would need multi-substep
    # segments (torchsde clipped stepping); only single-step is built
    with pytest.raises(NotImplementedError, match="minimum_step"):
        LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8,
            max_past_t=2.0, minimum_step=2.0 / (TH - 1) / 2,
        ).init(rngs, scene)


def test_serving_fn_refuses_deep_sde_decoder(rng):
    """make_serving_fn's kernel param extraction hardcodes sde_layers=2;
    a deeper decoder must refuse instead of silently serving a truncated
    MLP."""
    from trajsde_tpu.serving import make_serving_fn

    model = PredictionModelSDENet(
        encoder=LocalEncoderSDESep(historical_steps=TH, embed_dim=D, num_heads=8),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=K, num_heads=8
        ),
        decoder=SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF,
            num_modes=K, sde_layers=3,
        ),
    )
    scene = _scene(rng)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    with pytest.raises(NotImplementedError, match="sde_layers"):
        make_serving_fn(model, params)
