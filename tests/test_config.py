"""Config → model/losses/metrics construction tests (registry plumbing)."""
import jax
import numpy as np

from trajsde_tpu.config import build_losses, build_model, load_config
from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.train.metrics import make_metrics

SDE_CFG = "configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec.yml"
BASE_CFG = "configs/nusargo/hivt_nuSArgo_trmenc_mlpdec.yml"


def test_build_sde_model_from_config(rng):
    cfg = load_config(SDE_CFG)
    model = build_model(cfg)
    assert type(model).__name__ == "PredictionModelSDENet"
    assert type(model.encoder).__name__ == "LocalEncoderSDESep"
    assert model.decoder.num_modes == 10
    losses = build_losses(cfg)
    assert [n for n, _, _ in losses] == ["L2", "DiffBCE"]
    metrics = make_metrics(
        [n for n, _ in cfg.metric_specs], [dict(a) for _, a in cfg.metric_specs]
    )
    assert [m.name for m in metrics] == ["ADE_T", "FDE_T", "MR_T"]

    scene = make_scene_batch(rng, batch_size=2, num_actors=6, num_lanes=8)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    out = jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    assert out["loc"].shape == (2, 10, 6, 60, 4)


def test_build_baseline_model_from_config(rng):
    cfg = load_config(BASE_CFG)
    model = build_model(cfg)
    assert type(model).__name__ == "PredictionModel"
    assert type(model.encoder).__name__ == "LocalEncoder"
    assert model.encoder.num_heads == 4
    losses = build_losses(cfg)
    assert [n for n, _, _ in losses] == ["L2"]


def test_reference_config_file_paths_tolerated(tmp_path):
    """A reference-style section with file_path keys still resolves."""
    import yaml

    cfg = yaml.safe_load(open(SDE_CFG))
    cfg["encoder"]["file_path"] = "models/encoders/enc_hivt_nusargo_sde_sep2.py"
    p = tmp_path / "ref_style.yml"
    p.write_text(yaml.safe_dump(cfg))
    model = build_model(load_config(str(p)))
    assert type(model.encoder).__name__ == "LocalEncoderSDESep"


import os
import pytest


@pytest.mark.skipif(
    not os.path.exists("/root/reference/configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec.yml"),
    reason="reference checkout not present",
)
def test_reference_shipped_config_loads_drop_in():
    """The reference's own shipped YAML builds a working model here."""
    cfg = load_config("/root/reference/configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec.yml")
    model = build_model(cfg)
    assert type(model).__name__ == "PredictionModelSDENet"
    assert type(model.encoder).__name__ == "LocalEncoderSDESep"
    assert model.encoder.num_heads == 8 and model.decoder.max_fut_t == 6
    losses = build_losses(cfg)
    assert [n for n, _, _ in losses] == ["L2", "DiffBCE"]
    metrics = make_metrics(
        [n for n, _ in cfg.metric_specs], [dict(a) for _, a in cfg.metric_specs]
    )
    assert [m.name for m in metrics] == ["ADE_T", "FDE_T", "MR_T"]


def test_tpu_fast_config_builds_capped_model(rng):
    """The _tpu_fast recipe = _tpu config + neighbor_cap 24; everything
    else (dims, losses, metrics, bf16 mix) must stay identical."""
    import jax.numpy as jnp
    import yaml

    base = os.path.join(os.path.dirname(SDE_CFG),
                        "hivt_nuSArgo_sdesepenc_sdedec_tpu.yml")
    fast = os.path.join(os.path.dirname(SDE_CFG),
                        "hivt_nuSArgo_sdesepenc_sdedec_tpu_fast.yml")
    cfg = load_config(fast)
    model = build_model(cfg)
    assert model.encoder.neighbor_cap == 24
    assert model.encoder.dtype == jnp.bfloat16

    # the fast recipe is the _tpu config plus exactly the cap knob
    b, f = yaml.safe_load(open(base)), yaml.safe_load(open(fast))
    assert f["encoder"]["kwargs"].pop("neighbor_cap") == 24
    assert b == f

    # it still runs end-to-end (cap >= A here so the gather is inert;
    # capped-vs-dense numerics are covered by test_attention_parity)
    scene = make_scene_batch(rng, batch_size=2, num_actors=6, num_lanes=8)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    out = jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    assert np.isfinite(np.asarray(out["loc"])).all()


def test_tpu_production_config_builds_bf16_model(rng):
    """The _tpu config variant is the shipped config + per-component bf16;
    the model builds and a forward runs with bf16 compute."""
    import os

    import jax.numpy as jnp

    cfg = load_config(os.path.join(os.path.dirname(SDE_CFG),
                                   "hivt_nuSArgo_sdesepenc_sdedec_tpu.yml"))
    model = build_model(cfg)
    assert model.encoder.dtype == jnp.bfloat16
    assert model.decoder.dtype == jnp.bfloat16
    scene = make_scene_batch(rng, batch_size=2, num_actors=6, num_lanes=8)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    # params stay f32 (mixed precision), outputs f32
    leaf = jax.tree_util.tree_leaves(params["params"])[0]
    assert leaf.dtype == jnp.float32
    out = jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )
    assert out["loc"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["loc"])).all()
