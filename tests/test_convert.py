"""Reference-checkpoint conversion round trip.

``trajsde_tpu/utils/convert.py`` maps a reference Lightning
``state_dict`` onto the flax tree.  The transplant tier
(``test_reference_transplant.py``) already verifies the OPPOSITE
direction numerically (flax params pushed into the reference's own torch
modules produce equal outputs), so the round trip

    flax template --(verified setters)--> torch modules --state_dict()
                  --(convert_state_dict)--> flax params

must reproduce the template exactly; any naming or transpose mistake in
the converter breaks the equality.  Reference ctors take the SAME kwargs
as the shipped YAML sections (config compatibility), so the modules are
built straight from the config.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_reference_transplant import (
    T,
    _ref,
    set_linear,
    set_ln,
    set_mlp_block,
    set_multi_embed,
    set_single_embed,
)

from trajsde_tpu.config import build_model, load_config
from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.utils.convert import convert_state_dict

SDE_CFG = "configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec.yml"
BASE_CFG = "configs/nusargo/hivt_nuSArgo_trmenc_mlpdec.yml"


def _template(cfg):
    model = build_model(cfg)
    scene = make_scene_batch(np.random.default_rng(0), batch_size=1,
                             num_actors=4, num_lanes=6)
    return jax.device_get(
        model.init({"params": jax.random.key(0), "sde": jax.random.key(1)}, scene)[
            "params"
        ]
    )


# ---------------------------------------------------------------------------
# flax → torch composite setters (same correspondences the transplant tier
# verifies numerically, composed over whole submodules)
# ---------------------------------------------------------------------------
@torch.no_grad()
def _set_aa(ref, p):
    ref.bos_token.copy_(T(p["bos_token"]))
    set_single_embed(ref.center_embed.embed, p["center_embed"])
    set_multi_embed(ref.nbr_embed, p["nbr_embed"])
    for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
        set_linear(getattr(ref, n), p["attn"][n])
    set_ln(ref.norm1, p["norm1"])
    set_ln(ref.norm2, p["norm2"])
    set_mlp_block(ref.mlp, p["mlp"])


@torch.no_grad()
def _set_al(ref, p):
    set_multi_embed(ref.lane_embed, p["lane_embed"])
    for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
        set_linear(getattr(ref, n), p["attn"][n])
    set_ln(ref.norm1, p["norm1"])
    set_ln(ref.norm2, p["norm2"])
    set_mlp_block(ref.mlp, p["mlp"])


@torch.no_grad()
def _set_ffunc(net, p):
    for i in range(len(p)):
        set_linear(net[2 * i], p[f"dense{i}"])


@torch.no_grad()
def _set_gfunc(net, p):
    n = len(p) - 1
    for i in range(n):
        set_linear(net[2 * i], p[f"dense{i}"])
    set_linear(net[2 * n], p["dense_out"])


@torch.no_grad()
def _set_sde_encoder(ref, p):
    _set_aa(ref.aa_encoder, p["aa_encoder"])
    _set_al(ref.al_encoder, p["al_encoder"])
    gru = p["sde_rnn"]["gru"]
    for gate, seq in (
        ("update_gate", ref.gru_unit.update_gate),
        ("reset_gate", ref.gru_unit.reset_gate),
        ("new_state", ref.gru_unit.new_state_net),
    ):
        set_linear(seq[0], gru[f"{gate}_0"])
        set_linear(seq[2], gru[f"{gate}_1"])
    _set_ffunc(ref.lsde_func.f_func.net, p["sde_rnn"]["f_func"])
    _set_gfunc(ref.lsde_func.g_nus.net, p["sde_rnn"]["g_nus"])
    _set_gfunc(ref.lsde_func.g_argo.net, p["sde_rnn"]["g_argo"])
    ref.hidden.copy_(T(p["hidden"]))


@torch.no_grad()
def _set_temporal(ref, p, num_layers):
    ref.padding_token.copy_(T(p["padding_token"])[:, None, :])
    ref.cls_token.copy_(T(p["cls_token"])[:, None, :])
    ref.pos_embed.copy_(T(p["pos_embed"])[:, None, :])
    for i in range(num_layers):
        lp = p[f"layer{i}"]
        layer = ref.transformer_encoder.layers[i]
        layer.self_attn.in_proj_weight.copy_(T(lp["self_attn"]["in_proj"]["kernel"]).t())
        layer.self_attn.in_proj_bias.copy_(T(lp["self_attn"]["in_proj"]["bias"]))
        set_linear(layer.self_attn.out_proj, lp["self_attn"]["out_proj"])
        set_ln(layer.norm1, lp["norm1"])
        set_ln(layer.norm2, lp["norm2"])
        set_linear(layer.linear1, lp["mlp"]["Dense_0"])
        set_linear(layer.linear2, lp["mlp"]["Dense_1"])
    set_ln(ref.transformer_encoder.norm, p["norm"])


@torch.no_grad()
def _set_aggregator(ref, p, num_layers):
    set_multi_embed(ref.rel_embed, p["rel_embed"])
    for li in range(num_layers):
        lp = p[f"layer{li}"]
        layer = ref.global_interactor_layers[li]
        for flax_n, ref_n in (
            ("lin_q", "lin_q_node"), ("lin_k", "lin_k_node"),
            ("lin_v", "lin_v_node"), ("lin_k_edge", "lin_k_edge"),
            ("lin_v_edge", "lin_v_edge"), ("lin_ih", "lin_ih"),
            ("lin_hh", "lin_hh"), ("lin_self", "lin_self"),
            ("out_proj", "out_proj"),
        ):
            set_linear(getattr(layer, ref_n), lp["attn"][flax_n])
        set_ln(layer.norm1, lp["norm1"])
        set_ln(layer.norm2, lp["norm2"])
        set_mlp_block(layer.mlp, lp["mlp"])
    set_ln(ref.norm, p["norm"])
    set_linear(ref.multihead_proj, p["multihead_proj"])


@torch.no_grad()
def _set_sde_decoder(ref, p):
    set_linear(ref.aggr_embed[0], p["aggr_dense"])
    set_ln(ref.aggr_embed[1], p["aggr_ln"])
    _set_ffunc(ref.lsde_func.f_func.net, p["sde_rollout"]["f_func"])
    _set_gfunc(ref.lsde_func.g_func.net, p["sde_rollout"]["g_func"])
    for pre, seq in (("loc", ref.decoder), ("scale", ref.scale), ("pi", ref.pi)):
        set_linear(seq[0], p[f"{pre}_layers_0"])
        set_ln(seq[1], p[f"{pre}_layers_1"])
        set_linear(seq[3], p[f"{pre}_layers_2"])


@torch.no_grad()
def _set_mlp_decoder(ref, p):
    set_linear(ref.aggr_embed[0], p["aggr_dense"])
    set_ln(ref.aggr_embed[1], p["aggr_ln"])
    for pre, seq, idxs in (("loc", ref.loc, (0, 3)), ("scale", ref.scale, (0, 3)),
                           ("pi", ref.pi, (0, 3, 6))):
        for i, idx in enumerate(idxs):
            set_linear(seq[idx], p[f"{pre}_dense{i}"])
            if idx + 1 < len(seq) and isinstance(seq[idx + 1], torch.nn.LayerNorm):
                set_ln(seq[idx + 1], p[f"{pre}_ln{i}"])


def _assert_tree_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for (path, la), lb in zip(fa, fb):
        np.testing.assert_array_equal(
            np.asarray(la), np.asarray(lb),
            err_msg="/".join(str(getattr(k, "key", k)) for k in path),
        )


def _prefixed(module, prefix):
    return {f"{prefix}.{k}": v.numpy() for k, v in module.state_dict().items()}


def test_convert_sde_family_round_trip():
    cfg = load_config(SDE_CFG)
    template = _template(cfg)

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")
    agg_mod = _ref("models.aggregators.agg_hivt")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_sde")

    enc = enc_mod.LocalEncoderSDESepPara2(**cfg.component("encoder")[1]).eval()
    agg = agg_mod.GlobalInteractor(**cfg.component("aggregator")[1]).eval()
    dec = dec_mod.SDEDecoder(**cfg.component("decoder")[1]).eval()

    _set_sde_encoder(enc, template["encoder"])
    _set_aggregator(agg, template["aggregator"],
                    int(cfg.component("aggregator")[1].get("num_layers", 3)))
    _set_sde_decoder(dec, template["decoder"])

    sd = {**_prefixed(enc, "encoder"), **_prefixed(agg, "aggregator"),
          **_prefixed(dec, "decoder")}
    params, report = convert_state_dict(sd, cfg, template)
    _assert_tree_equal(template, params)

    # every untransferred checkpoint tensor is a KNOWN dead one
    assert report["unused"] == []
    assert any(k.endswith("is_intersection_embed") for k in report["skipped"])
    assert "decoder.hidden" in report["skipped"]


def test_convert_baseline_family_round_trip():
    cfg = load_config(BASE_CFG)
    template = _template(cfg)

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_grid")
    agg_mod = _ref("models.aggregators.agg_hivt")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_grid")

    enc_kw = cfg.component("encoder")[1]
    enc = enc_mod.LocalEncoder(**enc_kw).eval()
    agg = agg_mod.GlobalInteractor(**cfg.component("aggregator")[1]).eval()
    dec = dec_mod.MLPDecoder(**cfg.component("decoder")[1]).eval()

    _set_aa(enc.aa_encoder, template["encoder"]["aa_encoder"])
    _set_temporal(enc.temporal_encoder, template["encoder"]["temporal_encoder"],
                  int(enc_kw.get("num_temporal_layers", 4)))
    _set_al(enc.al_encoder, template["encoder"]["al_encoder"])
    _set_aggregator(agg, template["aggregator"],
                    int(cfg.component("aggregator")[1].get("num_layers", 3)))
    _set_mlp_decoder(dec, template["decoder"])

    sd = {**_prefixed(enc, "encoder"), **_prefixed(agg, "aggregator"),
          **_prefixed(dec, "decoder")}
    params, report = convert_state_dict(sd, cfg, template)
    _assert_tree_equal(template, params)
    assert report["unused"] == []


@pytest.mark.slow
def test_convert_cli_end_to_end(tmp_path, rng):
    """Fake Lightning ckpt → scripts/convert_checkpoint.py → test.py --ckpt."""
    import os
    import subprocess
    import sys

    import yaml

    from test_cli import ENV, _make_config, _make_data
    from trajsde_tpu.train.checkpoint import CheckpointManager

    cfg = load_config(SDE_CFG)
    template = _template(cfg)

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")
    agg_mod = _ref("models.aggregators.agg_hivt")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_sde")
    enc = enc_mod.LocalEncoderSDESepPara2(**cfg.component("encoder")[1]).eval()
    agg = agg_mod.GlobalInteractor(**cfg.component("aggregator")[1]).eval()
    dec = dec_mod.SDEDecoder(**cfg.component("decoder")[1]).eval()
    _set_sde_encoder(enc, template["encoder"])
    _set_aggregator(agg, template["aggregator"], 3)
    _set_sde_decoder(dec, template["decoder"])
    sd = {**{f"encoder.{k}": v for k, v in enc.state_dict().items()},
          **{f"aggregator.{k}": v for k, v in agg.state_dict().items()},
          **{f"decoder.{k}": v for k, v in dec.state_dict().items()}}
    ckpt_path = tmp_path / "lightning.ckpt"
    torch.save({"state_dict": sd, "epoch": 3}, ckpt_path)

    out = tmp_path / "converted"
    r = subprocess.run(
        [sys.executable, "scripts/convert_checkpoint.py", "-c", SDE_CFG,
         "--torch-ckpt", str(ckpt_path), "--out", str(out)],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.exists()

    restored = CheckpointManager(str(tmp_path / "mgr")).restore_params(
        template, str(out)
    )
    _assert_tree_equal(template, restored)

    # the converted checkpoint drives the eval CLI end to end
    _make_data(tmp_path, rng)
    eval_cfg = _make_config(tmp_path)
    r = subprocess.run(
        [sys.executable, "test.py", "-c", eval_cfg, "--ckpt", str(out),
         "--num-actors", "6", "--num-lanes", "8"],
        env=ENV, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ADE_T" in r.stdout


def test_convert_reports_unknown_and_missing_keys():
    cfg = load_config(SDE_CFG)
    template = _template(cfg)

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")
    agg_mod = _ref("models.aggregators.agg_hivt")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_sde")
    sd = {
        **_prefixed(enc_mod.LocalEncoderSDESepPara2(
            **cfg.component("encoder")[1]), "encoder"),
        **_prefixed(agg_mod.GlobalInteractor(
            **cfg.component("aggregator")[1]), "aggregator"),
        **_prefixed(dec_mod.SDEDecoder(**cfg.component("decoder")[1]), "decoder"),
    }

    # torchmetrics-style buffers are reported, not fatal
    sd2 = dict(sd)
    sd2["metrics_vl.ADE_T.sum"] = np.zeros(())
    _, report = convert_state_dict(sd2, cfg, template)
    assert report["unused"] == ["metrics_vl.ADE_T.sum"]

    # a missing live tensor is fatal (silent partial conversion is worse)
    sd3 = dict(sd)
    del sd3["encoder.hidden"]
    with pytest.raises(KeyError, match="encoder.hidden"):
        convert_state_dict(sd3, cfg, template)
