"""Reference-checkpoint import: torch Lightning ``.ckpt`` → flax params.

A user migrating from the reference (daeheepark/TrajSDE) has trained
checkpoints produced by Lightning's ``ModelCheckpoint``
(``/root/reference/train.py:52``): a torch pickle whose ``state_dict``
holds ``encoder.* / aggregator.* / decoder.*`` tensors named by the
reference's module attributes.  This module maps every live tensor onto
this framework's flax parameter tree so the checkpoint can be served or
fine-tuned here without retraining (use ``scripts/convert_checkpoint.py``,
then ``train.py --wonly`` / ``test.py --ckpt``).

The name correspondences are the same ones the transplant parity tier
verifies numerically (``tests/test_reference_transplant.py`` executes the
reference's own modules with transplanted weights and asserts equal
outputs); here they run in the opposite direction.  Known-dead reference
tensors are skipped explicitly (see ``_SKIP_SUFFIXES``): the ALEncoder's
intersection/turn/control embeddings are never consumed by any live
config (``enc_hivt_nusargo_grid.py:325-330`` — forward args commented
out), the decoder's ``hidden`` parameter is never read in its forward
(``dec_hivt_nusargo_sde.py:69,86`` — the rollout state comes from
``loc_emb``), and the OU prior's ``theta``/``mu`` are frozen constants
(``enc_hivt_nusargo_sde_sep2.py:405-406``).

Transforms: ``nn.Linear.weight`` is ``[out, in]`` → flax kernel is its
transpose; LayerNorm ``weight``→``scale``; the temporal encoder's
token/positional parameters drop their singleton broadcast axis.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import numpy as np

FlaxPath = Tuple[str, ...]

# reference tensors with no live consumer (file:line in the module docstring)
_SKIP_SUFFIXES = (
    "is_intersection_embed",
    "turn_direction_embed",
    "traffic_control_embed",
    "h_func.theta",
    "h_func.mu",
    # registered buffer: the causal mask is a derived constant the flax
    # module rebuilds (``enc_hivt_nusargo_grid.py:233,250-254``)
    "temporal_encoder.attn_mask",
)
_SKIP_EXACT = ("decoder.hidden",)

_T_LINEAR = lambda w: np.ascontiguousarray(np.asarray(w).T)
_IDENT = lambda w: np.asarray(w)


class RuleSet:
    """flax path → (torch state_dict key, ndarray transform)."""

    def __init__(self) -> None:
        self.rules: Dict[FlaxPath, Tuple[str, Callable[[Any], np.ndarray]]] = {}

    def param(self, fpath: FlaxPath, tkey: str, fn: Callable = _IDENT) -> None:
        assert fpath not in self.rules, fpath
        self.rules[fpath] = (tkey, fn)

    def linear(self, fpath: FlaxPath, tmod: str) -> None:
        self.param(fpath + ("kernel",), f"{tmod}.weight", _T_LINEAR)
        self.param(fpath + ("bias",), f"{tmod}.bias")

    def ln(self, fpath: FlaxPath, tmod: str) -> None:
        self.param(fpath + ("scale",), f"{tmod}.weight")
        self.param(fpath + ("bias",), f"{tmod}.bias")


# --------------------------------------------------------------------------
# shared blocks (``models/utils/embedding.py:22-70``, ``ode_utils.py:111-152``)
# --------------------------------------------------------------------------
def _single_embed(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    for i, idx in enumerate((0, 3, 6)):
        m.linear(fp + (f"Dense_{i}",), f"{tp}.embed.{idx}")
        m.ln(fp + (f"LayerNorm_{i}",), f"{tp}.embed.{idx + 1}")


def _multi_embed(m: RuleSet, fp: FlaxPath, tp: str, n_inputs: int = 2) -> None:
    for i in range(n_inputs):
        m.linear(fp + (f"in{i}_dense0",), f"{tp}.module_list.{i}.0")
        m.ln(fp + (f"in{i}_ln0",), f"{tp}.module_list.{i}.1")
        m.linear(fp + (f"in{i}_dense1",), f"{tp}.module_list.{i}.3")
    m.ln(fp + ("aggr_ln0",), f"{tp}.aggr_embed.0")
    m.linear(fp + ("aggr_dense",), f"{tp}.aggr_embed.2")
    m.ln(fp + ("aggr_ln1",), f"{tp}.aggr_embed.3")


def _attn(m: RuleSet, fp: FlaxPath, tp: str, pairs) -> None:
    for flax_n, ref_n in pairs:
        m.linear(fp + ("attn", flax_n), f"{tp}.{ref_n}")


_AA_ATTN = [(n, n) for n in
            ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj")]
_GLOBAL_ATTN = [
    ("lin_q", "lin_q_node"), ("lin_k", "lin_k_node"), ("lin_v", "lin_v_node"),
    ("lin_k_edge", "lin_k_edge"), ("lin_v_edge", "lin_v_edge"),
    ("lin_ih", "lin_ih"), ("lin_hh", "lin_hh"), ("lin_self", "lin_self"),
    ("out_proj", "out_proj"),
]


def _mlp_block(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    m.linear(fp + ("mlp", "Dense_0"), f"{tp}.0")
    m.linear(fp + ("mlp", "Dense_1"), f"{tp}.3")


def _gru(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    for gate, seq in (("update_gate", "update_gate"), ("reset_gate", "reset_gate"),
                      ("new_state", "new_state_net")):
        m.linear(fp + (f"{gate}_0",), f"{tp}.{seq}.0")
        m.linear(fp + (f"{gate}_1",), f"{tp}.{seq}.2")


def _ffunc(m: RuleSet, fp: FlaxPath, tp: str, num_layers: int = 2) -> None:
    # net = Linear(D+2,D) + num_layers×(Tanh, Linear): linears at even idx
    for i in range(num_layers + 1):
        m.linear(fp + (f"dense{i}",), f"{tp}.net.{2 * i}")


def _gfunc(m: RuleSet, fp: FlaxPath, tp: str, num_layers: int = 2) -> None:
    for i in range(num_layers):
        m.linear(fp + (f"dense{i}",), f"{tp}.net.{2 * i}")
    m.linear(fp + ("dense_out",), f"{tp}.net.{2 * num_layers}")


# --------------------------------------------------------------------------
# encoders (``enc_hivt_nusargo_grid.py``, ``enc_hivt_nusargo_sde_sep2.py``)
# --------------------------------------------------------------------------
def _aa_encoder(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    m.param(fp + ("bos_token",), f"{tp}.bos_token")
    _single_embed(m, fp + ("center_embed",), f"{tp}.center_embed")
    _multi_embed(m, fp + ("nbr_embed",), f"{tp}.nbr_embed")
    _attn(m, fp, tp, _AA_ATTN)
    m.ln(fp + ("norm1",), f"{tp}.norm1")
    m.ln(fp + ("norm2",), f"{tp}.norm2")
    _mlp_block(m, fp, f"{tp}.mlp")


def _al_encoder(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    _multi_embed(m, fp + ("lane_embed",), f"{tp}.lane_embed")
    _attn(m, fp, tp, _AA_ATTN)
    m.ln(fp + ("norm1",), f"{tp}.norm1")
    m.ln(fp + ("norm2",), f"{tp}.norm2")
    _mlp_block(m, fp, f"{tp}.mlp")


def _temporal_encoder(m: RuleSet, fp: FlaxPath, tp: str, num_layers: int = 4) -> None:
    squeeze1 = lambda w: np.asarray(w)[:, 0, :]
    m.param(fp + ("padding_token",), f"{tp}.padding_token", squeeze1)
    m.param(fp + ("cls_token",), f"{tp}.cls_token", squeeze1)
    m.param(fp + ("pos_embed",), f"{tp}.pos_embed", squeeze1)
    for i in range(num_layers):
        lp, lt = fp + (f"layer{i}",), f"{tp}.transformer_encoder.layers.{i}"
        m.param(lp + ("self_attn", "in_proj", "kernel"),
                f"{lt}.self_attn.in_proj_weight", _T_LINEAR)
        m.param(lp + ("self_attn", "in_proj", "bias"), f"{lt}.self_attn.in_proj_bias")
        m.linear(lp + ("self_attn", "out_proj"), f"{lt}.self_attn.out_proj")
        m.ln(lp + ("norm1",), f"{lt}.norm1")
        m.ln(lp + ("norm2",), f"{lt}.norm2")
        m.linear(lp + ("mlp", "Dense_0"), f"{lt}.linear1")
        m.linear(lp + ("mlp", "Dense_1"), f"{lt}.linear2")
    m.ln(fp + ("norm",), f"{tp}.transformer_encoder.norm")


def _local_encoder(m: RuleSet, fp: FlaxPath, tp: str, num_temporal_layers: int) -> None:
    """Vanilla HiVT ``LocalEncoder`` (``enc_hivt_nusargo_grid.py:22-92``)."""
    _aa_encoder(m, fp + ("aa_encoder",), f"{tp}.aa_encoder")
    _temporal_encoder(m, fp + ("temporal_encoder",), f"{tp}.temporal_encoder",
                      num_temporal_layers)
    _al_encoder(m, fp + ("al_encoder",), f"{tp}.al_encoder")


def _sde_encoder(m: RuleSet, fp: FlaxPath, tp: str, sde_layers: int) -> None:
    """``LocalEncoderSDESepPara2`` (``enc_hivt_nusargo_sde_sep2.py:25-63``)."""
    _aa_encoder(m, fp + ("aa_encoder",), f"{tp}.aa_encoder")
    _al_encoder(m, fp + ("al_encoder",), f"{tp}.al_encoder")
    _gru(m, fp + ("sde_rnn", "gru"), f"{tp}.gru_unit")
    _ffunc(m, fp + ("sde_rnn", "f_func"), f"{tp}.lsde_func.f_func", sde_layers)
    _gfunc(m, fp + ("sde_rnn", "g_nus"), f"{tp}.lsde_func.g_nus", sde_layers)
    _gfunc(m, fp + ("sde_rnn", "g_argo"), f"{tp}.lsde_func.g_argo", sde_layers)
    m.param(fp + ("hidden",), f"{tp}.hidden")


# --------------------------------------------------------------------------
# aggregator & decoders (``agg_hivt.py``, ``dec_hivt_nusargo_{grid,sde}.py``)
# --------------------------------------------------------------------------
def _aggregator(m: RuleSet, fp: FlaxPath, tp: str, num_layers: int = 3) -> None:
    _multi_embed(m, fp + ("rel_embed",), f"{tp}.rel_embed")
    for i in range(num_layers):
        lp, lt = fp + (f"layer{i}",), f"{tp}.global_interactor_layers.{i}"
        _attn(m, lp, lt, _GLOBAL_ATTN)
        m.ln(lp + ("norm1",), f"{lt}.norm1")
        m.ln(lp + ("norm2",), f"{lt}.norm2")
        _mlp_block(m, lp, f"{lt}.mlp")
    m.ln(fp + ("norm",), f"{tp}.norm")
    m.linear(fp + ("multihead_proj",), f"{tp}.multihead_proj")


def _mlp_decoder(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    """``MLPDecoder`` (``dec_hivt_nusargo_grid.py:10-64``)."""
    m.linear(fp + ("aggr_dense",), f"{tp}.aggr_embed.0")
    m.ln(fp + ("aggr_ln",), f"{tp}.aggr_embed.1")
    for pre, seq, idxs in (("loc", "loc", (0, 3)), ("scale", "scale", (0, 3)),
                           ("pi", "pi", (0, 3, 6))):
        for i, idx in enumerate(idxs):
            m.linear(fp + (f"{pre}_dense{i}",), f"{tp}.{seq}.{idx}")
            if i < len(idxs) - 1:  # LN follows every linear but the head
                m.ln(fp + (f"{pre}_ln{i}",), f"{tp}.{seq}.{idx + 1}")


def _sde_decoder(m: RuleSet, fp: FlaxPath, tp: str) -> None:
    """``SDEDecoder`` (``dec_hivt_nusargo_sde.py:14-105``); its FFunc/GFunc
    are the fixed-depth local copies (``:107-160``), not config-scaled."""
    m.linear(fp + ("aggr_dense",), f"{tp}.aggr_embed.0")
    m.ln(fp + ("aggr_ln",), f"{tp}.aggr_embed.1")
    _ffunc(m, fp + ("sde_rollout", "f_func"), f"{tp}.lsde_func.f_func", 2)
    _gfunc(m, fp + ("sde_rollout", "g_func"), f"{tp}.lsde_func.g_func", 2)
    for pre, seq in (("loc", "decoder"), ("scale", "scale"), ("pi", "pi")):
        m.linear(fp + (f"{pre}_layers_0",), f"{tp}.{seq}.0")
        m.ln(fp + (f"{pre}_layers_1",), f"{tp}.{seq}.1")
        m.linear(fp + (f"{pre}_layers_2",), f"{tp}.{seq}.3")


# --------------------------------------------------------------------------
# top level
# --------------------------------------------------------------------------
_ENCODERS = {
    "LocalEncoder": lambda m, kw: _local_encoder(
        m, ("encoder",), "encoder", int(kw.get("num_temporal_layers", 4))),
    "LocalEncoderSDESepPara2": lambda m, kw: _sde_encoder(
        m, ("encoder",), "encoder", int(kw.get("sde_layers", 2))),
}
_DECODERS = {
    "MLPDecoder": lambda m, kw: _mlp_decoder(m, ("decoder",), "decoder"),
    "SDEDecoder": lambda m, kw: _sde_decoder(m, ("decoder",), "decoder"),
}


def build_rules(cfg) -> RuleSet:
    """RuleSet for an ``ExperimentConfig`` (the reference YAML schema)."""
    from trajsde_tpu.registry import ALIASES

    # rules are keyed by the REFERENCE class names; a config written with
    # the native registry names (e.g. LocalEncoderSDESep) must resolve to
    # the same rules
    canon = {native: ref for ref, native in ALIASES.items()}

    m = RuleSet()
    enc_name, enc_kw = cfg.component("encoder")
    agg_name, agg_kw = cfg.component("aggregator")
    dec_name, dec_kw = cfg.component("decoder")
    enc_name = canon.get(enc_name, enc_name)
    agg_name = canon.get(agg_name, agg_name)
    dec_name = canon.get(dec_name, dec_name)
    if enc_name not in _ENCODERS:
        raise ValueError(f"no conversion rules for encoder {enc_name!r}")
    _ENCODERS[enc_name](m, enc_kw)
    if agg_name != "GlobalInteractor":
        raise ValueError(f"no conversion rules for aggregator {agg_name!r}")
    _aggregator(m, ("aggregator",), "aggregator",
                int(agg_kw.get("num_global_layers", agg_kw.get("num_layers", 3))))
    if dec_name not in _DECODERS:
        raise ValueError(f"no conversion rules for decoder {dec_name!r}")
    _DECODERS[dec_name](m, dec_kw)
    return m


def convert_state_dict(state_dict: Dict[str, Any], cfg, template_params):
    """Map a reference ``state_dict`` onto ``template_params``' structure.

    Returns ``(params, report)`` where ``report`` lists ``skipped`` (known
    dead tensors present in the checkpoint) and ``unused`` (unrecognized
    keys, e.g. torchmetrics buffers).  Raises on missing tensors or shape
    mismatches — a silently partial conversion would be worse than none.
    """
    import jax

    rules = build_rules(cfg).rules
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    flat = jax.tree_util.tree_flatten_with_path(template_params)
    leaves, treedef = flat
    out_leaves = []
    used: set = set()
    for path, leaf in leaves:
        fpath = tuple(str(getattr(k, "key", k)) for k in path)
        if fpath not in rules:
            raise KeyError(
                f"flax parameter {'/'.join(fpath)} has no conversion rule — "
                "the config does not match the checkpoint's architecture"
            )
        tkey, fn = rules[fpath]
        if tkey not in sd:
            raise KeyError(
                f"reference checkpoint is missing {tkey!r} "
                f"(needed for {'/'.join(fpath)})"
            )
        arr = fn(sd[tkey])
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {'/'.join(fpath)}: checkpoint {tkey} "
                f"gives {arr.shape}, model expects {tuple(leaf.shape)}"
            )
        used.add(tkey)
        out_leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype))

    skipped: List[str] = []
    unused: List[str] = []
    for k in sd:
        if k in used:
            continue
        if k in _SKIP_EXACT or k.endswith(_SKIP_SUFFIXES):
            skipped.append(k)
        else:
            unused.append(k)

    params = jax.tree_util.tree_unflatten(treedef, out_leaves)
    return params, {"skipped": sorted(skipped), "unused": sorted(unused)}
