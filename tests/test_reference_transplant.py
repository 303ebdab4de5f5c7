"""Weight-transplant parity: flax forwards vs the REFERENCE'S OWN torch code.

Strongest parity evidence available without the reference's conda env:
the reference modules at ``/root/reference`` are imported and EXECUTED
directly (torch CPU is available; the missing heavyweight deps —
torch_geometric / torchsde / torchdiffeq / pytorch_lightning — are
stubbed at the import layer only, never on any executed code path).
Weights are exported from the flax modules, transplanted into the torch
modules (kernel transposes, packed-qkv layout), and both forwards are
compared to ~1e-5 on the same inputs.

Covered (pure-torch reference code paths — the PyG message-passing blocks
are covered by the numpy oracles in ``test_reference_oracle.py``):

* SingleInputEmbedding / MultipleInputEmbedding — ``models/utils/embedding.py:20-68``
* GRU_Unit                                      — ``models/utils/ode_utils.py:111-152``
* TemporalEncoder (torch TransformerEncoder)    — ``enc_hivt_nusargo_grid.py:218-291``
* FFunc / HFunc / GFunc / LSDEFunc.g routing    — ``enc_hivt_nusargo_sde_sep2.py:372-482``
* MLPDecoder                                    — ``dec_hivt_nusargo_grid.py:10-64``
"""
import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not available"
)


# ---------------------------------------------------------------------------
# import-layer stubs (module-level imports only; nothing executed here is on
# a tested code path)
# ---------------------------------------------------------------------------
class _Name(str):
    """A string that is also callable (``NOISE_TYPES.all()`` pattern)."""

    def __call__(self):
        return [str(self)]


class _Names:
    """Attribute bag: any attribute access returns the attribute's name."""

    def __getattr__(self, k):
        return _Name(k)


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_stubs():
    if "torch_geometric" in sys.modules:
        return

    class _MessagePassing(torch.nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

    tg = _mod("torch_geometric")
    tg.data = _mod(
        "torch_geometric.data", Data=type("Data", (), {}), Batch=type("Batch", (), {})
    )
    tg.nn = _mod("torch_geometric.nn")
    tg.nn.conv = _mod("torch_geometric.nn.conv", MessagePassing=_MessagePassing)
    tg.typing = _mod("torch_geometric.typing", Adj=object, OptTensor=object, Size=object)
    tg.utils = _mod("torch_geometric.utils", softmax=None, subgraph=None)

    _mod("torchdiffeq", odeint=None)
    _mod("pytorch_lightning", LightningModule=torch.nn.Module)

    class _SDEIto:
        def __init__(self, noise_type="diagonal"):
            self.noise_type = noise_type
            self.sde_type = "ito"

    ts = _mod("torchsde", SDEIto=_SDEIto, sdeint=None, sdeint_adjoint=None)
    ts._core = _mod("torchsde._core")
    ts._core.base_sde = _mod(
        "torchsde._core.base_sde",
        BaseSDE=type("BaseSDE", (torch.nn.Module,), {}),
        ForwardSDE=type("ForwardSDE", (torch.nn.Module,), {}),
    )
    ts._core.methods = _mod("torchsde._core.methods")
    ts._core.methods.euler = _mod(
        "torchsde._core.methods.euler", Euler=type("Euler", (), {})
    )
    ts._core.misc = _mod("torchsde._core.misc")
    ts._core.base_solver = _mod(
        "torchsde._core.base_solver",
        BaseSDESolver=type("BaseSDESolver", (), {}),
        interp=types.SimpleNamespace(),
        adaptive_stepping=types.SimpleNamespace(),
    )
    ts._brownian = _mod(
        "torchsde._brownian", BaseBrownian=object, BrownianInterval=object
    )
    _mod("torchsde.settings", LEVY_AREA_APPROXIMATIONS=_Names(), METHODS=_Names(),
         NOISE_TYPES=_Names(), SDE_TYPES=_Names())
    import typing

    _mod("torchsde.types", Any=typing.Any, Dict=typing.Dict, Tuple=typing.Tuple,
         Optional=typing.Optional, Scalar=typing.Union[float, int],
         Tensor=typing.Any, Tensors=typing.Any, TensorOrTensors=typing.Any,
         Vector=typing.Any)


def _ref(name):
    _install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    return importlib.import_module(name)


# ---------------------------------------------------------------------------
# transplant helpers: flax param dict → torch modules
# ---------------------------------------------------------------------------
def T(x):
    return torch.from_numpy(np.asarray(jax.device_get(x)).copy())


@torch.no_grad()
def set_linear(mod, p):
    mod.weight.copy_(T(p["kernel"]).t())
    mod.bias.copy_(T(p["bias"]))


@torch.no_grad()
def set_ln(mod, p):
    mod.weight.copy_(T(p["scale"]))
    mod.bias.copy_(T(p["bias"]))


def allclose(torch_out, jax_out, tol=2e-5):
    np.testing.assert_allclose(
        torch_out.detach().numpy(), np.asarray(jax_out), rtol=tol, atol=tol
    )


# ---------------------------------------------------------------------------
# 1. embeddings (``models/utils/embedding.py:20-68``)
# ---------------------------------------------------------------------------
def test_single_embedding_transplant(rng):
    from trajsde_tpu.models.embedding import SingleInputEmbedding

    emb_ref = _ref("models.utils.embedding")
    D = 16
    x = rng.normal(size=(7, 2)).astype(np.float32)
    mine = SingleInputEmbedding(D)
    params = mine.init(jax.random.key(0), jnp.asarray(x))["params"]
    got = mine.apply({"params": params}, jnp.asarray(x))

    ref = emb_ref.SingleInputEmbedding(2, D).eval()
    for i, idx in enumerate((0, 3, 6)):   # Sequential: Linear at 0/3/6, LN at 1/4/7
        set_linear(ref.embed[idx], params[f"Dense_{i}"])
        set_ln(ref.embed[idx + 1], params[f"LayerNorm_{i}"])
    allclose(ref(torch.from_numpy(x)), got)


def test_multiple_embedding_transplant(rng):
    from trajsde_tpu.models.embedding import MultipleInputEmbedding

    emb_ref = _ref("models.utils.embedding")
    D = 16
    xs = [rng.normal(size=(7, 2)).astype(np.float32) for _ in range(2)]
    mine = MultipleInputEmbedding(D)
    params = mine.init(jax.random.key(0), [jnp.asarray(v) for v in xs])["params"]
    got = mine.apply({"params": params}, [jnp.asarray(v) for v in xs])

    ref = emb_ref.MultipleInputEmbedding([2, 2], D).eval()
    for i in range(2):
        set_linear(ref.module_list[i][0], params[f"in{i}_dense0"])
        set_ln(ref.module_list[i][1], params[f"in{i}_ln0"])
        set_linear(ref.module_list[i][3], params[f"in{i}_dense1"])
    set_ln(ref.aggr_embed[0], params["aggr_ln0"])
    set_linear(ref.aggr_embed[2], params["aggr_dense"])
    set_ln(ref.aggr_embed[3], params["aggr_ln1"])
    allclose(ref([torch.from_numpy(v) for v in xs]), got)


# ---------------------------------------------------------------------------
# 2. GRU_Unit (``models/utils/ode_utils.py:111-152``)
# ---------------------------------------------------------------------------
def test_gru_unit_transplant(rng):
    from trajsde_tpu.models.layers import GRUUnit

    ode_ref = _ref("models.utils.ode_utils")
    N, D = 7, 16
    h = rng.normal(size=(N, D)).astype(np.float32)
    x = rng.normal(size=(N, D)).astype(np.float32)
    mask = rng.uniform(size=N) < 0.6

    mine = GRUUnit(latent_dim=D, n_units=D)
    params = mine.init(
        jax.random.key(0), jnp.asarray(h), jnp.asarray(x), jnp.asarray(mask)
    )["params"]
    got = mine.apply(
        {"params": params}, jnp.asarray(h), jnp.asarray(x), jnp.asarray(mask)
    )

    ref = ode_ref.GRU_Unit(latent_dim=D, input_dim=D, n_units=D).eval()
    for gate, seq in (
        ("update_gate", ref.update_gate),
        ("reset_gate", ref.reset_gate),
        ("new_state", ref.new_state_net),
    ):
        set_linear(seq[0], params[f"{gate}_0"])
        set_linear(seq[2], params[f"{gate}_1"])
    out = ref(torch.from_numpy(h), torch.from_numpy(x), torch.from_numpy(mask))
    allclose(out, got)


# ---------------------------------------------------------------------------
# 3. TemporalEncoder (``enc_hivt_nusargo_grid.py:218-291``) — the reference's
#    torch.nn.TransformerEncoder stack executed verbatim
# ---------------------------------------------------------------------------
def test_temporal_encoder_transplant(rng):
    from trajsde_tpu.models.local_encoder import TemporalEncoder

    grid_ref = _ref("models.encoders.enc_hivt_nusargo_grid")
    A, Th, D, H, L = 5, 6, 16, 4, 4
    x = rng.normal(size=(1, A, Th, D)).astype(np.float32)
    padding = rng.uniform(size=(1, A, Th)) < 0.3

    mine = TemporalEncoder(historical_steps=Th, embed_dim=D, num_heads=H, num_layers=L)
    params = mine.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(padding))["params"]
    got = mine.apply({"params": params}, jnp.asarray(x), jnp.asarray(padding))[0]

    ref = grid_ref.TemporalEncoder(
        historical_steps=Th, embed_dim=D, num_heads=H, num_layers=L
    ).eval()
    with torch.no_grad():
        ref.padding_token.copy_(T(params["padding_token"])[:, None, :])
        ref.cls_token.copy_(T(params["cls_token"])[:, None, :])
        ref.pos_embed.copy_(T(params["pos_embed"])[:, None, :])
        for i in range(L):
            lp = params[f"layer{i}"]
            layer = ref.transformer_encoder.layers[i]
            layer.self_attn.in_proj_weight.copy_(T(lp["self_attn"]["in_proj"]["kernel"]).t())
            layer.self_attn.in_proj_bias.copy_(T(lp["self_attn"]["in_proj"]["bias"]))
            set_linear(layer.self_attn.out_proj, lp["self_attn"]["out_proj"])
            set_ln(layer.norm1, lp["norm1"])
            set_ln(layer.norm2, lp["norm2"])
            set_linear(layer.linear1, lp["mlp"]["Dense_0"])
            set_linear(layer.linear2, lp["mlp"]["Dense_1"])
        set_ln(ref.transformer_encoder.norm, params["norm"])

    # reference layout: x [T, N, D] seq-first, padding [N, T].  The module
    # targets torch 1.12, whose TransformerEncoder called
    # ``layer(x, src_mask=...)``; torch 2.x adds an ``is_causal`` kwarg the
    # reference layer doesn't accept, so replay the 1.12 call convention
    # around the reference's own TemporalEncoderLayer/MHA code
    # (``enc_hivt_nusargo_grid.py:241-248``).
    x_seq = torch.from_numpy(np.transpose(x[0], (1, 0, 2)))
    pad = torch.from_numpy(padding[0])
    h = torch.where(pad.t().unsqueeze(-1), ref.padding_token, x_seq)
    h = torch.cat((h, ref.cls_token.expand(-1, h.shape[1], -1)), dim=0)
    h = h + ref.pos_embed
    for layer in ref.transformer_encoder.layers:
        h = layer(h, src_mask=ref.attn_mask)
    out = ref.transformer_encoder.norm(h)[-1]
    allclose(out, got, tol=5e-5)


# ---------------------------------------------------------------------------
# 4. SDE functions + dual-diffusion routing
#    (``enc_hivt_nusargo_sde_sep2.py:372-482``)
# ---------------------------------------------------------------------------
def test_sde_funcs_transplant(rng):
    from trajsde_tpu.models.sde import FFunc, GFunc

    sde_ref = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")
    N, D, t = 8, 16, 0.37
    y = rng.normal(size=(N, D)).astype(np.float32)

    # FFunc: net = Linear(D+2,D) + 2×(Tanh, Linear)  (:372-398)
    mine_f = FFunc(D, num_layers=2)
    pf = mine_f.init(jax.random.key(0), jnp.float32(t), jnp.asarray(y))["params"]
    got_f = mine_f.apply({"params": pf}, jnp.float32(t), jnp.asarray(y))
    ref_f = sde_ref.FFunc(embed_dim=D, num_layers=2).eval()
    with torch.no_grad():
        for i, idx in enumerate((0, 2, 4)):
            set_linear(ref_f.net[idx], pf[f"dense{i}"])
    allclose(ref_f(t, torch.from_numpy(y)), got_f)

    # HFunc: frozen OU pull θ(μ−y), θ=1, μ=0  (:401-409)
    ref_h = sde_ref.HFunc().eval()
    np.testing.assert_allclose(
        ref_h(t, torch.from_numpy(y)).detach().numpy(), -y, rtol=1e-6, atol=1e-6
    )

    # GFunc + LSDEFunc dual routing  (:412-482)
    mine_g = GFunc(D, num_layers=2)
    pg_nus = mine_g.init(jax.random.key(1), jnp.float32(t), jnp.asarray(y))["params"]
    pg_argo = mine_g.init(jax.random.key(2), jnp.float32(t), jnp.asarray(y))["params"]

    def set_g(ref_g, pg):
        with torch.no_grad():
            set_linear(ref_g.net[0], pg["dense0"])
            set_linear(ref_g.net[2], pg["dense1"])
            set_linear(ref_g.net[4], pg["dense_out"])

    ref_gn = sde_ref.GFunc(embed_dim=D, num_layers=2).eval()
    ref_ga = sde_ref.GFunc(embed_dim=D, num_layers=2).eval()
    set_g(ref_gn, pg_nus)
    set_g(ref_ga, pg_argo)
    allclose(
        ref_gn(t, torch.from_numpy(y)),
        mine_g.apply({"params": pg_nus}, jnp.float32(t), jnp.asarray(y)),
    )

    lsde = sde_ref.LSDEFunc(
        f=ref_f, g_nus=ref_gn, g_Argo2=ref_ga, h=ref_h, embed_dim=D
    )
    nus_mask = rng.uniform(size=N) < 0.5
    ref_out = lsde.g(t, torch.from_numpy(y), torch.from_numpy(nus_mask))

    # mine: per-row select between the two scalar heads, broadcast to D
    g_n = mine_g.apply({"params": pg_nus}, jnp.float32(t), jnp.asarray(y))
    g_a = mine_g.apply({"params": pg_argo}, jnp.float32(t), jnp.asarray(y))
    got = jnp.where(jnp.asarray(nus_mask)[:, None], g_n, g_a)
    got = jnp.broadcast_to(got, (N, D))
    allclose(ref_out, got)


# ---------------------------------------------------------------------------
# 5. MLPDecoder (``dec_hivt_nusargo_grid.py:10-64``)
# ---------------------------------------------------------------------------
def test_mlp_decoder_transplant(rng):
    from trajsde_tpu.models.decoders import MLPDecoder
    from test_reference_oracle import _tiny_scene

    dec_ref = _ref("models.decoders.dec_hivt_nusargo_grid")
    A, D, F, Tf = 3, 16, 2, 4
    scene = _tiny_scene(rng, A=A, Th=5, Tf=Tf)
    local = rng.normal(size=(1, A, D)).astype(np.float32)
    glob = rng.normal(size=(1, F, A, D)).astype(np.float32)

    mine = MLPDecoder(local_channels=D, global_channels=D, future_steps=Tf, num_modes=F)
    params = mine.init(
        jax.random.key(0), scene, jnp.asarray(local), jnp.asarray(glob)
    )["params"]
    out = mine.apply({"params": params}, scene, jnp.asarray(local), jnp.asarray(glob))

    ref = dec_ref.MLPDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        uncertain=True, min_scale=1e-3,
    ).eval()
    with torch.no_grad():
        set_linear(ref.aggr_embed[0], params["aggr_dense"])
        set_ln(ref.aggr_embed[1], params["aggr_ln"])
        for pre, seq, idxs in (
            ("loc", ref.loc, (0, 3)),
            ("scale", ref.scale, (0, 3)),
            ("pi", ref.pi, (0, 3, 6)),
        ):
            for i, idx in enumerate(idxs):
                set_linear(seq[idx], params[f"{pre}_dense{i}"])
                if idx + 1 < len(seq) and isinstance(seq[idx + 1], torch.nn.LayerNorm):
                    set_ln(seq[idx + 1], params[f"{pre}_ln{i}"])

    data = {"padding_mask": torch.from_numpy(np.asarray(scene.padding_mask)[0])}
    ref_out = ref(
        data,
        torch.from_numpy(local[0]),
        torch.from_numpy(np.broadcast_to(glob[0], (F, A, D)).copy()),
    )
    allclose(ref_out["loc"], out["loc"][0], tol=5e-5)
    allclose(ref_out["pi"], out["pi"][0], tol=5e-5)
    np.testing.assert_array_equal(
        ref_out["reg_mask"].numpy(), np.asarray(out["reg_mask"])[0]
    )
