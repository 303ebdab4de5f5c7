"""Weight-transplant parity: flax forwards vs the REFERENCE'S OWN torch code.

Strongest parity evidence available without the reference's conda env:
the reference modules at ``/root/reference`` are imported and EXECUTED
directly (torch CPU is available; the missing heavyweight deps —
torch_geometric / torchsde / torchdiffeq / pytorch_lightning — are
stubbed at the import layer only, never on any executed code path).
Weights are exported from the flax modules, transplanted into the torch
modules (kernel transposes, packed-qkv layout), and both forwards are
compared to ~1e-5 on the same inputs.

Covered — pure-torch paths run as-is; the PyG message-passing blocks run
through a mini propagate engine (same aggr='add'/node_dim=0 protocol) so
their ``message``/``update`` code executes verbatim:

* SingleInputEmbedding / MultipleInputEmbedding — ``models/utils/embedding.py:20-68``
* GRU_Unit                                      — ``models/utils/ode_utils.py:111-152``
* TemporalEncoder (torch TransformerEncoder)    — ``enc_hivt_nusargo_grid.py:218-291``
* FFunc / HFunc / GFunc / LSDEFunc.g routing    — ``enc_hivt_nusargo_sde_sep2.py:372-482``
* MLPDecoder                                    — ``dec_hivt_nusargo_grid.py:10-64``
* AAEncoder (ragged per-step subgraphs)         — ``enc_hivt_nusargo_grid.py:95-215``
* ALEncoder (lane→actor cross attention)        — ``enc_hivt_nusargo_grid.py:294-398``
* GlobalInteractor (full aggregator forward)    — ``agg_hivt.py:18-135``
* L2 / DiffBCE / LaplaceNLL losses              — ``losses/*.py`` (executed; caught a
  real 2× Laplace-reduction bug in this repo)
* ADE_T / FDE_T / MR_T metrics (both datasets)  — ``metrics/*.py`` (torchmetrics
  ``Metric`` stubbed to a state bag; update/compute run verbatim)
* SDEDecoder (full rollout forward)             — ``dec_hivt_nusargo_sde.py:14-105``
  (the ``sdeint`` injected is one fixed-grid Euler step per segment —
  the shipped grid's dt — with the diffusion head zeroed on both sides)
* LocalEncoderSDESepPara2 (the paper's full encoder forward: twins,
  per-step subgraphs, parallel AA mega-batch, backwards ODE-RNN + GRU,
  eos gather, AL)                               — ``enc_hivt_nusargo_sde_sep2.py:66-202``
* forward_ood (zeros-init, no-twin 10-run ensemble, mean → AL, std
  score)                                        — ``enc_hivt_nusargo_sde_sep2.py:204-318``
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
        """Mini message-passing engine: executes the reference's PyG-style
        ``message``/``update`` methods over explicit edge lists (aggr='add',
        node_dim=0, flow source_to_target — the only configuration the
        reference uses)."""

        def __init__(self, *a, **kw):
            super().__init__()

        def propagate(self, edge_index, size=None, **kwargs):
            import inspect

            src, dst = edge_index[0], edge_index[1]
            x = kwargs.get("x")
            if size is not None and size[1] is not None:
                size_i = size[1]
            elif isinstance(x, tuple):
                size_i = x[1].shape[0]
            else:
                size_i = x.shape[0]

            def resolve(name):
                if name == "edge_index":
                    return edge_index
                if name == "index":
                    return dst
                if name == "ptr":
                    return None
                if name == "size_i":
                    return size_i
                if name.endswith("_i"):
                    base = kwargs[name[:-2]]
                    return (base[1] if isinstance(base, tuple) else base)[dst]
                if name.endswith("_j"):
                    base = kwargs[name[:-2]]
                    return (base[0] if isinstance(base, tuple) else base)[src]
                return kwargs[name]

            msg_names = list(inspect.signature(self.message).parameters)
            out = self.message(**{n: resolve(n) for n in msg_names})
            agg = torch.zeros((size_i,) + tuple(out.shape[1:]), dtype=out.dtype)
            agg.index_add_(0, dst, out)
            upd_names = list(inspect.signature(self.update).parameters)
            return self.update(agg, *[resolve(n) for n in upd_names[1:]])

    class _Data:
        """PyG ``Data`` stand-in: an attribute bag (the reference builds
        per-timestep snapshot Data objects in the SDE encoder)."""

        def __init__(self, **kw):
            self.__dict__.update(kw)

    class _Batch:
        """PyG ``Batch.from_data_list``: concatenate node features and
        offset edge indices by cumulative node counts."""

        @staticmethod
        def from_data_list(datas):
            offset = 0
            xs, eis, eas = [], [], []
            for d in datas:
                xs.append(d.x)
                eis.append(d.edge_index + offset)
                eas.append(d.edge_attr)
                offset += d.num_nodes
            return _Data(
                x=torch.cat(xs),
                edge_index=torch.cat(eis, dim=1),
                edge_attr=torch.cat(eas),
            )

    tg = _mod("torch_geometric")
    tg.data = _mod("torch_geometric.data", Data=_Data, Batch=_Batch)
    tg.nn = _mod("torch_geometric.nn")
    tg.nn.conv = _mod("torch_geometric.nn.conv", MessagePassing=_MessagePassing)
    tg.typing = _mod("torch_geometric.typing", Adj=object, OptTensor=object, Size=object)

    def scatter_softmax(src, index, ptr=None, num_nodes=None):
        """PyG ``softmax``: per-receiver softmax over incoming edges."""
        out = torch.zeros_like(src)
        n = int(num_nodes) if num_nodes is not None else int(index.max()) + 1
        for i in range(n):
            m = index == i
            if m.any():
                out[m] = torch.softmax(src[m], dim=0)
        return out

    def subgraph(subset, edge_index, **kw):
        keep = subset[edge_index[0]] & subset[edge_index[1]]
        return edge_index[:, keep], None

    tg.utils = _mod(
        "torch_geometric.utils", softmax=scatter_softmax, subgraph=subgraph
    )

    _mod("torchdiffeq", odeint=None)
    _mod("pytorch_lightning", LightningModule=torch.nn.Module)

    class _SDEIto(torch.nn.Module):
        # the real torchsde.SDEIto subclasses nn.Module — the stub must
        # too, or LSDEFunc's drift/diffusion nets become invisible to
        # ``parameters()`` (a training harness would silently not
        # optimize them; caught by the round-3 accuracy-parity run)
        def __init__(self, noise_type="diagonal"):
            super().__init__()
            self.noise_type = noise_type
            self.sde_type = "ito"

    def euler_sdeint(sde, y0, ts_grid, **kw):
        """Fixed-grid Euler–Maruyama over the given time grid (one step per
        segment — the shipped decoder grid has dt == segment length).  Used
        to EXECUTE the reference SDEDecoder.forward; tests zero the
        diffusion head, so the (omitted) noise term is exactly negligible."""
        ys = [y0]
        y = y0
        for i in range(len(ts_grid) - 1):
            t0 = ts_grid[i]
            dt = ts_grid[i + 1] - ts_grid[i]
            y = y + sde.f(t0, y) * dt
            ys.append(y)
        return torch.stack(ys)

    ts = _mod("torchsde", SDEIto=_SDEIto, sdeint=euler_sdeint, sdeint_adjoint=None)
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


def set_single_embed(seq, p):
    for i, idx in enumerate((0, 3, 6)):
        set_linear(seq[idx], p[f"Dense_{i}"])
        set_ln(seq[idx + 1], p[f"LayerNorm_{i}"])


def set_multi_embed(mod, p):
    for i in range(len(mod.module_list)):
        set_linear(mod.module_list[i][0], p[f"in{i}_dense0"])
        set_ln(mod.module_list[i][1], p[f"in{i}_ln0"])
        set_linear(mod.module_list[i][3], p[f"in{i}_dense1"])
    set_ln(mod.aggr_embed[0], p["aggr_ln0"])
    set_linear(mod.aggr_embed[2], p["aggr_dense"])
    set_ln(mod.aggr_embed[3], p["aggr_ln1"])


def set_mlp_block(seq, p):
    set_linear(seq[0], p["Dense_0"])
    set_linear(seq[3], p["Dense_1"])


# ---------------------------------------------------------------------------
# 6. AAEncoder — the reference's message/softmax/update code executed over
#    ragged per-step subgraphs (``enc_hivt_nusargo_grid.py:95-215``)
# ---------------------------------------------------------------------------
def test_aa_encoder_transplant(rng):
    from trajsde_tpu.models.local_encoder import AAEncoder

    grid_ref = _ref("models.encoders.enc_hivt_nusargo_grid")
    A, Th, D, H, radius = 5, 4, 16, 4, 30.0
    x = rng.normal(0, 2, (A, Th, 2)).astype(np.float32)
    pos = rng.uniform(-25, 25, (A, Th, 2)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    valid = rng.uniform(size=(A, Th)) < 0.8
    valid[0] = True
    bos = np.zeros((A, Th), bool)
    bos[:, 0] = valid[:, 0]
    c, s = np.cos(angles), np.sin(angles)
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2).astype(np.float32)

    # flax forward (dense-masked formulation)
    mask = np.zeros((1, Th, A, A), bool)
    edge_vec = np.zeros((1, Th, A, A, 2), np.float32)
    for t in range(Th):
        for i in range(A):
            for j in range(A):
                e = pos[j, t] - pos[i, t]
                mask[0, t, i, j] = (
                    i != j and valid[i, t] and valid[j, t] and e @ e < radius * radius
                )
                edge_vec[0, t, i, j] = e
    mine = AAEncoder(historical_steps=Th, embed_dim=D, num_heads=H)
    x_t = jnp.asarray(np.transpose(x, (1, 0, 2))[None])
    args = (
        x_t, x_t, jnp.asarray(R)[None], jnp.asarray(bos)[None],
        jnp.asarray(mask), jnp.asarray(edge_vec),
    )
    params = mine.init(jax.random.key(0), *args)["params"]
    got = np.asarray(mine.apply({"params": params}, *args))[0]  # [Th, A, D]

    # reference module, transplanted
    ref = grid_ref.AAEncoder(
        historical_steps=Th, node_dim=2, edge_dim=2, embed_dim=D, num_heads=H,
        dropout=0.1, parallel=False, input_diff=True,
    ).eval()
    with torch.no_grad():
        ref.bos_token.copy_(T(params["bos_token"]))
        set_single_embed(ref.center_embed.embed, params["center_embed"])
        set_multi_embed(ref.nbr_embed, params["nbr_embed"])
        for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
            set_linear(getattr(ref, n), params["attn"][n])
        set_ln(ref.norm1, params["norm1"])
        set_ln(ref.norm2, params["norm2"])
        set_mlp_block(ref.mlp, params["mlp"])

    rot_t = torch.from_numpy(R)
    for t in range(Th):
        srcs, dsts, attrs = [], [], []
        for i in range(A):
            for j in range(A):
                if mask[0, t, i, j]:
                    srcs.append(j)
                    dsts.append(i)
                    attrs.append(pos[j, t] - pos[i, t])
        edge_index = torch.tensor([srcs, dsts], dtype=torch.long)
        edge_attr = torch.from_numpy(
            np.asarray(attrs, np.float32).reshape(len(srcs), 2)
        )
        out_t = ref(
            torch.from_numpy(x[:, t]), t, edge_index, edge_attr,
            torch.from_numpy(bos[:, t]), rotate_mat=rot_t,
        )
        allclose(out_t, got[t], tol=5e-5)


# ---------------------------------------------------------------------------
# 7. ALEncoder — reference lane→actor cross attention executed
#    (``enc_hivt_nusargo_grid.py:294-398``)
# ---------------------------------------------------------------------------
def test_al_encoder_transplant(rng):
    from trajsde_tpu.models.local_encoder import ALEncoder

    grid_ref = _ref("models.encoders.enc_hivt_nusargo_grid")
    A, L, D, H = 4, 6, 16, 4
    x_actor = rng.normal(size=(1, A, D)).astype(np.float32)
    lane_feat = rng.normal(size=(1, L, 2)).astype(np.float32)
    al_vec = rng.normal(0, 10, size=(1, A, L, 2)).astype(np.float32)
    mask = rng.uniform(size=(1, A, L)) < 0.5
    mask[0, 1] = False
    angles = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    c, s = np.cos(angles), np.sin(angles)
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2).astype(np.float32)

    mine = ALEncoder(embed_dim=D, num_heads=H)
    args = (
        jnp.asarray(x_actor), jnp.asarray(lane_feat), jnp.asarray(al_vec),
        jnp.asarray(mask), jnp.asarray(R)[None],
    )
    params = mine.init(jax.random.key(0), *args)["params"]
    got = np.asarray(mine.apply({"params": params}, *args))[0]

    ref = grid_ref.ALEncoder(node_dim=2, edge_dim=2, embed_dim=D, num_heads=H).eval()
    with torch.no_grad():
        set_multi_embed(ref.lane_embed, params["lane_embed"])
        for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
            set_linear(getattr(ref, n), params["attn"][n])
        set_ln(ref.norm1, params["norm1"])
        set_ln(ref.norm2, params["norm2"])
        set_mlp_block(ref.mlp, params["mlp"])

    srcs, dsts, attrs = [], [], []
    for i in range(A):
        for j in range(L):
            if mask[0, i, j]:
                srcs.append(j)
                dsts.append(i)
                attrs.append(al_vec[0, i, j])
    out = ref(
        (torch.from_numpy(lane_feat[0]), torch.from_numpy(x_actor[0])),
        torch.tensor([srcs, dsts], dtype=torch.long),
        torch.from_numpy(np.asarray(attrs, np.float32).reshape(len(srcs), 2)),
        rotate_mat=torch.from_numpy(R),
    )
    allclose(out, got, tol=5e-5)


# ---------------------------------------------------------------------------
# 8. GlobalInteractor — reference aggregator executed end to end
#    (``agg_hivt.py:18-135``)
# ---------------------------------------------------------------------------
def test_global_interactor_transplant(rng):
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from test_reference_oracle import _tiny_scene

    agg_ref = _ref("models.aggregators.agg_hivt")
    A, Th, D, H, F = 4, 5, 16, 4, 3
    scene = _tiny_scene(rng, A=A, Th=Th)
    local = rng.normal(size=(1, A, D)).astype(np.float32)

    mine = GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3
    )
    params = mine.init(jax.random.key(0), scene, jnp.asarray(local))["params"]
    got = np.asarray(mine.apply({"params": params}, scene, jnp.asarray(local)))[0]

    ref = agg_ref.GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3,
        dropout=0.1, rotate=True, edge_dim=2,
    ).eval()
    with torch.no_grad():
        set_multi_embed(ref.rel_embed, params["rel_embed"])
        for li in range(3):
            lp = params[f"layer{li}"]
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
        set_ln(ref.norm, params["norm"])
        set_linear(ref.multihead_proj, params["multihead_proj"])

    angles = np.asarray(scene.rotate_angles)[0]
    c, s = np.cos(angles), np.sin(angles)
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2).astype(np.float32)
    ei = torch.tensor(
        [[j, i] for i in range(A) for j in range(A) if i != j], dtype=torch.long
    ).t()

    class _Data:
        edge_index = ei

        def __getitem__(self, k):
            return {
                "padding_mask": torch.from_numpy(np.asarray(scene.padding_mask)[0]),
                "positions": torch.from_numpy(np.asarray(scene.positions)[0]),
                "rotate_mat": torch.from_numpy(R),
                "rotate_angles": torch.from_numpy(angles),
            }[k]

    out = ref(_Data(), torch.from_numpy(local[0]))
    allclose(out, got, tol=5e-5)


# ---------------------------------------------------------------------------
# 9. Losses — the reference's loss modules executed verbatim
#    (``losses/L2.py``, ``losses/diff_BCE.py``, ``losses/laplace_nll_loss.py``)
# ---------------------------------------------------------------------------
def test_losses_transplant(rng):
    from trajsde_tpu.losses import diff_bce_loss, l2_loss, laplace_nll_loss

    l2_ref = _ref("losses.L2")
    bce_ref = _ref("losses.diff_BCE")
    lap_ref = _ref("losses.laplace_nll_loss")

    F, N, T = 3, 6, 8
    loc = rng.normal(size=(F, N, T, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, size=(F, N, T, 2)).astype(np.float32)
    loc4 = np.concatenate([loc, scale], -1)
    y = rng.normal(size=(N, T, 2)).astype(np.float32)
    reg = rng.uniform(size=(N, T)) < 0.7
    reg[0] = True

    data = {"y": torch.from_numpy(y)}
    out_t = {"loc": torch.from_numpy(loc4), "reg_mask": torch.from_numpy(reg)}
    out_j = {
        "loc": jnp.asarray(loc4)[None],
        "reg_mask": jnp.asarray(reg)[None],
    }
    y_j = jnp.asarray(y)[None]

    np.testing.assert_allclose(
        float(l2_ref.L2()(data, out_t)), float(l2_loss(y_j, out_j)), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(lap_ref.LaplaceNLLLoss()(data, out_t)),
        float(laplace_nll_loss(y_j, out_j)),
        rtol=1e-5,
    )

    p_in = rng.uniform(0.05, 0.95, size=N).astype(np.float32)
    p_out = rng.uniform(0.05, 0.95, size=N).astype(np.float32)
    bce_out_t = {
        "diff_in": torch.from_numpy(p_in), "diff_out": torch.from_numpy(p_out),
        "label_in": torch.zeros(N), "label_out": torch.ones(N),
    }
    bce_out_j = {
        "diff_in": jnp.asarray(p_in), "diff_out": jnp.asarray(p_out),
        "label_in": jnp.zeros(N), "label_out": jnp.ones(N),
    }
    np.testing.assert_allclose(
        float(bce_ref.DiffBCE()(data, bce_out_t)),
        float(diff_bce_loss(y_j, bce_out_j)),
        rtol=1e-5,
    )


def test_l2_loss_ragged_megagraph_reduction(rng):
    """B>1 with RAGGED per-scene actor counts: the reference batches scenes
    into one PyG mega-graph and takes a single global masked mean over all
    valid (actor, step) cells (``losses/L2.py:22-26`` over the
    ``TemporalData.__inc__`` concatenation, ``models/utils/util.py:67-75``)
    — NOT a mean of per-scene means.  The padded dense [B, A_max] loss must
    reproduce that reduction exactly: padded actor slots carry
    ``reg_mask=False`` and the denominator counts valid cells globally."""
    from trajsde_tpu.losses import l2_loss

    l2_ref = _ref("losses.L2")

    F, T, A_max = 3, 8, 5
    counts = [2, 5, 3]  # ragged valid-actor counts; scene 1 fills A_max
    B = len(counts)

    # dense padded JAX batch + the reference's concatenated mega-graph view
    loc = np.zeros((B, F, A_max, T, 4), np.float32)
    y = np.zeros((B, A_max, T, 2), np.float32)
    reg = np.zeros((B, A_max, T), bool)
    cat_loc, cat_y, cat_reg = [], [], []
    for b, n in enumerate(counts):
        lb = rng.normal(size=(F, n, T, 4)).astype(np.float32)
        yb = rng.normal(size=(n, T, 2)).astype(np.float32)
        rb = rng.uniform(size=(n, T)) < 0.7
        rb[0] = True  # every scene keeps at least one fully valid actor
        loc[b, :, :n], y[b, :n], reg[b, :n] = lb, yb, rb
        # padded slots: fill loc with garbage to prove the mask gates it
        loc[b, :, n:] = 1e6
        cat_loc.append(lb)
        cat_y.append(yb)
        cat_reg.append(rb)

    data = {"y": torch.from_numpy(np.concatenate(cat_y, axis=0))}
    out_t = {
        "loc": torch.from_numpy(np.concatenate(cat_loc, axis=1)),
        "reg_mask": torch.from_numpy(np.concatenate(cat_reg, axis=0)),
    }
    ref_val = float(l2_ref.L2()(data, out_t))

    out_j = {"loc": jnp.asarray(loc), "reg_mask": jnp.asarray(reg)}
    mine = float(l2_loss(jnp.asarray(y), out_j))
    np.testing.assert_allclose(mine, ref_val, rtol=1e-6)

    # a mean-of-per-scene-means WOULD differ on this ragged batch (guards
    # against silently changing the reduction): verify the distinction is
    # actually exercised by these inputs
    per_scene = []
    for b, n in enumerate(counts):
        o = {"loc": jnp.asarray(loc[b:b + 1]), "reg_mask": jnp.asarray(reg[b:b + 1])}
        per_scene.append(float(l2_loss(jnp.asarray(y[b:b + 1]), o)))
    assert abs(np.mean(per_scene) - ref_val) > 1e-3


# ---------------------------------------------------------------------------
# 10. Metrics — the reference's torchmetrics classes executed verbatim (the
#     per-source best-mode / end-index rules, ``metrics/{ade,fde,mr}_t.py``).
#     The batch is SORTED by source, where the reference's
#     ``repeat_interleave`` rule and this repo's per-row rule coincide
#     (PARITY.md "Known deviations").
# ---------------------------------------------------------------------------
def test_metrics_transplant(rng):
    from trajsde_tpu.train.metrics import make_metrics

    if "torchmetrics" not in sys.modules:
        class _Metric(torch.nn.Module):
            def __init__(self, **kw):
                super().__init__()

            def add_state(self, name, default, dist_reduce_fx=None):
                setattr(self, name, default)

        _mod("torchmetrics", Metric=_Metric)

    ade_ref = _ref("metrics.ade_t")
    fde_ref = _ref("metrics.fde_t")
    mr_ref = _ref("metrics.mr_t")

    K, NA, TS = 4, 6, 60
    end_idcs = [59, 29]
    pred = rng.normal(0, 3, size=(NA, K, TS, 2)).astype(np.float32)
    target = rng.normal(0, 3, size=(NA, TS, 2)).astype(np.float32)
    reg = rng.uniform(size=(NA, TS)) < 0.8
    reg[:, end_idcs[0]] = True
    reg[:, end_idcs[1]] = True
    source = np.array([0, 0, 0, 1, 1, 1], np.int32)  # sorted by source

    pred_t = torch.from_numpy(np.transpose(pred, (1, 0, 2, 3)))  # [K, NA, TS, 2]
    targ_t = torch.from_numpy(target)
    reg_t = torch.from_numpy(reg)
    src_t = torch.from_numpy(source)

    for dataset in ("nuScenes", "Argoverse"):
        mine = make_metrics(
            ["ADE_T", "FDE_T", "MR_T"],
            [{"dataset": dataset, "end_idcs": end_idcs}] * 3,
        )
        contribs = {
            m.name: m.update_fn(
                jnp.asarray(pred), jnp.asarray(target), jnp.asarray(reg),
                jnp.asarray(source),
            )
            for m in mine
        }
        refs = {
            "ADE_T": ade_ref.ADE_T(dataset=dataset, end_idcs=end_idcs),
            "FDE_T": fde_ref.FDE_T(dataset=dataset, end_idcs=end_idcs),
            "MR_T": mr_ref.MR_T(dataset=dataset, end_idcs=end_idcs),
        }
        for name, ref in refs.items():
            ref.update(pred_t, targ_t, reg_t, src_t)
            np.testing.assert_allclose(
                float(contribs[name][0]), float(ref.sum), rtol=1e-5,
                err_msg=f"{name}/{dataset} sum",
            )
            assert int(contribs[name][1]) == int(ref.count), f"{name}/{dataset} count"


# ---------------------------------------------------------------------------
# 11. SDEDecoder — the reference's rollout decoder executed verbatim
#     (``dec_hivt_nusargo_sde.py:14-105``; the injected ``sdeint`` stub is
#     one fixed-grid Euler step per segment, identical to the shipped
#     grid's dt == segment length; the diffusion head is zeroed on both
#     sides so the comparison is deterministic)
# ---------------------------------------------------------------------------
def test_sde_decoder_transplant(rng):
    from trajsde_tpu.models.decoders import SDEDecoder
    from test_reference_oracle import _tiny_scene

    dec_ref_mod = _ref("models.decoders.dec_hivt_nusargo_sde")
    A, D, F, Tf = 3, 16, 2, 8
    scene = _tiny_scene(rng, A=A, Th=5, Tf=Tf)
    local = rng.normal(size=(1, A, D)).astype(np.float32)
    glob = rng.normal(size=(1, F, A, D)).astype(np.float32)

    mine = SDEDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        max_fut_t=2.0,
    )
    variables = mine.init(
        {"params": jax.random.key(0), "sde": jax.random.key(1)},
        scene, jnp.asarray(local), jnp.asarray(glob),
    )
    params = jax.device_get(variables["params"])
    head = params["sde_rollout"]["g_func"]["dense_out"]
    head["kernel"] = jnp.zeros_like(head["kernel"])
    head["bias"] = jnp.full_like(head["bias"], -40.0)  # sigmoid → ~0 diffusion
    out = mine.apply(
        {"params": params}, scene, jnp.asarray(local), jnp.asarray(glob),
        rngs={"sde": jax.random.key(2)},
    )

    ref = dec_ref_mod.SDEDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        max_fut_t=2.0, uncertain=True, min_scale=1e-3, min_stepsize=0.25,
        method="euler", rtol=1e-3, atol=1e-3, ode_func_layers=3,
    ).eval()
    with torch.no_grad():
        set_linear(ref.aggr_embed[0], params["aggr_dense"])
        set_ln(ref.aggr_embed[1], params["aggr_ln"])
        fp = params["sde_rollout"]["f_func"]
        for i, idx in enumerate((0, 2, 4)):
            set_linear(ref.lsde_func.f_func.net[idx], fp[f"dense{i}"])
        gp = params["sde_rollout"]["g_func"]
        g_net = ref.lsde_func.g_func.net
        set_linear(g_net[0], gp["dense0"])
        set_linear(g_net[2], gp["dense1"])
        set_linear(g_net[4], gp["dense_out"])  # zeroed head transplanted too
        set_linear(ref.decoder[0], params["loc_layers_0"])
        set_ln(ref.decoder[1], params["loc_layers_1"])
        set_linear(ref.decoder[3], params["loc_layers_2"])
        set_linear(ref.scale[0], params["scale_layers_0"])
        set_ln(ref.scale[1], params["scale_layers_1"])
        set_linear(ref.scale[3], params["scale_layers_2"])
        set_linear(ref.pi[0], params["pi_layers_0"])
        set_ln(ref.pi[1], params["pi_layers_1"])
        set_linear(ref.pi[3], params["pi_layers_2"])

    data = {"padding_mask": torch.from_numpy(np.asarray(scene.padding_mask)[0])}
    ref_out = ref(
        data,
        torch.from_numpy(local[0]),
        torch.from_numpy(np.broadcast_to(glob[0], (F, A, D)).copy()),
    )
    allclose(ref_out["loc"], out["loc"][0], tol=1e-4)
    allclose(ref_out["pi"], out["pi"][0], tol=5e-5)
    np.testing.assert_array_equal(
        ref_out["reg_mask"].numpy(), np.asarray(out["reg_mask"])[0]
    )


# ---------------------------------------------------------------------------
# 12. LocalEncoderSDESepPara2 — the paper's contribution executed verbatim
#     (``enc_hivt_nusargo_sde_sep2.py:66-202``): twin construction, per-step
#     subgraphs + DistanceDropEdge, parallel AA over the PyG mega-batch,
#     backwards ODE-RNN with GRU fusion, eos gather, AL attention.  The
#     injected ``sdeint_dual`` is one Euler step per segment (= the shipped
#     fixed grid); diffusion heads are zeroed on BOTH sides, and the
#     perturbed twin is receive-only, so the real-actor outputs are
#     deterministic and noise-independent.
# ---------------------------------------------------------------------------
def test_sde_encoder_transplant(rng):
    from trajsde_tpu.models import graph
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep
    from test_reference_oracle import _tiny_scene

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")

    def euler_dual(sde, y0, ts2, nus_mask, dt=None, **kw):
        t0 = ts2[0]
        span = ts2[1] - ts2[0]
        f = sde.f(t0, y0)
        g = sde.g(t0, y0, nus_mask)   # ≈0 (zeroed head) ⇒ noise term vanishes
        y1 = y0 + f * span
        return torch.stack([y0, y1]), g

    enc_mod.sdeint_dual = euler_dual

    A, Th, D, H, radius = 3, 5, 16, 4, 60.0
    scene = _tiny_scene(rng, A=A, Th=Th)
    mine = LocalEncoderSDESep(
        historical_steps=Th, embed_dim=D, num_heads=H, ref_time=Th - 1,
        max_past_t=0.4, minimum_step=0.1, local_radius=radius,
    )
    variables = mine.init(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    params = jax.device_get(variables["params"])
    for g_name in ("g_nus", "g_argo"):
        head = params["sde_rnn"][g_name]["dense_out"]
        head["kernel"] = jnp.zeros_like(head["kernel"])
        head["bias"] = jnp.full_like(head["bias"], -40.0)
    out_j, diff_in_j, diff_out_j, _, _ = mine.apply(
        {"params": params}, scene, rngs={"sde": jax.random.key(2)}
    )

    ref = enc_mod.LocalEncoderSDESepPara2(
        historical_steps=Th, embed_dim=D, num_heads=H, dropout=0.1,
        local_radius=radius, node_dim=2, edge_dim=2, parallel=True,
        ref_time=Th - 1, max_past_t=0.4, minimum_step=0.1,
        run_backwards=True, sde_layers=2, method="euler",
        rtol=1e-3, atol=1e-3, input_diff=True,
    ).eval()
    with torch.no_grad():
        aa = params["aa_encoder"]
        ref.aa_encoder.bos_token.copy_(T(aa["bos_token"]))
        set_single_embed(ref.aa_encoder.center_embed.embed, aa["center_embed"])
        set_multi_embed(ref.aa_encoder.nbr_embed, aa["nbr_embed"])
        for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
            set_linear(getattr(ref.aa_encoder, n), aa["attn"][n])
        set_ln(ref.aa_encoder.norm1, aa["norm1"])
        set_ln(ref.aa_encoder.norm2, aa["norm2"])
        set_mlp_block(ref.aa_encoder.mlp, aa["mlp"])

        gru = params["sde_rnn"]["gru"]
        for gate, seq in (
            ("update_gate", ref.gru_unit.update_gate),
            ("reset_gate", ref.gru_unit.reset_gate),
            ("new_state", ref.gru_unit.new_state_net),
        ):
            set_linear(seq[0], gru[f"{gate}_0"])
            set_linear(seq[2], gru[f"{gate}_1"])

        fp = params["sde_rnn"]["f_func"]
        for i, idx in enumerate((0, 2, 4)):
            set_linear(ref.lsde_func.f_func.net[idx], fp[f"dense{i}"])
        for gname, gmod in (("g_nus", ref.lsde_func.g_nus), ("g_argo", ref.lsde_func.g_argo)):
            gp = params["sde_rnn"][gname]
            set_linear(gmod.net[0], gp["dense0"])
            set_linear(gmod.net[2], gp["dense1"])
            set_linear(gmod.net[4], gp["dense_out"])

        al = params["al_encoder"]
        set_multi_embed(ref.al_encoder.lane_embed, al["lane_embed"])
        for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
            set_linear(getattr(ref.al_encoder, n), al["attn"][n])
        set_ln(ref.al_encoder.norm1, al["norm1"])
        set_ln(ref.al_encoder.norm2, al["norm2"])
        set_mlp_block(ref.al_encoder.mlp, al["mlp"])

        ref.hidden.copy_(T(params["hidden"]))

    # ---- build the reference's TemporalData-like input from the same scene
    class _TData:
        def __init__(self, d):
            self._d = d
            self.__dict__.update(d)

        def __getitem__(self, k):
            return self._d[k]

        def __setitem__(self, k, v):
            self._d[k] = v

    angles = np.asarray(scene.rotate_angles)[0]
    c, s = np.cos(angles), np.sin(angles)
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2).astype(np.float32)
    ei = torch.tensor(
        [[j, i] for i in range(A) for j in range(A) if i != j], dtype=torch.long
    ).t()
    al_mask, al_vec = jax.device_get(
        graph.al_edges(scene, Th - 1, radius)
    )
    al_src, al_dst, al_vecs = [], [], []
    L = al_mask.shape[2]
    for i in range(A):
        for j in range(L):
            if al_mask[0, i, j]:
                al_src.append(j)
                al_dst.append(i)
                al_vecs.append(al_vec[0, i, j])

    data = _TData({
        "x": torch.from_numpy(np.asarray(scene.x)[0]),
        "positions": torch.from_numpy(np.asarray(scene.positions)[0]),
        "padding_mask": torch.from_numpy(np.asarray(scene.padding_mask)[0]),
        "bos_mask": torch.from_numpy(np.asarray(scene.bos_mask)[0]),
        "rotate_mat": torch.from_numpy(R),
        "agent_index": torch.tensor([0], dtype=torch.long),
        "source": torch.tensor([0], dtype=torch.long),
        "batch": torch.zeros(A, dtype=torch.long),
        "edge_index": ei,
        "num_nodes": A,
        "lane_positions": torch.from_numpy(np.asarray(scene.lane_positions)[0]),
        "lane_paddings": torch.from_numpy(
            np.asarray(scene.lane_paddings)[0].astype(np.float32)
        ),
        "lane_actor_index": torch.tensor([al_src, al_dst], dtype=torch.long),
        "lane_actor_vectors": torch.from_numpy(
            np.asarray(al_vecs, np.float32).reshape(len(al_src), 2)
        ),
    })

    with torch.no_grad():
        out_t, d_in, d_out, _, _ = ref(data)

    assert float(d_in.abs().max()) < 1e-8 and float(d_out.abs().max()) < 1e-8
    assert float(np.abs(np.asarray(diff_in_j)).max()) < 1e-8
    allclose(out_t, out_j[0], tol=5e-4)


# ---------------------------------------------------------------------------
# 13. forward_ood — the reference's OOD ensemble driver executed verbatim
#     (``enc_hivt_nusargo_sde_sep2.py:204-318``): zeros-init hidden, no
#     twins, 10 re-runs, mean embedding → AL, per-actor std score.  With
#     the diffusion heads zeroed the runs are identical (std exactly 0),
#     making the mean path deterministic on both sides.
# ---------------------------------------------------------------------------
def test_sde_encoder_ood_transplant(rng):
    from trajsde_tpu.models import graph
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep
    from test_reference_oracle import _tiny_scene

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")

    def euler_dual(sde, y0, ts2, nus_mask, dt=None, **kw):
        t0 = ts2[0]
        span = ts2[1] - ts2[0]
        f = sde.f(t0, y0)
        g = sde.g(t0, y0, nus_mask)
        return torch.stack([y0, y0 + f * span]), g

    enc_mod.sdeint_dual = euler_dual

    A, Th, D, H, radius = 3, 5, 16, 4, 60.0
    scene = _tiny_scene(rng, A=A, Th=Th)
    mine = LocalEncoderSDESep(
        historical_steps=Th, embed_dim=D, num_heads=H, ref_time=Th - 1,
        max_past_t=0.4, minimum_step=0.1, local_radius=radius,
    )
    variables = mine.init(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    params = jax.device_get(variables["params"])
    for g_name in ("g_nus", "g_argo"):
        head = params["sde_rnn"][g_name]["dense_out"]
        head["kernel"] = jnp.zeros_like(head["kernel"])
        head["bias"] = jnp.full_like(head["bias"], -40.0)
    out_j, std_j = mine.apply(
        {"params": params}, scene, rngs={"sde": jax.random.key(2)},
        method="forward_ood",
    )
    assert float(np.asarray(std_j).max()) < 1e-6  # identical ensemble members

    ref = enc_mod.LocalEncoderSDESepPara2(
        historical_steps=Th, embed_dim=D, num_heads=H, dropout=0.1,
        local_radius=radius, node_dim=2, edge_dim=2, parallel=True,
        ref_time=Th - 1, max_past_t=0.4, minimum_step=0.1,
        run_backwards=True, sde_layers=2, method="euler",
        rtol=1e-3, atol=1e-3, input_diff=True,
    ).eval()
    with torch.no_grad():
        aa = params["aa_encoder"]
        ref.aa_encoder.bos_token.copy_(T(aa["bos_token"]))
        set_single_embed(ref.aa_encoder.center_embed.embed, aa["center_embed"])
        set_multi_embed(ref.aa_encoder.nbr_embed, aa["nbr_embed"])
        for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
            set_linear(getattr(ref.aa_encoder, n), aa["attn"][n])
        set_ln(ref.aa_encoder.norm1, aa["norm1"])
        set_ln(ref.aa_encoder.norm2, aa["norm2"])
        set_mlp_block(ref.aa_encoder.mlp, aa["mlp"])
        gru = params["sde_rnn"]["gru"]
        for gate, seq in (
            ("update_gate", ref.gru_unit.update_gate),
            ("reset_gate", ref.gru_unit.reset_gate),
            ("new_state", ref.gru_unit.new_state_net),
        ):
            set_linear(seq[0], gru[f"{gate}_0"])
            set_linear(seq[2], gru[f"{gate}_1"])
        fp = params["sde_rnn"]["f_func"]
        for i, idx in enumerate((0, 2, 4)):
            set_linear(ref.lsde_func.f_func.net[idx], fp[f"dense{i}"])
        for gname, gmod in (("g_nus", ref.lsde_func.g_nus), ("g_argo", ref.lsde_func.g_argo)):
            gp = params["sde_rnn"][gname]
            set_linear(gmod.net[0], gp["dense0"])
            set_linear(gmod.net[2], gp["dense1"])
            set_linear(gmod.net[4], gp["dense_out"])
        al = params["al_encoder"]
        set_multi_embed(ref.al_encoder.lane_embed, al["lane_embed"])
        for n in ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj"):
            set_linear(getattr(ref.al_encoder, n), al["attn"][n])
        set_ln(ref.al_encoder.norm1, al["norm1"])
        set_ln(ref.al_encoder.norm2, al["norm2"])
        set_mlp_block(ref.al_encoder.mlp, al["mlp"])
        ref.hidden.copy_(T(params["hidden"]))

    class _TData:
        def __init__(self, d):
            self._d = d
            self.__dict__.update(d)

        def __getitem__(self, k):
            return self._d[k]

        def __setitem__(self, k, v):
            self._d[k] = v

    angles = np.asarray(scene.rotate_angles)[0]
    c, s = np.cos(angles), np.sin(angles)
    R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2).astype(np.float32)
    ei = torch.tensor(
        [[j, i] for i in range(A) for j in range(A) if i != j], dtype=torch.long
    ).t()
    al_mask, al_vec = jax.device_get(graph.al_edges(scene, Th - 1, radius))
    al_src, al_dst, al_vecs = [], [], []
    for i in range(A):
        for j in range(al_mask.shape[2]):
            if al_mask[0, i, j]:
                al_src.append(j)
                al_dst.append(i)
                al_vecs.append(al_vec[0, i, j])

    data = _TData({
        "x": torch.from_numpy(np.asarray(scene.x)[0].copy()),
        "positions": torch.from_numpy(np.asarray(scene.positions)[0].copy()),
        "padding_mask": torch.from_numpy(np.asarray(scene.padding_mask)[0].copy()),
        "bos_mask": torch.from_numpy(np.asarray(scene.bos_mask)[0].copy()),
        "rotate_mat": torch.from_numpy(R),
        "agent_index": torch.tensor([0], dtype=torch.long),
        "source": torch.tensor([0], dtype=torch.long),
        "batch": torch.zeros(A, dtype=torch.long),
        "edge_index": ei,
        "num_nodes": A,
        "lane_positions": torch.from_numpy(np.asarray(scene.lane_positions)[0].copy()),
        "lane_paddings": torch.from_numpy(
            np.asarray(scene.lane_paddings)[0].astype(np.float32)
        ),
        "lane_actor_index": torch.tensor([al_src, al_dst], dtype=torch.long),
        "lane_actor_vectors": torch.from_numpy(
            np.asarray(al_vecs, np.float32).reshape(len(al_src), 2)
        ),
    })

    with torch.no_grad():
        result = ref.forward_ood(data)
    out_t = result[0] if isinstance(result, tuple) else result
    allclose(out_t, out_j[0], tol=5e-4)
