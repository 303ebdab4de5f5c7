"""GRADIENT parity vs the reference's own torch autograd (round-3 item #1).

Extends the weight-transplant tier from forward-only to the training axis:
with transplanted weights and MATCHED noise — the Brownian unit normals and
the twin-perturbation draw are generated once and injected on BOTH sides —
the flagship SDE path

    LocalEncoderSDESepPara2 → GlobalInteractor → SDEDecoder → L2 + DiffBCE

runs forward AND ``loss.backward()`` on torch CPU through the reference's
own modules, and every parameter gradient is compared against ``jax.grad``
of this repo's loss.  This exercises the actual training math the forward
tier cannot: backprop through the unrolled Euler graph
(``models/model_base_mix_sde.py:104-113``, ``adjoint: false``), the
non-differentiable WTA argmin best-mode selection (``losses/L2.py:17-19``),
the masked GRU carry (``ode_utils.py:136-150``), the eos gather
(``enc_hivt_nusargo_sde_sep2.py:184-196``), and the diffusion-tap BCE
(``losses/diff_BCE.py``) — including the ∂(g·ΔW)/∂g noise-term gradients,
since the injected noise is nonzero and identical on both sides.

A second test covers the baseline path (LocalEncoder with the causal
temporal transformer → GlobalInteractor → MLPDecoder → L2), which is
fully deterministic.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
from test_reference_oracle import _tiny_scene  # noqa: E402
from test_reference_transplant import (  # noqa: E402
    REF,
    T,
    _ref,
    set_linear,
    set_ln,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not available"
)

ATTN_NAMES = ("lin_q", "lin_k", "lin_v", "lin_ih", "lin_hh", "lin_self", "out_proj")


class Binder:
    """Transplants flax params into torch modules AND records the
    (torch parameter ↔ flax grad-tree path) pairs so that, after
    ``loss.backward()`` on the torch side and ``jax.grad`` on the flax
    side, every gradient can be compared through the same mapping."""

    def __init__(self):
        self.pairs = []  # (path tuple, torch param, transpose kernel?)

    # -- leaf binders ---------------------------------------------------
    def linear(self, mod, p, path):
        set_linear(mod, p)
        self.pairs.append((path + ("kernel",), mod.weight, True))
        self.pairs.append((path + ("bias",), mod.bias, False))

    def ln(self, mod, p, path):
        set_ln(mod, p)
        self.pairs.append((path + ("scale",), mod.weight, False))
        self.pairs.append((path + ("bias",), mod.bias, False))

    def raw(self, t_param, p_leaf, path):
        with torch.no_grad():
            t_param.copy_(T(p_leaf).reshape(t_param.shape))
        self.pairs.append((path, t_param, False))

    # -- composite binders (mirror test_reference_transplant's set_*) ---
    def single_embed(self, seq, p, path):
        for i, idx in enumerate((0, 3, 6)):
            self.linear(seq[idx], p[f"Dense_{i}"], path + (f"Dense_{i}",))
            self.ln(seq[idx + 1], p[f"LayerNorm_{i}"], path + (f"LayerNorm_{i}",))

    def multi_embed(self, mod, p, path):
        for i in range(len(mod.module_list)):
            self.linear(mod.module_list[i][0], p[f"in{i}_dense0"], path + (f"in{i}_dense0",))
            self.ln(mod.module_list[i][1], p[f"in{i}_ln0"], path + (f"in{i}_ln0",))
            self.linear(mod.module_list[i][3], p[f"in{i}_dense1"], path + (f"in{i}_dense1",))
        self.ln(mod.aggr_embed[0], p["aggr_ln0"], path + ("aggr_ln0",))
        self.linear(mod.aggr_embed[2], p["aggr_dense"], path + ("aggr_dense",))
        self.ln(mod.aggr_embed[3], p["aggr_ln1"], path + ("aggr_ln1",))

    def mlp_block(self, seq, p, path):
        self.linear(seq[0], p["Dense_0"], path + ("Dense_0",))
        self.linear(seq[3], p["Dense_1"], path + ("Dense_1",))

    def attn(self, mod, p, path, names=ATTN_NAMES):
        for n in names:
            self.linear(getattr(mod, n), p[n], path + (n,))

    def ffunc(self, net, p, path):
        """Reference FFunc.net: Linear at 0/2/4 ↔ dense0..dense2."""
        for i, idx in enumerate((0, 2, 4)):
            self.linear(net[idx], p[f"dense{i}"], path + (f"dense{i}",))

    def gfunc(self, net, p, path):
        """Reference GFunc.net: Linear at 0/2/4 ↔ dense0/dense1/dense_out."""
        self.linear(net[0], p["dense0"], path + ("dense0",))
        self.linear(net[2], p["dense1"], path + ("dense1",))
        self.linear(net[4], p["dense_out"], path + ("dense_out",))

    def gru(self, ref_gru, p, path):
        for gate, seq in (
            ("update_gate", ref_gru.update_gate),
            ("reset_gate", ref_gru.reset_gate),
            ("new_state", ref_gru.new_state_net),
        ):
            self.linear(seq[0], p[f"{gate}_0"], path + (f"{gate}_0",))
            self.linear(seq[2], p[f"{gate}_1"], path + (f"{gate}_1",))

    # -- comparison -----------------------------------------------------
    def check(self, grads, rtol=2e-3, atol=1e-6):
        failures = []
        for path, t_param, transpose in self.pairs:
            leaf = grads
            for k in path:
                leaf = leaf[k]
            jg = np.asarray(leaf, np.float64)
            if t_param.grad is None:
                tg = np.zeros_like(jg)
            else:
                tg = t_param.grad.detach().numpy().astype(np.float64)
                if transpose:
                    tg = tg.T
                tg = tg.reshape(jg.shape)
            scale = max(np.abs(jg).max(), np.abs(tg).max(), 1e-12)
            diff = np.abs(tg - jg).max()
            if diff > rtol * scale + atol:
                failures.append(("/".join(path), float(diff), float(scale)))
        assert not failures, (
            f"{len(failures)}/{len(self.pairs)} parameter gradients disagree "
            f"(maxdiff, leaf-scale): {failures[:10]}"
        )
        return len(self.pairs)


# ---------------------------------------------------------------------------
# shared scene → reference TemporalData builder (same construction as
# test_reference_transplant's encoder tests, plus rotate_angles for the
# aggregator and y for the losses)
# ---------------------------------------------------------------------------
class _TData:
    def __init__(self, d):
        self._d = d
        self.__dict__.update(d)

    def __getitem__(self, k):
        return self._d[k]

    def __setitem__(self, k, v):
        self._d[k] = v


def _torch_data(scene, radius):
    from trajsde_tpu.models import graph

    A = int(scene.x.shape[1])
    Th = int(scene.x.shape[2])
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
    return _TData({
        "x": torch.from_numpy(np.asarray(scene.x)[0].copy()),
        "positions": torch.from_numpy(np.asarray(scene.positions)[0].copy()),
        "padding_mask": torch.from_numpy(np.asarray(scene.padding_mask)[0].copy()),
        "bos_mask": torch.from_numpy(np.asarray(scene.bos_mask)[0].copy()),
        "rotate_mat": torch.from_numpy(R),
        "rotate_angles": torch.from_numpy(angles),
        "agent_index": torch.tensor([0], dtype=torch.long),
        # the scene's actual source: the encoder routes actors between
        # g_nus/g_argo by ``data.source`` (enc_hivt_nusargo_sde_sep2.py:73-74)
        # — a hardcoded 0 here silently nus-routed every Argoverse scene in
        # the tier-4 training campaigns (the grad-parity tests all use
        # source-0 scenes, so they were unaffected)
        "source": torch.tensor([int(np.asarray(scene.source)[0])], dtype=torch.long),
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


def _bind_sde_encoder(ref, params, b):
    aa = params["aa_encoder"]
    b.raw(ref.aa_encoder.bos_token, aa["bos_token"], ("enc", "aa_encoder", "bos_token"))
    b.single_embed(ref.aa_encoder.center_embed.embed, aa["center_embed"],
                   ("enc", "aa_encoder", "center_embed"))
    b.multi_embed(ref.aa_encoder.nbr_embed, aa["nbr_embed"],
                  ("enc", "aa_encoder", "nbr_embed"))
    b.attn(ref.aa_encoder, aa["attn"], ("enc", "aa_encoder", "attn"))
    b.ln(ref.aa_encoder.norm1, aa["norm1"], ("enc", "aa_encoder", "norm1"))
    b.ln(ref.aa_encoder.norm2, aa["norm2"], ("enc", "aa_encoder", "norm2"))
    b.mlp_block(ref.aa_encoder.mlp, aa["mlp"], ("enc", "aa_encoder", "mlp"))

    rnn = params["sde_rnn"]
    b.gru(ref.gru_unit, rnn["gru"], ("enc", "sde_rnn", "gru"))
    b.ffunc(ref.lsde_func.f_func.net, rnn["f_func"], ("enc", "sde_rnn", "f_func"))
    b.gfunc(ref.lsde_func.g_nus.net, rnn["g_nus"], ("enc", "sde_rnn", "g_nus"))
    b.gfunc(ref.lsde_func.g_argo.net, rnn["g_argo"], ("enc", "sde_rnn", "g_argo"))

    al = params["al_encoder"]
    b.multi_embed(ref.al_encoder.lane_embed, al["lane_embed"],
                  ("enc", "al_encoder", "lane_embed"))
    b.attn(ref.al_encoder, al["attn"], ("enc", "al_encoder", "attn"))
    b.ln(ref.al_encoder.norm1, al["norm1"], ("enc", "al_encoder", "norm1"))
    b.ln(ref.al_encoder.norm2, al["norm2"], ("enc", "al_encoder", "norm2"))
    b.mlp_block(ref.al_encoder.mlp, al["mlp"], ("enc", "al_encoder", "mlp"))
    b.raw(ref.hidden, params["hidden"], ("enc", "hidden"))


def _bind_aggregator(ref, params, b, num_layers=3):
    b.multi_embed(ref.rel_embed, params["rel_embed"], ("agg", "rel_embed"))
    for li in range(num_layers):
        lp = params[f"layer{li}"]
        layer = ref.global_interactor_layers[li]
        for flax_n, ref_n in (
            ("lin_q", "lin_q_node"), ("lin_k", "lin_k_node"),
            ("lin_v", "lin_v_node"), ("lin_k_edge", "lin_k_edge"),
            ("lin_v_edge", "lin_v_edge"), ("lin_ih", "lin_ih"),
            ("lin_hh", "lin_hh"), ("lin_self", "lin_self"),
            ("out_proj", "out_proj"),
        ):
            b.linear(getattr(layer, ref_n), lp["attn"][flax_n],
                     ("agg", f"layer{li}", "attn", flax_n))
        b.ln(layer.norm1, lp["norm1"], ("agg", f"layer{li}", "norm1"))
        b.ln(layer.norm2, lp["norm2"], ("agg", f"layer{li}", "norm2"))
        b.mlp_block(layer.mlp, lp["mlp"], ("agg", f"layer{li}", "mlp"))
    b.ln(ref.norm, params["norm"], ("agg", "norm"))
    b.linear(ref.multihead_proj, params["multihead_proj"], ("agg", "multihead_proj"))


def _bind_sde_decoder(ref, params, b):
    b.linear(ref.aggr_embed[0], params["aggr_dense"], ("dec", "aggr_dense"))
    b.ln(ref.aggr_embed[1], params["aggr_ln"], ("dec", "aggr_ln"))
    sr = params["sde_rollout"]
    b.ffunc(ref.lsde_func.f_func.net, sr["f_func"], ("dec", "sde_rollout", "f_func"))
    b.gfunc(ref.lsde_func.g_func.net, sr["g_func"], ("dec", "sde_rollout", "g_func"))
    b.linear(ref.decoder[0], params["loc_layers_0"], ("dec", "loc_layers_0"))
    b.ln(ref.decoder[1], params["loc_layers_1"], ("dec", "loc_layers_1"))
    b.linear(ref.decoder[3], params["loc_layers_2"], ("dec", "loc_layers_2"))
    b.linear(ref.scale[0], params["scale_layers_0"], ("dec", "scale_layers_0"))
    b.ln(ref.scale[1], params["scale_layers_1"], ("dec", "scale_layers_1"))
    b.linear(ref.scale[3], params["scale_layers_2"], ("dec", "scale_layers_2"))
    b.linear(ref.pi[0], params["pi_layers_0"], ("dec", "pi_layers_0"))
    b.ln(ref.pi[1], params["pi_layers_1"], ("dec", "pi_layers_1"))
    b.linear(ref.pi[3], params["pi_layers_2"], ("dec", "pi_layers_2"))


# ---------------------------------------------------------------------------
# 1. flagship: full SDE model, matched nonzero noise, L2 + DiffBCE
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "A,Th,Tf,D,H,F,dt_fut,grad_rtol",
    [
        pytest.param(3, 5, 8, 16, 4, 2, 0.25, 2e-3, id="tiny"),
        # the shipped architecture's own dimensions (embed_dim 64 / 8
        # heads / 21-segment encoder / 60-step rollout / K=10 modes,
        # ``configs/nusargo/hivt_nuSArgo_sdesepenc_sdedec.yml``) — proves
        # gradient parity is not a tiny-shape artifact
        pytest.param(
            6, 21, 60, 64, 8, 10, 0.1, 4e-3,
            marks=pytest.mark.slow, id="reference-dims",
        ),
    ],
)
def test_full_sde_model_grad_parity(
    rng, monkeypatch, A, Th, Tf, D, H, F, dt_fut, grad_rtol
):
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")
    agg_mod = _ref("models.aggregators.agg_hivt")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_sde")
    l2_mod = _ref("losses.L2")
    bce_mod = _ref("losses.diff_BCE")

    max_past_t = round(0.1 * (Th - 1), 6)   # 0.4 tiny / 2.0 reference
    max_fut_t = round(dt_fut * Tf, 6)       # 2.0 tiny / 6.0 reference
    radius = 60.0
    scene = _tiny_scene(rng, A=A, Th=Th, Tf=Tf)
    y_np = rng.normal(0, 2, size=(1, A, Tf, 2)).astype(np.float32)

    # shared noise draws
    twin_eps = rng.normal(size=(1, 1, Th, 2)).astype(np.float32)
    enc_eps = rng.normal(size=(Th, 1, A + 1, D)).astype(np.float32)
    dec_eps = rng.normal(size=(Tf, 1, F, A, D)).astype(np.float32)

    # ---- JAX side ----------------------------------------------------
    enc = LocalEncoderSDESep(
        historical_steps=Th, embed_dim=D, num_heads=H, ref_time=Th - 1,
        max_past_t=max_past_t, minimum_step=0.1, local_radius=radius,
    )
    agg = GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3
    )
    dec = SDEDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        max_fut_t=max_fut_t,
    )
    kw = dict(sde_noise=jnp.asarray(enc_eps), twin_noise=jnp.asarray(twin_eps))
    enc_p = enc.init({"params": jax.random.key(0)}, scene, **kw)["params"]
    local0 = enc.apply({"params": enc_p}, scene, **kw)[0]
    agg_p = agg.init(jax.random.key(1), scene, local0)["params"]
    glob0 = agg.apply({"params": agg_p}, scene, local0)
    dec_p = dec.init(
        {"params": jax.random.key(2)}, scene, local0, glob0,
        sde_noise=jnp.asarray(dec_eps),
    )["params"]
    params = {
        "enc": jax.device_get(enc_p),
        "agg": jax.device_get(agg_p),
        "dec": jax.device_get(dec_p),
    }
    y_j = jnp.asarray(y_np)

    def loss_fn(p):
        out, d_in, d_out, l_in, l_out = enc.apply({"params": p["enc"]}, scene, **kw)
        glob = agg.apply({"params": p["agg"]}, scene, out)
        o = dec.apply(
            {"params": p["dec"]}, scene, out, glob, sde_noise=jnp.asarray(dec_eps)
        )
        o = dict(o, diff_in=d_in, diff_out=d_out, label_in=l_in, label_out=l_out)
        return l2_loss(y_j, o) + diff_bce_loss(y_j, o)

    jloss, jgrads = jax.value_and_grad(loss_fn)(params)

    # ---- torch side: the reference's own modules ---------------------
    step = {"k": 0}

    def sdeint_dual(sde, y0, ts2, nus_mask, dt=None, **kwargs):
        t0 = ts2[0]
        span = ts2[1] - ts2[0]
        f = sde.f(t0, y0)
        g = sde.g(t0, y0, nus_mask)
        eps = torch.from_numpy(enc_eps[step["k"], 0])
        step["k"] += 1
        y1 = y0 + f * span + g * (span ** 0.5) * eps
        return torch.stack([y0, y1]), g

    def dec_sdeint(sde, y0, ts_grid, **kwargs):
        ys = [y0]
        y = y0
        for i in range(len(ts_grid) - 1):
            t0 = ts_grid[i]
            dtv = ts_grid[i + 1] - ts_grid[i]
            eps = torch.from_numpy(dec_eps[i, 0].reshape(F * A, D))
            y = y + sde.f(t0, y) * dtv + sde.g(t0, y) * (dtv ** 0.5) * eps
            ys.append(y)
        return torch.stack(ys)

    monkeypatch.setattr(enc_mod, "sdeint_dual", sdeint_dual)
    monkeypatch.setattr(dec_mod, "sdeint", dec_sdeint)

    # the twin construction is ``x_agent + 2*torch.randn_like(x_agent)``
    # (``enc_hivt_nusargo_sde_sep2.py:95``) — pin the draw
    real_randn_like = torch.randn_like

    def fake_randn_like(x, **kwargs):
        if tuple(x.shape) == (1, Th, 2):
            return torch.from_numpy(twin_eps[0])
        return real_randn_like(x, **kwargs)

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)

    b = Binder()
    ref_enc = enc_mod.LocalEncoderSDESepPara2(
        historical_steps=Th, embed_dim=D, num_heads=H, dropout=0.1,
        local_radius=radius, node_dim=2, edge_dim=2, parallel=True,
        ref_time=Th - 1, max_past_t=max_past_t, minimum_step=0.1,
        run_backwards=True, sde_layers=2, method="euler",
        rtol=1e-3, atol=1e-3, input_diff=True,
    ).eval()
    ref_agg = agg_mod.GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3,
        dropout=0.1, rotate=True, edge_dim=2,
    ).eval()
    ref_dec = dec_mod.SDEDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        max_fut_t=max_fut_t, uncertain=True, min_scale=1e-3, min_stepsize=dt_fut,
        method="euler", rtol=1e-3, atol=1e-3, ode_func_layers=3,
    ).eval()
    with torch.no_grad():
        _bind_sde_encoder(ref_enc, params["enc"], b)
        _bind_aggregator(ref_agg, params["agg"], b)
        _bind_sde_decoder(ref_dec, params["dec"], b)

    data = _torch_data(scene, radius)
    out_t, d_in, d_out, l_in, l_out = ref_enc(data)
    glob_t = ref_agg(data, out_t)
    dec_out = ref_dec(data, out_t, glob_t)
    dec_out["diff_in"], dec_out["diff_out"] = d_in, d_out
    dec_out["label_in"], dec_out["label_out"] = l_in, l_out
    tdata = {"y": torch.from_numpy(y_np[0])}
    tloss = l2_mod.L2()(tdata, dec_out) + bce_mod.DiffBCE()(tdata, dec_out)

    # forward agreement first (nonzero diffusion this time)
    np.testing.assert_allclose(float(tloss), float(jloss), rtol=2e-4)
    assert step["k"] == Th  # every encoder segment consumed its draw

    tloss.backward()
    n = b.check(jgrads, rtol=grad_rtol, atol=1e-6)
    assert n > 150  # the whole flagship stack is covered


# ---------------------------------------------------------------------------
# 2. baseline path: LocalEncoder → GlobalInteractor → MLPDecoder → L2
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "A,Th,Tf,D,H,F,L",
    [
        pytest.param(3, 5, 8, 16, 4, 2, 4, id="tiny"),
        # the shipped baseline config's own dimensions
        # (``configs/nusargo/hivt_nuSArgo_trmenc_mlpdec.yml``: embed 64,
        # 4 heads, 4 temporal layers, K=10 modes)
        pytest.param(
            6, 21, 60, 64, 4, 10, 4,
            marks=pytest.mark.slow, id="reference-dims",
        ),
    ],
)
def test_baseline_model_grad_parity(rng, A, Th, Tf, D, H, F, L):
    from trajsde_tpu.losses import l2_loss
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import MLPDecoder
    from trajsde_tpu.models.local_encoder import LocalEncoder

    grid_mod = _ref("models.encoders.enc_hivt_nusargo_grid")
    agg_mod = _ref("models.aggregators.agg_hivt")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_grid")
    l2_mod = _ref("losses.L2")

    radius = 60.0
    scene = _tiny_scene(rng, A=A, Th=Th, Tf=Tf)
    y_np = rng.normal(0, 2, size=(1, A, Tf, 2)).astype(np.float32)

    enc = LocalEncoder(
        historical_steps=Th, embed_dim=D, num_heads=H, num_temporal_layers=L,
        local_radius=radius,
    )
    agg = GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3
    )
    dec = MLPDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F
    )
    enc_p = enc.init(jax.random.key(0), scene)["params"]
    local0 = enc.apply({"params": enc_p}, scene)
    agg_p = agg.init(jax.random.key(1), scene, local0)["params"]
    glob0 = agg.apply({"params": agg_p}, scene, local0)
    dec_p = dec.init(jax.random.key(2), scene, local0, glob0)["params"]
    params = {
        "enc": jax.device_get(enc_p),
        "agg": jax.device_get(agg_p),
        "dec": jax.device_get(dec_p),
    }
    y_j = jnp.asarray(y_np)

    def loss_fn(p):
        out = enc.apply({"params": p["enc"]}, scene)
        glob = agg.apply({"params": p["agg"]}, scene, out)
        o = dec.apply({"params": p["dec"]}, scene, out, glob)
        return l2_loss(y_j, o)

    jloss, jgrads = jax.value_and_grad(loss_fn)(params)

    # ---- torch side --------------------------------------------------
    b = Binder()
    ref_enc = grid_mod.LocalEncoder(
        historical_steps=Th, node_dim=2, edge_dim=2, embed_dim=D, num_heads=H,
        dropout=0.1, num_temporal_layers=L, local_radius=radius, parallel=False,
        input_diff=True,
    ).eval()
    ref_agg = agg_mod.GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3,
        dropout=0.1, rotate=True, edge_dim=2,
    ).eval()
    ref_dec = dec_mod.MLPDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        uncertain=True, min_scale=1e-3,
    ).eval()

    ep = params["enc"]
    with torch.no_grad():
        aa = ep["aa_encoder"]
        b.raw(ref_enc.aa_encoder.bos_token, aa["bos_token"],
              ("enc", "aa_encoder", "bos_token"))
        b.single_embed(ref_enc.aa_encoder.center_embed.embed, aa["center_embed"],
                       ("enc", "aa_encoder", "center_embed"))
        b.multi_embed(ref_enc.aa_encoder.nbr_embed, aa["nbr_embed"],
                      ("enc", "aa_encoder", "nbr_embed"))
        b.attn(ref_enc.aa_encoder, aa["attn"], ("enc", "aa_encoder", "attn"))
        b.ln(ref_enc.aa_encoder.norm1, aa["norm1"], ("enc", "aa_encoder", "norm1"))
        b.ln(ref_enc.aa_encoder.norm2, aa["norm2"], ("enc", "aa_encoder", "norm2"))
        b.mlp_block(ref_enc.aa_encoder.mlp, aa["mlp"], ("enc", "aa_encoder", "mlp"))

        te = ep["temporal_encoder"]
        tref = ref_enc.temporal_encoder
        b.raw(tref.padding_token, te["padding_token"],
              ("enc", "temporal_encoder", "padding_token"))
        b.raw(tref.cls_token, te["cls_token"], ("enc", "temporal_encoder", "cls_token"))
        b.raw(tref.pos_embed, te["pos_embed"], ("enc", "temporal_encoder", "pos_embed"))
        for i in range(L):
            lp = te[f"layer{i}"]
            layer = tref.transformer_encoder.layers[i]
            with torch.no_grad():
                layer.self_attn.in_proj_weight.copy_(
                    T(lp["self_attn"]["in_proj"]["kernel"]).t()
                )
                layer.self_attn.in_proj_bias.copy_(T(lp["self_attn"]["in_proj"]["bias"]))
            b.pairs.append((
                ("enc", "temporal_encoder", f"layer{i}", "self_attn", "in_proj", "kernel"),
                layer.self_attn.in_proj_weight, True,
            ))
            b.pairs.append((
                ("enc", "temporal_encoder", f"layer{i}", "self_attn", "in_proj", "bias"),
                layer.self_attn.in_proj_bias, False,
            ))
            b.linear(layer.self_attn.out_proj, lp["self_attn"]["out_proj"],
                     ("enc", "temporal_encoder", f"layer{i}", "self_attn", "out_proj"))
            b.ln(layer.norm1, lp["norm1"], ("enc", "temporal_encoder", f"layer{i}", "norm1"))
            b.ln(layer.norm2, lp["norm2"], ("enc", "temporal_encoder", f"layer{i}", "norm2"))
            b.linear(layer.linear1, lp["mlp"]["Dense_0"],
                     ("enc", "temporal_encoder", f"layer{i}", "mlp", "Dense_0"))
            b.linear(layer.linear2, lp["mlp"]["Dense_1"],
                     ("enc", "temporal_encoder", f"layer{i}", "mlp", "Dense_1"))
        b.ln(tref.transformer_encoder.norm, te["norm"],
             ("enc", "temporal_encoder", "norm"))

        al = ep["al_encoder"]
        b.multi_embed(ref_enc.al_encoder.lane_embed, al["lane_embed"],
                      ("enc", "al_encoder", "lane_embed"))
        b.attn(ref_enc.al_encoder, al["attn"], ("enc", "al_encoder", "attn"))
        b.ln(ref_enc.al_encoder.norm1, al["norm1"], ("enc", "al_encoder", "norm1"))
        b.ln(ref_enc.al_encoder.norm2, al["norm2"], ("enc", "al_encoder", "norm2"))
        b.mlp_block(ref_enc.al_encoder.mlp, al["mlp"], ("enc", "al_encoder", "mlp"))

        _bind_aggregator(ref_agg, params["agg"], b)

        dp = params["dec"]
        b.linear(ref_dec.aggr_embed[0], dp["aggr_dense"], ("dec", "aggr_dense"))
        b.ln(ref_dec.aggr_embed[1], dp["aggr_ln"], ("dec", "aggr_ln"))
        for pre, seq, idxs in (
            ("loc", ref_dec.loc, (0, 3)),
            ("scale", ref_dec.scale, (0, 3)),
            ("pi", ref_dec.pi, (0, 3, 6)),
        ):
            for i, idx in enumerate(idxs):
                b.linear(seq[idx], dp[f"{pre}_dense{i}"], ("dec", f"{pre}_dense{i}"))
                if idx + 1 < len(seq) and isinstance(seq[idx + 1], torch.nn.LayerNorm):
                    b.ln(seq[idx + 1], dp[f"{pre}_ln{i}"], ("dec", f"{pre}_ln{i}"))

    # torch 2.x TransformerEncoder passes ``is_causal`` into layers the
    # reference (written for torch 1.12) doesn't accept — replay the 1.12
    # call convention (see test_reference_transplant's TemporalEncoder test)
    class _Shim(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, src, mask=None, **kwargs):
            h = src
            for layer in self.inner.layers:
                h = layer(h, src_mask=mask)
            return self.inner.norm(h)

    ref_enc.temporal_encoder.transformer_encoder = _Shim(
        ref_enc.temporal_encoder.transformer_encoder
    )

    data = _torch_data(scene, radius)
    out_t = ref_enc(data)
    glob_t = ref_agg(data, out_t)
    dec_out = ref_dec(data, out_t, glob_t)
    tloss = l2_mod.L2()({"y": torch.from_numpy(y_np[0])}, dec_out)

    np.testing.assert_allclose(float(tloss), float(jloss), rtol=2e-4)
    tloss.backward()
    n = b.check(jgrads, rtol=2e-3, atol=1e-6)
    assert n > 150
