"""Reference-parity oracle: numpy transcriptions of the reference math.

Each oracle below is a direct numpy transcription of the corresponding
PyTorch reference code (cited per test), evaluated with the weights
exported from the flax modules, on ragged edge lists built exactly the
way the reference builds them (``subgraph`` + ``DistanceDropEdge``).
Agreement to ~1e-4 (f32 chains) converts "we believe the semantics
match" into a test:

* AAEncoder message/softmax/update/ff  — ``enc_hivt_nusargo_grid.py:146-215``
* GRU_Unit                             — ``ode_utils.py:111-152``
* Euler–Maruyama step + dual-g routing — ``sdeint.py:477-485``,
                                         ``enc_hivt_nusargo_sde_sep2.py:470-482``
* eos gather + diffusion split         — ``enc_hivt_nusargo_sde_sep2.py:184-196``
* full SDE-encoder forward (g→0)       — ``enc_hivt_nusargo_sde_sep2.py:66-202``
* GlobalInteractor                     — ``agg_hivt.py:38-58,94-140``
* SDEDecoder (fuse → rollout → heads)  — ``dec_hivt_nusargo_sde.py:72-105``
* TemporalEncoder (causal cls transformer) — ``enc_hivt_nusargo_grid.py:218-291``
* ALEncoder (lane→actor cross attn)    — ``enc_hivt_nusargo_grid.py:294-398``
* MLPDecoder (one-shot heads)          — ``dec_hivt_nusargo_grid.py:10-64``
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.data.scene import SceneBatch
from trajsde_tpu.models.local_encoder import AAEncoder
from trajsde_tpu.models.sde import SDEGRUStep, encoder_time_grid
from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep, gather_eos_outputs

# ---------------------------------------------------------------------------
# numpy building blocks (torch layer semantics; weights = flax params, whose
# Dense kernel is [in, out] so y = x @ kernel + bias)
# ---------------------------------------------------------------------------
LN_EPS = 1e-5


def P(tree):
    return jax.tree.map(np.asarray, jax.device_get(tree))


def dense(x, p):
    return x @ p["kernel"] + p["bias"]


def ln(x, p):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + LN_EPS) * p["scale"] + p["bias"]


def relu(x):
    return np.maximum(x, 0.0)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def single_embed(x, p):
    """SingleInputEmbedding: 3×(Linear→LN→ReLU[first two]) + final LN
    (``models/utils/embedding.py:22-40``)."""
    for i in range(2):
        x = relu(ln(dense(x, p[f"Dense_{i}"]), p[f"LayerNorm_{i}"]))
    return ln(dense(x, p["Dense_2"]), p["LayerNorm_2"])


def multi_embed(inputs, p):
    """MultipleInputEmbedding: per-input MLPs summed, then aggregated
    (``embedding.py:43-70``)."""
    acc = 0.0
    for i, x in enumerate(inputs):
        h = relu(ln(dense(x, p[f"in{i}_dense0"]), p[f"in{i}_ln0"]))
        acc = acc + dense(h, p[f"in{i}_dense1"])
    out = relu(ln(acc, p["aggr_ln0"]))
    return ln(dense(out, p["aggr_dense"]), p["aggr_ln1"])


def edge_attention_update(center_normed_i, nbrs, p, num_heads):
    """Per-receiver attention message + gated update + out_proj
    (``enc_hivt_nusargo_grid.py:187-212``).  ``nbrs`` [E, D] are the
    receiver's incoming neighbor embeddings (E may be 0)."""
    D = center_normed_i.shape[-1]
    hd = D // num_heads
    if len(nbrs):
        q = dense(center_normed_i, p["lin_q"]).reshape(num_heads, hd)
        k = dense(nbrs, p["lin_k"]).reshape(-1, num_heads, hd)
        v = dense(nbrs, p["lin_v"]).reshape(-1, num_heads, hd)
        alpha = (q[None] * k).sum(-1) / hd ** 0.5          # [E, H]
        alpha = np.exp(alpha - alpha.max(0, keepdims=True))
        alpha = alpha / alpha.sum(0, keepdims=True)        # PyG scatter softmax
        agg = (alpha[..., None] * v).sum(0).reshape(D)
    else:
        agg = np.zeros(D, np.float32)                      # aggr='add' over ∅
    gate = sigmoid(dense(agg, p["lin_ih"]) + dense(center_normed_i, p["lin_hh"]))
    upd = agg + gate * (dense(center_normed_i, p["lin_self"]) - agg)
    return dense(upd, p["out_proj"])


def mlp_block(x, p):
    return dense(relu(dense(x, p["Dense_0"])), p["Dense_1"])


def rot_mat(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s], [s, c]], np.float32)


def aa_forward_numpy(params, x, pos, angles, bos, valid, radius, num_heads):
    """Reference AAEncoder forward over ragged per-step subgraphs.

    x [A, Th, 2]  pos [A, Th, 2]  angles [A]  bos [A, Th]  valid [A, Th].
    Returns [Th, A, D] (all rows, valid or not, like the reference)."""
    p = params
    A, Th = x.shape[:2]
    D = p["bos_token"].shape[-1]
    R = np.stack([rot_mat(a) for a in angles])            # [A, 2, 2]
    out = np.zeros((Th, A, D), np.float32)
    for t in range(Th):
        center = np.stack(
            [single_embed(x[i, t] @ R[i], p["center_embed"]) for i in range(A)]
        )
        center = np.where(bos[:, t, None], p["bos_token"][t][None], center)
        normed = ln(center, p["norm1"])
        msg = np.zeros_like(center)
        for i in range(A):
            nbrs = []
            if valid[i, t]:
                for j in range(A):
                    if j == i or not valid[j, t]:
                        continue
                    e = pos[j, t] - pos[i, t]
                    if e @ e < radius * radius:
                        nbrs.append(
                            multi_embed([x[j, t] @ R[i], e @ R[i]], p["nbr_embed"])
                        )
            msg[i] = edge_attention_update(
                normed[i], np.stack(nbrs) if nbrs else np.zeros((0, D)), p["attn"], num_heads
            )
        center = center + msg
        out[t] = center + mlp_block(ln(center, p["norm2"]), p["mlp"])
    return out


def gru_numpy(p, h_cur, x, mask):
    """GRU_Unit (``ode_utils.py:136-152``)."""
    cat = np.concatenate([h_cur, x], -1)
    upd = sigmoid(dense(np.tanh(dense(cat, p["update_gate_0"])), p["update_gate_1"]))
    rst = sigmoid(dense(np.tanh(dense(cat, p["reset_gate_0"])), p["reset_gate_1"]))
    new = dense(
        np.tanh(dense(np.concatenate([x, rst * h_cur], -1), p["new_state_0"])),
        p["new_state_1"],
    )
    h_next = (1 - upd) * new + upd * h_cur
    m = mask[..., None].astype(np.float32)
    return m * h_next + (1 - m) * h_cur


def ffunc_numpy(p, t, y, num_layers=2):
    """FFunc posterior drift (``enc_hivt_nusargo_sde_sep2.py:372-398``)."""
    feats = np.concatenate(
        [y, np.full(y.shape[:-1] + (1,), np.sin(t), np.float32),
         np.full(y.shape[:-1] + (1,), np.cos(t), np.float32)], -1)
    h = dense(feats, p["dense0"])
    for i in range(num_layers):
        h = dense(np.tanh(h), p[f"dense{i + 1}"])
    return h


def gfunc_numpy(p, t, y, num_layers=2):
    """GFunc diffusion magnitude (``:412-440``)."""
    feats = np.concatenate(
        [y, np.full(y.shape[:-1] + (1,), np.sin(t), np.float32),
         np.full(y.shape[:-1] + (1,), np.cos(t), np.float32)], -1)
    h = dense(feats, p["dense0"])
    for i in range(num_layers - 1):
        h = dense(np.tanh(h), p[f"dense{i + 1}"])
    return sigmoid(dense(np.tanh(h), p["dense_out"]))


# ---------------------------------------------------------------------------
# 1. AAEncoder oracle
# ---------------------------------------------------------------------------
def test_aa_encoder_oracle(rng):
    A, Th, D, H, radius = 5, 4, 16, 4, 30.0
    x = rng.normal(0, 2, (A, Th, 2)).astype(np.float32)
    pos = rng.uniform(-25, 25, (A, Th, 2)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    valid = rng.uniform(size=(A, Th)) < 0.8
    valid[0] = True
    bos = np.zeros((A, Th), bool)
    bos[:, 0] = valid[:, 0]

    enc = AAEncoder(historical_steps=Th, embed_dim=D, num_heads=H)
    R = np.stack([rot_mat(a) for a in angles])
    # dense-formulation inputs
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
    x_t = jnp.asarray(np.transpose(x, (1, 0, 2))[None])       # [1, Th, A, 2]
    variables = enc.init(
        jax.random.key(0), x_t, x_t, jnp.asarray(R)[None],
        jnp.asarray(bos)[None], jnp.asarray(mask), jnp.asarray(edge_vec),
    )
    got = np.asarray(
        enc.apply(variables, x_t, x_t, jnp.asarray(R)[None], jnp.asarray(bos)[None],
                  jnp.asarray(mask), jnp.asarray(edge_vec))
    )[0]                                                        # [Th, A, D]

    want = aa_forward_numpy(P(variables["params"]), x, pos, angles, bos, valid, radius, H)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# 2. GRU_Unit oracle
# ---------------------------------------------------------------------------
def test_gru_unit_oracle(rng):
    from trajsde_tpu.models.layers import GRUUnit

    N, D = 7, 16
    h = rng.normal(size=(N, D)).astype(np.float32)
    x = rng.normal(size=(N, D)).astype(np.float32)
    mask = rng.uniform(size=N) < 0.6
    gru = GRUUnit(latent_dim=D, n_units=D)
    variables = gru.init(jax.random.key(0), jnp.asarray(h), jnp.asarray(x), jnp.asarray(mask))
    got = np.asarray(gru.apply(variables, jnp.asarray(h), jnp.asarray(x), jnp.asarray(mask)))
    want = gru_numpy(P(variables["params"]), h, x, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# 3. Euler–Maruyama step + dual-domain diffusion routing oracle
# ---------------------------------------------------------------------------
def test_sde_step_oracle(rng):
    N, D = 256, 16
    t0, dt = np.float32(0.3), np.float32(0.1)
    h_a = rng.normal(0, 0.5, (N, D)).astype(np.float32)
    h_b = rng.normal(0, 0.5, (N, D)).astype(np.float32)
    nus = rng.uniform(size=N) < 0.5
    obs = np.zeros((N, D), np.float32)
    no_obs = np.zeros(N, bool)  # mask=False ⇒ GRU passes the raw Euler state

    step = SDEGRUStep(embed_dim=D, sde_layers=2)
    carry = (jnp.asarray(h_a), jnp.asarray(nus))
    xs = (jnp.asarray(obs), jnp.asarray(no_obs), jnp.asarray(t0), jnp.asarray(dt))
    variables = step.init({"params": jax.random.key(0), "sde": jax.random.key(1)}, carry, xs)
    p = P(variables["params"])

    def run(h):
        (h1, _), (y_out, g_out) = step.apply(
            variables, (jnp.asarray(h), jnp.asarray(nus)), xs,
            rngs={"sde": jax.random.key(7)},
        )
        return np.asarray(y_out), np.asarray(g_out)

    y_a, g_a = run(h_a)
    y_b, g_b = run(h_b)

    # diffusion = per-row routed GFunc (enc_hivt_nusargo_sde_sep2.py:470-482)
    g_want_a = np.where(
        nus[:, None], gfunc_numpy(p["g_nus"], t0, h_a), gfunc_numpy(p["g_argo"], t0, h_a)
    )[:, 0]
    np.testing.assert_allclose(g_a, g_want_a, rtol=1e-5, atol=1e-6)

    # Euler structure (sdeint.py:477-485): y1 = y0 + f·dt + g·√dt·ε with the
    # SAME ε across both runs (same rng key) ⇒ backing ε out of each run must
    # give identical standard-normal noise
    f_a = ffunc_numpy(p["f_func"], t0, h_a)
    f_b = ffunc_numpy(p["f_func"], t0, h_b)
    eps_a = (y_a - h_a - f_a * dt) / (g_a[:, None] * np.sqrt(dt))
    eps_b = (y_b - h_b - f_b * dt) / (g_b[:, None] * np.sqrt(dt))
    np.testing.assert_allclose(eps_a, eps_b, rtol=5e-3, atol=5e-4)
    assert abs(eps_a.mean()) < 0.05 and 0.95 < eps_a.std() < 1.05


# ---------------------------------------------------------------------------
# 4. eos gather + diffusion split oracle
# ---------------------------------------------------------------------------
def test_eos_gather_oracle(rng):
    B, A, Th, D, ref_time = 3, 4, 5, 8, 4
    ys = rng.normal(size=(Th, B, A + 1, D)).astype(np.float32)
    gs = rng.uniform(size=(Th, B, A + 1)).astype(np.float32)
    bos = np.zeros((B, A + 1, Th), bool)
    first = rng.integers(0, Th, size=(B, A + 1))
    for b in range(B):
        for a in range(A + 1):
            bos[b, a, first[b, a]] = True
    agent = rng.integers(0, A, size=B).astype(np.int32)

    out, diff_in, diff_out = jax.tree.map(
        np.asarray,
        gather_eos_outputs(
            jnp.asarray(ys), jnp.asarray(gs), jnp.asarray(bos), ref_time,
            jnp.asarray(agent), A,
        ),
    )

    # transcription of enc_hivt_nusargo_sde_sep2.py:184-196 (batched form):
    # latent_ys drops the twin; eos = ref_time − argmax(bos); the diffusion
    # taps take the agent row and its twin at the AGENT's eos iteration
    for b in range(B):
        eos = ref_time - np.argmax(bos[b].astype(np.int32), axis=-1)  # [A+1]
        for a in range(A):
            np.testing.assert_allclose(out[b, a], ys[eos[a], b, a])
        a_eos = eos[agent[b]]
        np.testing.assert_allclose(diff_in[b], gs[a_eos, b, agent[b]])
        np.testing.assert_allclose(diff_out[b], gs[a_eos, b, A])


# ---------------------------------------------------------------------------
# 5. full SDE-encoder forward oracle (diffusion forced ≈ 0)
# ---------------------------------------------------------------------------
def _tiny_scene(rng, A=3, Th=5, Tf=4, L=4, S=5):
    T = Th + Tf
    pos = rng.uniform(-20, 20, (1, A, T, 2)).astype(np.float32)
    x = rng.normal(0, 1, (1, A, Th, 2)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, (1, A)).astype(np.float32)
    padding = np.zeros((1, A, T), bool)
    padding[0, 2, :2] = True  # actor 2 appears at step 2
    bos = np.zeros((1, A, Th), bool)
    bos[0, :2, 0] = True
    bos[0, 2, 2] = True
    lane_pos = rng.uniform(-30, 30, (1, L, S, 2)).astype(np.float32)
    lane_pad = np.zeros((1, L, S), bool)
    lane_pad[0, 1, 3:] = True  # one short lane
    return SceneBatch(
        x=jnp.asarray(x),
        positions=jnp.asarray(pos),
        padding_mask=jnp.asarray(padding),
        bos_mask=jnp.asarray(bos),
        rotate_angles=jnp.asarray(angles),
        actor_valid=jnp.ones((1, A), bool),
        agent_index=jnp.zeros((1,), jnp.int32),
        av_index=jnp.zeros((1,), jnp.int32),
        source=jnp.zeros((1,), jnp.int32),
        lane_positions=jnp.asarray(lane_pos),
        lane_paddings=jnp.asarray(lane_pad),
        lane_valid=jnp.ones((1, L), bool),
    )


def test_sde_encoder_full_oracle(rng):
    """End-to-end forward parity: AA → backwards SDE-GRU → eos → AL.

    With the diffusion heads forced to ≈0 (sigmoid(−40)) the latent path is
    deterministic, and the perturbed twin is receive-only so the real-actor
    outputs are noise-independent — the whole reference forward
    (``enc_hivt_nusargo_sde_sep2.py:66-202``) becomes numpy-checkable."""
    A, Th, D, H, radius = 3, 5, 16, 4, 60.0
    scene = _tiny_scene(rng, A=A, Th=Th)
    enc = LocalEncoderSDESep(
        historical_steps=Th, embed_dim=D, num_heads=H, ref_time=Th - 1,
        max_past_t=0.4, minimum_step=0.1, local_radius=radius,
    )
    variables = enc.init({"params": jax.random.key(0), "sde": jax.random.key(1)}, scene)
    params = jax.device_get(variables["params"])
    for g_name in ("g_nus", "g_argo"):
        head = params["sde_rnn"][g_name]["dense_out"]
        head["kernel"] = jnp.zeros_like(head["kernel"])
        head["bias"] = jnp.full_like(head["bias"], -40.0)
    out, diff_in, diff_out, _, _ = enc.apply(
        {"params": params}, scene, rngs={"sde": jax.random.key(2)}
    )
    out = np.asarray(out)[0]
    assert float(np.asarray(diff_in).max()) < 1e-10
    assert float(np.asarray(diff_out).max()) < 1e-10

    p = P(params)
    x = np.asarray(scene.x)[0]
    pos = np.asarray(scene.positions)[0]
    angles = np.asarray(scene.rotate_angles)[0]
    bos = np.asarray(scene.bos_mask)[0]
    valid = ~np.asarray(scene.padding_mask)[0, :, :Th]

    # (1) AA attention for the real actors (the twin is never a key)
    aa = aa_forward_numpy(p["aa_encoder"], x, pos[:, :Th], angles, bos, valid, radius, H)

    # (2) backwards ODE-RNN over the latent SDE, g = 0
    t0s, dts = jax.tree.map(np.asarray, encoder_time_grid(Th, 0.4, 0.1))
    h = np.broadcast_to(p["hidden"], (A, D)).astype(np.float32).copy()
    latent = np.zeros((Th, A, D), np.float32)
    for k in range(Th):
        t = Th - 1 - k  # newest → oldest (run_backwards)
        f = ffunc_numpy(p["sde_rnn"]["f_func"], t0s[k], h)
        y_ode = h + f * dts[k]
        h = gru_numpy(p["sde_rnn"]["gru"], y_ode, aa[t], valid[:, t])
        latent[k] = h

    # (3) eos gather
    eos = (Th - 1) - np.argmax(bos.astype(np.int32), axis=-1)
    gathered = np.stack([latent[eos[a], a] for a in range(A)])

    # (4) AL cross attention (window + distance edge rules,
    #     Argoverse_abs.py:421-437 + DistanceDropEdge at runtime)
    lane_pos = np.asarray(scene.lane_positions)[0]
    lane_pad = np.asarray(scene.lane_paddings)[0]
    L = lane_pos.shape[0]
    lane_len = (~lane_pad).sum(-1)
    lane_end = np.stack([lane_pos[l, lane_len[l] - 1] for l in range(L)])
    lane_feat = lane_end - lane_pos[:, 0]
    R = np.stack([rot_mat(a) for a in angles])
    alp = p["al_encoder"]
    normed = ln(gathered, alp["norm1"])
    msg = np.zeros_like(gathered)
    for i in range(A):
        nbrs = []
        if valid[i, Th - 1]:
            for l in range(L):
                vec = lane_end[l] - pos[i, Th - 1]
                local = vec @ R[i]
                if (-20 < local[0] < 80 and -50 < local[1] < 50
                        and vec @ vec < radius * radius):
                    nbrs.append(
                        multi_embed([lane_feat[l] @ R[i], vec @ R[i]], alp["lane_embed"])
                    )
        msg[i] = edge_attention_update(
            normed[i], np.stack(nbrs) if nbrs else np.zeros((0, D)), alp["attn"], H
        )
    final = gathered + msg
    want = final + mlp_block(ln(final, alp["norm2"]), alp["mlp"])

    np.testing.assert_allclose(out, want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# 6. GlobalInteractor oracle (``agg_hivt.py:38-140``)
# ---------------------------------------------------------------------------
def global_layer_numpy(p, x, edges, rel, num_heads):
    """One GlobalInteractorLayer over a ragged edge list.

    ``edges`` — list of (i, j, rel_embed_row) with j→i flow; the reference
    projects the NORMED x for q, k AND the update gate (propagate is
    called with x = norm1(x), ``agg_hivt.py:99,131-134``)."""
    A, D = x.shape
    hd = D // num_heads
    normed = ln(x, p["norm1"])
    msg = np.zeros_like(x)
    for i in range(A):
        inc = [(j, r) for (ii, j, r) in edges if ii == i]
        if inc:
            q = dense(normed[i], p["attn"]["lin_q"]).reshape(num_heads, hd)
            ks, vs = [], []
            for j, r in inc:
                ks.append(dense(normed[j], p["attn"]["lin_k"])
                          + dense(r, p["attn"]["lin_k_edge"]))
                vs.append(dense(normed[j], p["attn"]["lin_v"])
                          + dense(r, p["attn"]["lin_v_edge"]))
            k = np.stack(ks).reshape(-1, num_heads, hd)
            v = np.stack(vs).reshape(-1, num_heads, hd)
            alpha = (q[None] * k).sum(-1) / hd ** 0.5
            alpha = np.exp(alpha - alpha.max(0, keepdims=True))
            alpha = alpha / alpha.sum(0, keepdims=True)
            agg = (alpha[..., None] * v).sum(0).reshape(D)
        else:
            agg = np.zeros(D, np.float32)
        gate = sigmoid(dense(agg, p["attn"]["lin_ih"])
                       + dense(normed[i], p["attn"]["lin_hh"]))
        upd = agg + gate * (dense(normed[i], p["attn"]["lin_self"]) - agg)
        msg[i] = dense(upd, p["attn"]["out_proj"])
    x = x + msg
    return x + mlp_block(ln(x, p["norm2"]), p["mlp"])


def test_global_interactor_oracle(rng):
    """Full aggregator: rel embedding (receiver-frame rel_pos + Δθ
    features), 3 edge-aware layers, final norm + multihead_proj → modes
    (``agg_hivt.py:38-58,94-140``)."""
    from trajsde_tpu.models.aggregator import GlobalInteractor

    A, Th, D, H, F = 4, 5, 16, 4, 3
    scene = _tiny_scene(rng, A=A, Th=Th)
    local = rng.normal(size=(1, A, D)).astype(np.float32)
    agg = GlobalInteractor(
        historical_steps=Th, embed_dim=D, num_modes=F, num_heads=H, num_layers=3
    )
    variables = agg.init(jax.random.key(0), scene, jnp.asarray(local))
    got = np.asarray(agg.apply(variables, scene, jnp.asarray(local)))[0]  # [F, A, D]

    p = P(variables["params"])
    pos = np.asarray(scene.positions)[0, :, Th - 1]
    angles = np.asarray(scene.rotate_angles)[0]
    valid = ~np.asarray(scene.padding_mask)[0, :, Th - 1]
    R = np.stack([rot_mat(a) for a in angles])

    # edges: subgraph of actors valid at the reference step, no radius
    edges = []
    for i in range(A):
        for j in range(A):
            if i != j and valid[i] and valid[j]:
                rel_pos = (pos[j] - pos[i]) @ R[i]
                dth = angles[j] - angles[i]
                r = multi_embed(
                    [rel_pos, np.array([np.cos(dth), np.sin(dth)], np.float32)],
                    p["rel_embed"],
                )
                edges.append((i, j, r))

    x = local[0].copy()
    for li in range(3):
        x = global_layer_numpy(p[f"layer{li}"], x, edges, None, H)
    x = ln(x, p["norm"])
    proj = dense(x, p["multihead_proj"]).reshape(A, F, D)
    want = np.transpose(proj, (1, 0, 2))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# 7. SDEDecoder oracle (``dec_hivt_nusargo_sde.py:72-105``)
# ---------------------------------------------------------------------------
def test_sde_decoder_oracle(rng):
    """fuse → 60-step Euler rollout (g forced ≈0 → deterministic) →
    loc / elu-scale / pi heads."""
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.sde import decoder_time_grid

    A, D, F, Tf = 3, 16, 2, 8
    scene = _tiny_scene(rng, A=A, Th=5)
    local = rng.normal(size=(1, A, D)).astype(np.float32)
    glob = rng.normal(size=(1, F, A, D)).astype(np.float32)
    dec = SDEDecoder(
        local_channels=D, global_channels=D, future_steps=Tf, num_modes=F,
        max_fut_t=2.0,
    )
    variables = dec.init(
        {"params": jax.random.key(0), "sde": jax.random.key(1)},
        scene, jnp.asarray(local), jnp.asarray(glob),
    )
    params = jax.device_get(variables["params"])
    head = params["sde_rollout"]["g_func"]["dense_out"]
    head["kernel"] = jnp.zeros_like(head["kernel"])
    head["bias"] = jnp.full_like(head["bias"], -40.0)
    out = dec.apply(
        {"params": params}, scene, jnp.asarray(local), jnp.asarray(glob),
        rngs={"sde": jax.random.key(2)},
    )
    p = P(params)

    # fuse: Dense([global, local]) → relu(LN)  (``:82-86``)
    local_exp = np.broadcast_to(local[0][None], (F, A, D))
    h = dense(np.concatenate([glob[0], local_exp], -1), p["aggr_dense"])
    y = relu(ln(h, p["aggr_ln"]))

    # rollout: one Euler step per linspace segment, g≈0 (``:72,88``)
    t0s, dts = jax.tree.map(np.asarray, decoder_time_grid(Tf, 2.0))
    sol = np.zeros((Tf, F, A, D), np.float32)
    for k in range(Tf):
        f = ffunc_numpy(p["sde_rollout"]["f_func"], t0s[k], y)
        y = y + f * dts[k]
        sol[k] = y
    sol = np.transpose(sol, (1, 2, 0, 3))  # [F, A, Tf, D]

    # flax names list attributes loc_layers_0 (Dense), loc_layers_1 (LN),
    # loc_layers_2 (Dense) at the top level
    loc = dense(relu(ln(dense(sol, p["loc_layers_0"]), p["loc_layers_1"])), p["loc_layers_2"])
    scale = dense(relu(ln(dense(sol, p["scale_layers_0"]), p["scale_layers_1"])), p["scale_layers_2"])
    elu = lambda v: np.where(v > 0, v, np.exp(np.minimum(v, 0)) - 1.0)
    scale = elu(scale) + 1.0 + 1e-3
    want_loc = np.concatenate([loc, scale], -1)[None]

    pig = np.concatenate([local_exp, glob[0]], -1)
    pi = dense(relu(ln(dense(pig, p["pi_layers_0"]), p["pi_layers_1"])), p["pi_layers_2"])
    want_pi = np.transpose(pi[..., 0], (1, 0))[None]

    np.testing.assert_allclose(np.asarray(out["loc"]), want_loc, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["pi"]), want_pi, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# 8. TemporalEncoder oracle (``enc_hivt_nusargo_grid.py:218-291``)
# ---------------------------------------------------------------------------
def test_temporal_encoder_oracle(rng):
    """Padding-token substitution, cls append, learned pos embed, 4 pre-LN
    causal transformer layers (packed-qkv MHA), final norm, cls output."""
    from trajsde_tpu.models.local_encoder import TemporalEncoder

    A, Th, D, H = 4, 6, 16, 4
    x = rng.normal(size=(1, A, Th, D)).astype(np.float32)
    padding = rng.uniform(size=(1, A, Th)) < 0.3
    enc = TemporalEncoder(historical_steps=Th, embed_dim=D, num_heads=H, num_layers=4)
    variables = enc.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(padding))
    got = np.asarray(enc.apply(variables, jnp.asarray(x), jnp.asarray(padding)))[0]
    p = P(variables["params"])

    def mha(xs, mp):
        """torch nn.MultiheadAttention math: packed in_proj, causal mask
        (q attends to k ≤ q; cls is last ⇒ sees all)."""
        T1, D_ = xs.shape
        hd = D_ // H
        qkv = xs @ mp["in_proj"]["kernel"] + mp["in_proj"]["bias"]
        q, k, v = np.split(qkv, 3, -1)
        q = q.reshape(T1, H, hd)
        k = k.reshape(T1, H, hd)
        v = v.reshape(T1, H, hd)
        logits = np.einsum("qhd,khd->hqk", q, k) / hd ** 0.5
        for i in range(T1):
            logits[:, i, i + 1:] = -np.inf
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        out = np.einsum("hqk,khd->qhd", w, v).reshape(T1, D_)
        return out @ mp["out_proj"]["kernel"] + mp["out_proj"]["bias"]

    want = np.zeros((A, D), np.float32)
    for a in range(A):
        h = np.where(padding[0, a][:, None], p["padding_token"], x[0, a])
        h = np.concatenate([h, p["cls_token"]], 0) + p["pos_embed"]
        for li in range(4):
            lp = p[f"layer{li}"]
            h = h + mha(ln(h, lp["norm1"]), lp["self_attn"])
            h = h + mlp_block(ln(h, lp["norm2"]), lp["mlp"])
        want[a] = ln(h, p["norm"])[-1]
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# 9. ALEncoder oracle (``enc_hivt_nusargo_grid.py:294-398``)
# ---------------------------------------------------------------------------
def test_al_encoder_oracle(rng):
    """Lane→actor cross attention: per-receiver-rotated lane embedding,
    scatter softmax over each actor's lane set (incl. an empty set),
    gated update, residual MLP."""
    from trajsde_tpu.models.local_encoder import ALEncoder

    A, L, D, H = 4, 6, 16, 4
    x_actor = rng.normal(size=(1, A, D)).astype(np.float32)
    lane_feat = rng.normal(size=(1, L, 2)).astype(np.float32)
    al_vec = rng.normal(0, 10, size=(1, A, L, 2)).astype(np.float32)
    mask = rng.uniform(size=(1, A, L)) < 0.5
    mask[0, 1] = False  # actor with no lanes: aggr='add' over the empty set
    angles = rng.uniform(-np.pi, np.pi, A).astype(np.float32)
    R = np.stack([rot_mat(a) for a in angles])

    enc = ALEncoder(embed_dim=D, num_heads=H)
    args = (
        jnp.asarray(x_actor), jnp.asarray(lane_feat), jnp.asarray(al_vec),
        jnp.asarray(mask), jnp.asarray(R)[None],
    )
    variables = enc.init(jax.random.key(0), *args)
    got = np.asarray(enc.apply(variables, *args))[0]
    p = P(variables["params"])

    normed = ln(x_actor[0], p["norm1"])
    msg = np.zeros((A, D), np.float32)
    for i in range(A):
        nbrs = [
            multi_embed(
                [lane_feat[0, j] @ R[i], al_vec[0, i, j] @ R[i]], p["lane_embed"]
            )
            for j in range(L)
            if mask[0, i, j]
        ]
        msg[i] = edge_attention_update(
            normed[i], np.stack(nbrs) if nbrs else np.zeros((0, D)), p["attn"], H
        )
    xo = x_actor[0] + msg
    want = xo + mlp_block(ln(xo, p["norm2"]), p["mlp"])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


# ---------------------------------------------------------------------------
# 10. MLPDecoder oracle (``dec_hivt_nusargo_grid.py:10-64``)
# ---------------------------------------------------------------------------
def test_mlp_decoder_oracle(rng):
    """aggr_embed fusion (global‖local), one-shot loc head, elu+1 scale,
    pi head on (local‖global), reg_mask from the future padding."""
    from trajsde_tpu.models.decoders import MLPDecoder

    A, D, F, Tf = 3, 16, 2, 4
    scene = _tiny_scene(rng, A=A, Th=5, Tf=Tf)
    local = rng.normal(size=(1, A, D)).astype(np.float32)
    glob = rng.normal(size=(1, F, A, D)).astype(np.float32)
    dec = MLPDecoder(local_channels=D, global_channels=D, future_steps=Tf, num_modes=F)
    variables = dec.init(jax.random.key(0), scene, jnp.asarray(local), jnp.asarray(glob))
    out = dec.apply(variables, scene, jnp.asarray(local), jnp.asarray(glob))
    p = P(variables["params"])

    local_exp = np.broadcast_to(local[0][None], (F, A, D))
    head = lambda pre, n, v: dense(v, p[f"{pre}_dense{n}"])

    pig = np.concatenate([local_exp, glob[0]], -1)
    h = relu(ln(head("pi", 0, pig), p["pi_ln0"]))
    h = relu(ln(head("pi", 1, h), p["pi_ln1"]))
    want_pi = np.transpose(head("pi", 2, h)[..., 0], (1, 0))[None]

    h = dense(np.concatenate([glob[0], local_exp], -1), p["aggr_dense"])
    h = relu(ln(h, p["aggr_ln"]))
    loc = head("loc", 1, relu(ln(head("loc", 0, h), p["loc_ln0"]))).reshape(F, A, Tf, 2)
    scale = head("scale", 1, relu(ln(head("scale", 0, h), p["scale_ln0"]))).reshape(F, A, Tf, 2)
    elu = lambda v: np.where(v > 0, v, np.exp(np.minimum(v, 0)) - 1.0)
    want_loc = np.concatenate([loc, elu(scale) + 1.0 + 1e-3], -1)[None]

    np.testing.assert_allclose(np.asarray(out["loc"]), want_loc, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["pi"]), want_pi, rtol=3e-4, atol=3e-5)
    want_reg = ~np.asarray(scene.padding_mask)[:, :, -Tf:]
    np.testing.assert_array_equal(np.asarray(out["reg_mask"]), want_reg)
