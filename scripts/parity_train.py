"""Mini end-to-end ACCURACY-parity run (VERDICT r2 item #2).

Trains BOTH stacks from identical transplanted initial weights on the same
tiny synthetic dataset and records metric trajectories:

* this repo: LocalEncoderSDESepPara2 → GlobalInteractor → SDEDecoder with
  optax AdamW (the flagship SDE path);
* the reference: its own torch modules at /root/reference executed through
  the transplant harness (PyG/torchsde stubbed at the import layer only;
  the injected ``sdeint``/``sdeint_dual`` are plain Euler–Maruyama with
  torch-native Brownian draws — the same scheme the reference's forked
  solver implements), trained with torch.optim.AdamW.

Both see the SAME scene groups: with ``--batch B`` the jax side trains on
padded dense [B, A] batches while the torch side trains on exactly-sized
PyG-style mega-graphs of the same scenes (``TemporalData.__inc__``
batching), so the global masked-mean loss denominators match even with
``--ragged`` per-scene actor counts.  Brownian/dropout draws are each
stack's own, so agreement is expected at the METRIC level (the ±1%
north-star is defined there — SURVEY §6 "evaluation-order
nondeterminism").

``--dims shipped`` runs the flagship architecture (D=64 / 8 heads /
TH=21 / TF=60 / K=10 — the reference-dims grad-parity configuration).

Writes PARITY_TRAIN.json and prints a markdown table for PARITY.md.

Usage: python scripts/parity_train.py [--steps 180] [--eval-every 30]
       python scripts/parity_train.py --dims shipped --batch 2 --ragged \
           --steps 200 --eval-every 50 --out PARITY_TRAIN_shipped.json
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import optax
import torch

from test_reference_grad_parity import (
    Binder,
    _bind_aggregator,
    _bind_sde_decoder,
    _bind_sde_encoder,
    _ref,
)
from trajsde_tpu.data.scene import SceneBatch, rotate_into
from trajsde_tpu.losses import diff_bce_loss, l2_loss
from trajsde_tpu.models.aggregator import GlobalInteractor
from trajsde_tpu.models.decoders import SDEDecoder
from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

# tiny shared config (--dims shipped overrides to the flagship architecture)
A, TH, TF, D, H, F = 4, 5, 8, 16, 4, 2
MAX_PAST_T, MAX_FUT_T, DEC_MIN_STEP = 0.4, 2.0, 0.25
RADIUS = 60.0
LR, WD = 1e-3, 1e-4
END_IDCS = [TF - 1, TF // 2 - 1]  # nuScenes / Argoverse end slots on the TF grid

DIMS = {
    # A is A_max (the padded actor capacity; --ragged varies valid counts)
    "tiny": dict(A=4, TH=5, TF=8, D=16, H=4, F=2,
                 max_past_t=0.4, max_fut_t=2.0, dec_min_step=0.25),
    # the shipped architecture: D=64 / 8 heads / 21 segments / 60 steps /
    # K=10 — the same config the reference-dims grad-parity test pins
    # (tests/test_reference_grad_parity.py "reference-dims")
    "shipped": dict(A=6, TH=21, TF=60, D=64, H=8, F=10,
                    max_past_t=2.0, max_fut_t=6.0, dec_min_step=0.1),
}


def gen_scene(rng: np.random.Generator, source: int, n_actors: int = None) -> tuple:
    """One learnable constant-velocity-plus-noise scene, padded to ``A``
    actor slots with ``n_actors`` valid (agent = slot 0 always valid).
    Returns ``(SceneBatch, n_actors)``."""
    n = A if n_actors is None else int(n_actors)
    T = TH + TF
    pos = np.zeros((1, A, T, 2), np.float32)
    angles = np.zeros((1, A), np.float32)
    for a in range(n):
        p0 = rng.uniform(-20, 20, 2).astype(np.float32)
        vel = rng.uniform(-6, 6, 2).astype(np.float32)
        t_axis = (np.arange(T) - (TH - 1)) * 0.1
        pos[0, a] = p0[None] + vel[None] * t_axis[:, None]
        pos[0, a] += rng.normal(0, 0.03, pos[0, a].shape)
        angles[0, a] = np.arctan2(vel[1], vel[0])
    ref = pos[:, :, TH - 1]
    x = pos[:, :, :TH] - ref[:, :, None]
    y = pos[:, :, TH:] - ref[:, :, None]
    padding = np.zeros((1, A, T), bool)
    padding[:, n:] = True  # padded slots: no observations anywhere
    bos = np.zeros((1, A, TH), bool)
    bos[:, :n, 0] = True
    valid = np.zeros((1, A), bool)
    valid[:, :n] = True
    lane_pos = np.zeros((1, 4, 5, 2), np.float32)
    lane_pad = np.zeros((1, 4, 5), bool)
    for l in range(4):
        start = rng.uniform(-25, 25, 2).astype(np.float32)
        d = rng.uniform(-np.pi, np.pi)
        dvec = np.array([np.cos(d), np.sin(d)], np.float32)
        lane_pos[0, l] = start[None] + dvec[None] * np.arange(5, dtype=np.float32)[:, None]
    scene = SceneBatch(
        x=jnp.asarray(x),
        positions=jnp.asarray(pos),
        padding_mask=jnp.asarray(padding),
        bos_mask=jnp.asarray(bos),
        rotate_angles=jnp.asarray(angles),
        actor_valid=jnp.asarray(valid),
        agent_index=jnp.zeros((1,), jnp.int32),
        av_index=jnp.zeros((1,), jnp.int32),
        source=jnp.full((1,), source, jnp.int32),
        y=jnp.asarray(y),
        lane_positions=jnp.asarray(lane_pos),
        lane_paddings=jnp.asarray(lane_pad),
        lane_valid=jnp.ones((1, 4), bool),
    )
    return scene, n


def pack_group(scenes) -> SceneBatch:
    """Stack B per-scene SceneBatches (each [1, A, ...]) into one [B, A, ...]
    padded batch — the dense analog of the reference's PyG mega-graph."""
    import jax as _jax

    return _jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *scenes)


def _torch_data_mega(scene_ns, radius):
    """The reference's PyG ``Batch`` analog: concatenate the VALID actors of
    B scenes into ONE mega-graph with offset edge / lane-actor indices —
    the ``TemporalData.__inc__`` batching semantics
    (``models/utils/util.py:67-75``) the reference trains on.  Includes the
    per-scene rotated targets as ``y`` (``model_base_mix_sde.py:83-84``)."""
    from test_reference_grad_parity import _TData
    from trajsde_tpu.models import graph

    xs, poss, pads, boss, rots, angs, ys = [], [], [], [], [], [], []
    eis, batch, agent_idx, sources = [], [], [], []
    lane_pos, lane_pad = [], []
    al_src, al_dst, al_vecs = [], [], []
    o = 0       # actor offset
    lo = 0      # lane offset
    for b, (scene, n) in enumerate(scene_ns):
        angles = np.asarray(scene.rotate_angles)[0, :n]
        c, s = np.cos(angles), np.sin(angles)
        R = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2).astype(
            np.float32
        )
        xs.append(np.asarray(scene.x)[0, :n])
        poss.append(np.asarray(scene.positions)[0, :n])
        pads.append(np.asarray(scene.padding_mask)[0, :n])
        boss.append(np.asarray(scene.bos_mask)[0, :n])
        rots.append(R)
        angs.append(angles)
        y = np.asarray(scene.y)[0, :n]
        ys.append(np.einsum("atj,aji->ati", y, R))
        eis.extend(
            [j + o, i + o] for i in range(n) for j in range(n) if i != j
        )
        batch.extend([b] * n)
        agent_idx.append(o)
        sources.append(int(np.asarray(scene.source)[0]))
        lp = np.asarray(scene.lane_positions)[0]
        lane_pos.append(lp)
        lane_pad.append(np.asarray(scene.lane_paddings)[0].astype(np.float32))
        al_mask, al_vec = jax.device_get(graph.al_edges(scene, TH - 1, radius))
        for i in range(n):
            for j in range(al_mask.shape[2]):
                if al_mask[0, i, j]:
                    al_src.append(j + lo)
                    al_dst.append(i + o)
                    al_vecs.append(al_vec[0, i, j])
        o += n
        lo += lp.shape[0]
    cat = lambda parts: torch.from_numpy(np.concatenate(parts, axis=0))
    return _TData({
        "x": cat(xs),
        "positions": cat(poss),
        "padding_mask": cat(pads),
        "bos_mask": cat(boss),
        "rotate_mat": cat(rots),
        "rotate_angles": cat(angs),
        "y": cat(ys),
        "agent_index": torch.tensor(agent_idx, dtype=torch.long),
        "source": torch.tensor(sources, dtype=torch.long),
        "batch": torch.tensor(batch, dtype=torch.long),
        "edge_index": torch.tensor(eis, dtype=torch.long).t().contiguous()
        if eis else torch.zeros((2, 0), dtype=torch.long),
        "num_nodes": o,
        "lane_positions": cat(lane_pos),
        "lane_paddings": cat(lane_pad),
        "lane_actor_index": torch.tensor([al_src, al_dst], dtype=torch.long),
        "lane_actor_vectors": torch.from_numpy(
            np.asarray(al_vecs, np.float32).reshape(len(al_src), 2)
        ),
    })


def minade_minfde(pred, target, source):
    """Per-scene agent minADE / minFDE (per-source end index, K=F modes).

    pred [F, TF, 2], target [TF, 2] — all steps valid in these scenes.
    """
    end = END_IDCS[int(source)]
    l2 = np.linalg.norm(pred - target[None], axis=-1)  # [F, TF]
    if int(source) == 0:  # nuScenes rule: best mode by ADE (ade_t.py:52-60)
        best = int(np.argmin(l2[:, : end + 1].mean(-1)))
    else:  # Argoverse rule: best mode by FDE at end index
        best = int(np.argmin(l2[:, end]))
    return float(l2[best, : end + 1].mean()), float(l2[:, end].min())


def main():
    global A, TH, TF, D, H, F, MAX_PAST_T, MAX_FUT_T, DEC_MIN_STEP, END_IDCS

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=180)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--eval-every", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=60)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument(
        "--dims", choices=sorted(DIMS), default="tiny",
        help="'shipped' runs the flagship architecture (D=64/H=8/TH=21/"
        "TF=60/K=10) — VERDICT r3 item #1",
    )
    ap.add_argument(
        "--batch", type=int, default=1,
        help="scenes per training step: >1 exercises the mega-graph batch "
        "loss reduction (one global masked mean over every valid "
        "actor-step cell, losses/L2.py:22-26) on both stacks",
    )
    ap.add_argument(
        "--ragged", action="store_true",
        help="vary the valid actor count per scene in [2, A]: the padded "
        "dense batch must reproduce the reference's exactly-sized PyG "
        "mega-graph on ragged scenes",
    )
    ap.add_argument(
        "--seed", type=int, default=0,
        help="training-noise seed offset: dataset, transplanted init and "
        "eval draws stay IDENTICAL across seeds; only the Brownian/dropout "
        "streams of the four training runs move — repeated runs sample the "
        "seed-to-seed distribution the final deltas are judged against",
    )
    ap.add_argument("--out", default="PARITY_TRAIN.json")
    args = ap.parse_args()
    soff = args.seed * 1_000_003  # decorrelate the per-seed noise streams

    dims = DIMS[args.dims]
    A, TH, TF, D, H, F = (dims[k] for k in ("A", "TH", "TF", "D", "H", "F"))
    MAX_PAST_T, MAX_FUT_T, DEC_MIN_STEP = (
        dims["max_past_t"], dims["max_fut_t"], dims["dec_min_step"]
    )
    END_IDCS = [TF - 1, TF // 2 - 1]

    rng = np.random.default_rng(0)

    def n_actors():
        return int(rng.integers(2, A + 1)) if args.ragged else A

    train_scenes = [gen_scene(rng, s % 2, n_actors()) for s in range(args.n_train)]
    val_scenes = [gen_scene(rng, s % 2, n_actors()) for s in range(args.n_val)]

    # ---------------- JAX stack -------------------------------------------
    enc = LocalEncoderSDESep(
        historical_steps=TH, embed_dim=D, num_heads=H, ref_time=TH - 1,
        max_past_t=MAX_PAST_T, minimum_step=0.1, local_radius=RADIUS,
        dropout=args.dropout,
    )
    agg = GlobalInteractor(
        historical_steps=TH, embed_dim=D, num_modes=F, num_heads=H, num_layers=3,
        dropout=args.dropout,
    )
    dec = SDEDecoder(
        local_channels=D, global_channels=D, future_steps=TF, num_modes=F,
        max_fut_t=MAX_FUT_T,
    )
    scene0 = pack_group([s for s, _ in train_scenes[: args.batch]])
    k = jax.random.key(0)
    enc_p = enc.init({"params": k, "sde": jax.random.key(1)}, scene0)["params"]
    local0 = enc.apply({"params": enc_p}, scene0, rngs={"sde": jax.random.key(1)})[0]
    agg_p = agg.init(jax.random.key(2), scene0, local0)["params"]
    glob0 = agg.apply({"params": agg_p}, scene0, local0)
    dec_p = dec.init(
        {"params": jax.random.key(3), "sde": jax.random.key(4)},
        scene0, local0, glob0,
    )["params"]
    params = {"enc": enc_p, "agg": agg_p, "dec": dec_p}

    def forward(p, scene, sde_key, drop_key, deterministic):
        rngs = {"sde": sde_key, "dropout": drop_key}
        out, d_in, d_out, l_in, l_out = enc.apply(
            {"params": p["enc"]}, scene, deterministic, rngs=rngs
        )
        glob = agg.apply({"params": p["agg"]}, scene, out, deterministic, rngs=rngs)
        o = dec.apply(
            {"params": p["dec"]}, scene, out, glob, deterministic, rngs=rngs
        )
        o = dict(o, diff_in=d_in, diff_out=d_out, label_in=l_in, label_out=l_out)
        rot = scene.rotate_mat()
        o["y"] = rotate_into(scene.y, rot[:, :, None])
        return o

    def loss_fn(p, scene, sde_key, drop_key):
        o = forward(p, scene, sde_key, drop_key, False)
        return l2_loss(o["y"], o) + diff_bce_loss(o["y"], o)

    opt = optax.adamw(LR, weight_decay=WD)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, opt_state, scene, key):
        sde_key, drop_key = jax.random.split(key)
        loss, grads = jax.value_and_grad(loss_fn)(p, scene, sde_key, drop_key)
        updates, opt_state = opt.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    eval_fwd = jax.jit(lambda p, s, k: forward(p, s, k, k, True))

    EVAL_DRAWS = 3  # average the stochastic-rollout metric over SDE draws

    def eval_jax(p):
        ades, fdes = [], []
        for i, (scene, _n) in enumerate(val_scenes):
            for s in range(EVAL_DRAWS):
                o = eval_fwd(p, scene, jax.random.key(10_000 + i * 17 + s))
                ai = int(scene.agent_index[0])
                pred = np.asarray(o["loc"])[0, :, ai, :, :2]
                target = np.asarray(o["y"])[0, ai]
                a, f = minade_minfde(pred, target, int(scene.source[0]))
                ades.append(a)
                fdes.append(f)
        return float(np.mean(ades)), float(np.mean(fdes))

    # ---------------- torch stack (the reference's own modules) -----------
    enc_mod = _ref("models.encoders.enc_hivt_nusargo_sde_sep2")
    dec_mod = _ref("models.decoders.dec_hivt_nusargo_sde")
    agg_mod = _ref("models.aggregators.agg_hivt")
    l2_mod = _ref("losses.L2")
    bce_mod = _ref("losses.diff_BCE")

    def sdeint_dual(sde, y0, ts2, nus_mask, dt=None, **kw):
        t0 = ts2[0]
        span = ts2[1] - ts2[0]
        f = sde.f(t0, y0)
        g = sde.g(t0, y0, nus_mask)
        y1 = y0 + f * span + g * (span ** 0.5) * torch.randn_like(y0)
        return torch.stack([y0, y1]), g

    def dec_sdeint(sde, y0, ts_grid, **kw):
        ys = [y0]
        y = y0
        for i in range(len(ts_grid) - 1):
            t0 = ts_grid[i]
            dtv = ts_grid[i + 1] - ts_grid[i]
            y = (
                y + sde.f(t0, y) * dtv
                + sde.g(t0, y) * (dtv ** 0.5) * torch.randn_like(y)
            )
            ys.append(y)
        return torch.stack(ys)

    enc_mod.sdeint_dual = sdeint_dual
    dec_mod.sdeint = dec_sdeint

    torch.manual_seed(0)
    ref_enc = enc_mod.LocalEncoderSDESepPara2(
        historical_steps=TH, embed_dim=D, num_heads=H, dropout=args.dropout,
        local_radius=RADIUS, node_dim=2, edge_dim=2, parallel=True,
        ref_time=TH - 1, max_past_t=MAX_PAST_T, minimum_step=0.1,
        run_backwards=True, sde_layers=2, method="euler",
        rtol=1e-3, atol=1e-3, input_diff=True,
    )
    ref_agg = agg_mod.GlobalInteractor(
        historical_steps=TH, embed_dim=D, num_modes=F, num_heads=H, num_layers=3,
        dropout=args.dropout, rotate=True, edge_dim=2,
    )
    ref_dec = dec_mod.SDEDecoder(
        local_channels=D, global_channels=D, future_steps=TF, num_modes=F,
        max_fut_t=MAX_FUT_T, uncertain=True, min_scale=1e-3, min_stepsize=DEC_MIN_STEP,
        method="euler", rtol=1e-3, atol=1e-3, ode_func_layers=3,
    )
    b = Binder()
    host = jax.device_get(params)
    with torch.no_grad():
        _bind_sde_encoder(ref_enc, host["enc"], b)
        _bind_aggregator(ref_agg, host["agg"], b)
        _bind_sde_decoder(ref_dec, host["dec"], b)
    t_params = (
        list(ref_enc.parameters()) + list(ref_agg.parameters())
        + list(ref_dec.parameters())
    )
    t_opt = torch.optim.AdamW([p for p in t_params if p.requires_grad], lr=LR, weight_decay=WD)
    t_l2, t_bce = l2_mod.L2(), bce_mod.DiffBCE()

    # torch noise replica: same transplanted init, different Brownian /
    # dropout seeds — the reference stack's own seed-to-seed yardstick
    ref_enc2 = enc_mod.LocalEncoderSDESepPara2(
        historical_steps=TH, embed_dim=D, num_heads=H, dropout=args.dropout,
        local_radius=RADIUS, node_dim=2, edge_dim=2, parallel=True,
        ref_time=TH - 1, max_past_t=MAX_PAST_T, minimum_step=0.1,
        run_backwards=True, sde_layers=2, method="euler",
        rtol=1e-3, atol=1e-3, input_diff=True,
    )
    ref_agg2 = agg_mod.GlobalInteractor(
        historical_steps=TH, embed_dim=D, num_modes=F, num_heads=H, num_layers=3,
        dropout=args.dropout, rotate=True, edge_dim=2,
    )
    ref_dec2 = dec_mod.SDEDecoder(
        local_channels=D, global_channels=D, future_steps=TF, num_modes=F,
        max_fut_t=MAX_FUT_T, uncertain=True, min_scale=1e-3, min_stepsize=DEC_MIN_STEP,
        method="euler", rtol=1e-3, atol=1e-3, ode_func_layers=3,
    )
    b2 = Binder()
    with torch.no_grad():
        _bind_sde_encoder(ref_enc2, host["enc"], b2)
        _bind_aggregator(ref_agg2, host["agg"], b2)
        _bind_sde_decoder(ref_dec2, host["dec"], b2)
    t_params2 = (
        list(ref_enc2.parameters()) + list(ref_agg2.parameters())
        + list(ref_dec2.parameters())
    )
    t_opt2 = torch.optim.AdamW(
        [p for p in t_params2 if p.requires_grad], lr=LR, weight_decay=WD
    )

    t_datas = {}

    def torch_data(idx, scene_ns):
        """Mega-graph data for a list of (scene, n_valid) pairs — the B=1
        case degenerates to the original single-scene construction."""
        if idx not in t_datas:
            t_datas[idx] = _torch_data_mega(scene_ns, RADIUS)
        return t_datas[idx]

    def torch_forward(data, enc_m=None, agg_m=None, dec_m=None):
        enc_m, agg_m, dec_m = enc_m or ref_enc, agg_m or ref_agg, dec_m or ref_dec
        out_t, d_in, d_out, l_in, l_out = enc_m(data)
        glob_t = agg_m(data, out_t)
        o = dec_m(data, out_t, glob_t)
        o["diff_in"], o["diff_out"] = d_in, d_out
        o["label_in"], o["label_out"] = l_in, l_out
        return o

    def eval_torch(mods=None):
        enc_m, agg_m, dec_m = mods or (ref_enc, ref_agg, ref_dec)
        enc_m.eval(), agg_m.eval(), dec_m.eval()
        ades, fdes = [], []
        with torch.no_grad():
            for i, (scene, n) in enumerate(val_scenes):
                data = torch_data(("val", i), [(scene, n)])
                for s in range(EVAL_DRAWS):
                    torch.manual_seed(20_000 + i * 17 + s)
                    o = torch_forward(data, enc_m, agg_m, dec_m)
                    ai = 0  # single-scene mega graph: agent is row 0
                    pred = o["loc"][:, ai, :, :2].numpy()
                    target = data["y"][ai].numpy()
                    a, f = minade_minfde(pred, target, int(scene.source[0]))
                    ades.append(a)
                    fdes.append(f)
        enc_m.train(), agg_m.train(), dec_m.train()
        return float(np.mean(ades)), float(np.mean(fdes))

    # ---------------- the run ---------------------------------------------
    history = []
    jl_acc, tl_acc, jt_time, tt_time = [], [], 0.0, 0.0
    key = jax.random.key(42 + soff)

    # noise replica: the SAME stack, SAME init, different Brownian/dropout
    # seeds — its final distance from the primary run is the seed-to-seed
    # yardstick against which the repo-vs-reference delta must be judged
    # (training is stochastic; two runs of ONE stack also diverge)
    params_rep, opt_state_rep = params, opt.init(params)
    key_rep = jax.random.key(4242 + soff)

    # training groups: B consecutive scenes per step, cycling the dataset;
    # the jax side packs them into one padded [B, A] batch, the torch side
    # into one exactly-sized PyG-style mega-graph — the SAME grouping, so
    # the mega-graph global masked-mean loss denominators match
    n_groups = max(1, len(train_scenes) // args.batch)
    groups = [
        train_scenes[g * args.batch : (g + 1) * args.batch]
        for g in range(n_groups)
    ]
    packed_groups = [pack_group([s for s, _ in g]) for g in groups]

    # warm-up compile (functional: discarding the outputs leaves the run
    # untouched) so ms/step measures steady-state, not XLA compilation
    train_step(params, opt_state, packed_groups[0], key)

    def record(step):
        ja, jf = eval_jax(params)
        ta, tf_ = eval_torch()
        history.append({
            "step": step,
            "jax": {"minADE": ja, "minFDE": jf},
            "torch_ref": {"minADE": ta, "minFDE": tf_},
            "jax_train_loss": float(np.mean(jl_acc)) if jl_acc else None,
            "torch_train_loss": float(np.mean(tl_acc)) if tl_acc else None,
        })
        print(
            f"step {step:4d}  jax ADE {ja:.3f} FDE {jf:.3f}   "
            f"ref ADE {ta:.3f} FDE {tf_:.3f}"
        )
        jl_acc.clear()
        tl_acc.clear()

    record(0)
    for step in range(1, args.steps + 1):
        gi = (step - 1) % n_groups
        packed = packed_groups[gi]

        t0 = time.perf_counter()
        key, sub = jax.random.split(key)
        params, opt_state, jl = train_step(params, opt_state, packed, sub)
        jl = float(jl)
        jt_time += time.perf_counter() - t0
        jl_acc.append(jl)

        key_rep, sub_rep = jax.random.split(key_rep)
        params_rep, opt_state_rep, _ = train_step(
            params_rep, opt_state_rep, packed, sub_rep
        )

        t0 = time.perf_counter()
        torch.manual_seed(1_000 + step + soff)
        data = torch_data(("train", gi), groups[gi])
        o = torch_forward(data)
        tl = t_l2({"y": data["y"]}, o) + t_bce({"y": data["y"]}, o)
        t_opt.zero_grad()
        tl.backward()
        t_opt.step()
        tt_time += time.perf_counter() - t0
        tl_acc.append(float(tl.detach()))

        torch.manual_seed(700_000 + step + soff)
        o2 = torch_forward(data, ref_enc2, ref_agg2, ref_dec2)
        tl2 = t_l2({"y": data["y"]}, o2) + t_bce({"y": data["y"]}, o2)
        t_opt2.zero_grad()
        tl2.backward()
        t_opt2.step()

        if step % args.eval_every == 0:
            record(step)

    final = history[-1]
    rel = {
        m: abs(final["jax"][m] - final["torch_ref"][m])
        / max(final["torch_ref"][m], 1e-9)
        for m in ("minADE", "minFDE")
    }
    rep_a, rep_f = eval_jax(params_rep)
    trep_a, trep_f = eval_torch((ref_enc2, ref_agg2, ref_dec2))
    seed_spread = {
        "jax_minADE": abs(final["jax"]["minADE"] - rep_a)
        / max(final["jax"]["minADE"], 1e-9),
        "jax_minFDE": abs(final["jax"]["minFDE"] - rep_f)
        / max(final["jax"]["minFDE"], 1e-9),
        "torch_minADE": abs(final["torch_ref"]["minADE"] - trep_a)
        / max(final["torch_ref"]["minADE"], 1e-9),
        "torch_minFDE": abs(final["torch_ref"]["minFDE"] - trep_f)
        / max(final["torch_ref"]["minFDE"], 1e-9),
    }
    result = {
        "config": {
            "A": A, "TH": TH, "TF": TF, "D": D, "F": F, "steps": args.steps,
            "n_train": args.n_train, "n_val": args.n_val, "lr": LR, "wd": WD,
            "seed": args.seed, "dims": args.dims, "batch": args.batch,
            "ragged": bool(args.ragged),
            "valid_actor_counts_train": [n for _, n in train_scenes],
        },
        "history": history,
        "final_rel_delta": rel,
        "noise_replica_final": {
            "jax": {"minADE": rep_a, "minFDE": rep_f},
            "torch_ref": {"minADE": trep_a, "minFDE": trep_f},
        },
        "seed_to_seed_rel_spread": seed_spread,
        "jax_ms_per_step_cpu": 1000 * jt_time / args.steps,
        "torch_ref_ms_per_step_cpu": 1000 * tt_time / args.steps,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)

    print("\n| step | repo minADE | ref minADE | repo minFDE | ref minFDE |")
    print("|------|------------|-----------|------------|-----------|")
    for h in history:
        print(
            f"| {h['step']} | {h['jax']['minADE']:.3f} | "
            f"{h['torch_ref']['minADE']:.3f} | {h['jax']['minFDE']:.3f} | "
            f"{h['torch_ref']['minFDE']:.3f} |"
        )
    print(f"\nfinal relative deltas vs reference: {rel}")
    print(
        f"noise replicas (same init, different seeds): "
        f"jax ADE {rep_a:.3f} FDE {rep_f:.3f}; "
        f"torch ADE {trep_a:.3f} FDE {trep_f:.3f}"
    )
    print(f"seed-to-seed spreads: {seed_spread}")
    print(
        f"CPU ms/step (B=1): repo {result['jax_ms_per_step_cpu']:.1f}, "
        f"reference {result['torch_ref_ms_per_step_cpu']:.1f}"
    )


if __name__ == "__main__":
    main()
