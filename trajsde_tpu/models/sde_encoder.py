"""Latent-SDE local encoder (ODE-RNN over a latent neural SDE).

TPU-native re-design of ``models/encoders/enc_hivt_nusargo_sde_sep2.py:25-370``:

* the 21-iteration Python loop of ``sdeint_dual`` calls (one Euler–Maruyama
  segment each, ``:140-181``) becomes a single ``nn.scan`` carrying
  ``(h, domain_mask)``;
* the noise-perturbed "agent twin" (``x_agent + 2·randn``, ``:88-103``)
  becomes one extra receive-only query row in the dense AA attention —
  the twin shares the agent's incoming-edge mask / geometry (positions are
  NOT perturbed; only the displacement features are) and is never a key;
* the per-step diffusion magnitudes are tapped from the scan outputs and
  gathered at each agent's end-of-sequence iteration index
  (``eos = ref_time − argmax(bos_mask)``, ``:187-191``);
* ``forward_ood`` (``:204-314``) runs ``eval_iter`` stochastic re-runs
  (zeros init, no twins) and scores OOD by the per-actor std of the final
  embeddings.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from trajsde_tpu.data.scene import SceneBatch
from trajsde_tpu.models import graph
from trajsde_tpu.models.local_encoder import AAEncoder, ALEncoder
from trajsde_tpu.models.sde import SDEGRUStep, encoder_time_grid, scanned

TOKEN_INIT = nn.initializers.normal(stddev=0.02)

REAL_LABEL = 0.0
FAKE_LABEL = 1.0


def _gather_actor(arr: jax.Array, idx: jax.Array, axis: int) -> jax.Array:
    """Gather one per-scene actor slot: arr [B, ..., A, ...] × idx [B]."""
    idx_shape = [1] * arr.ndim
    idx_shape[0] = arr.shape[0]
    bidx = idx.reshape(idx_shape)
    bidx = jnp.broadcast_to(bidx, arr.shape[:axis] + (1,) + arr.shape[axis + 1 :])
    return jnp.take_along_axis(arr, bidx.astype(jnp.int32), axis=axis)


def gather_eos_outputs(
    ys: jax.Array,
    gs: jax.Array,
    bos_q: jax.Array,
    ref_time: int,
    agent_index: jax.Array,
    num_actors: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """EOS gather + diffusion split (``enc_hivt_nusargo_sde_sep2.py:184-196``).

    ys [Th, B, A+1, D] / gs [Th, B, A+1] are iteration-ordered scan outputs
    (iteration k consumed time step Th−1−k); bos_q [B, A+1, Th].  Per-actor
    final state is taken at iteration ``eos = ref_time − argmax(bos)``; the
    diffusion taps are the agent row and its twin (slot ``num_actors``),
    both at the AGENT's eos iteration.  Returns (out [B, A, D],
    diff_in [B], diff_out [B]).
    """
    A = num_actors
    eos = ref_time - jnp.argmax(bos_q.astype(jnp.int32), axis=-1)  # [B, A+1]
    ys_bn = jnp.transpose(ys, (1, 2, 0, 3))          # [B, A+1, Th, D]
    out_all = jnp.take_along_axis(
        ys_bn, eos[:, :, None, None].astype(jnp.int32), axis=2
    )[:, :, 0, :]                                     # [B, A+1, D]
    out = out_all[:, :A]

    gs_bn = jnp.transpose(gs, (1, 2, 0))              # [B, A+1, Th]
    agent_eos = jnp.take_along_axis(eos[:, :A], agent_index[:, None], axis=1)
    g_rows_agent = _gather_actor(gs_bn, agent_index, axis=1)[:, 0]  # [B, Th]
    g_rows_twin = gs_bn[:, A]                                        # [B, Th]
    diff_in = jnp.take_along_axis(g_rows_agent, agent_eos.astype(jnp.int32), axis=1)[:, 0]
    diff_out = jnp.take_along_axis(g_rows_twin, agent_eos.astype(jnp.int32), axis=1)[:, 0]
    return out, diff_in, diff_out


class LocalEncoderSDESep(nn.Module):
    """Registry name: ``LocalEncoderSDESepPara2`` (config-compatible kwargs)."""

    historical_steps: int
    embed_dim: int
    num_heads: int = 8
    dropout: float = 0.1
    local_radius: float = 50.0
    ref_time: int = 20
    max_past_t: float = 2.0
    minimum_step: float = 0.1
    run_backwards: bool = True
    sde_layers: int = 2
    eval_iter: int = 10
    node_dim: int = 2
    edge_dim: int = 2
    input_diff: bool = True
    # accepted for config parity — but only the shipped-config combination
    # (fixed-grid Euler, no adjoint) is implemented; anything else raises
    # loudly in setup() instead of silently degrading
    parallel: bool = True
    adjoint: bool = False
    method: str = "euler"
    adaptive: bool = False
    rtol: float = 1e-3
    atol: float = 1e-3
    remat: bool = False  # rematerialize the AA/AL pair tensors
    dtype: Any = None    # compute dtype (bfloat16 mixed precision); params stay f32
    fused: bool = False  # Pallas fused AA pair chain (custom VJP)
    rows_fwd: int = 64   # fused forward per-tile row budget (VMEM knob)
    rows_bwd: int = 32   # fused backward per-tile row budget
    ln_mm: bool = True   # fused kernel: LN stats via MXU matmuls
    scan_unroll: int = 1  # lax.scan unroll for the 21-step ODE-RNN
    packed: bool = True   # pack f+g_nus+g_argo (and GRU gates) per step
                          # into full-width matmul chains
    ood_chunk: int = 0    # forward_ood ensemble chunking: fold only this
                          # many of the eval_iter members into the batch at
                          # a time (0 = all at once).  Memory fallback for
                          # production shapes where the 10× folded ODE-RNN
                          # would OOM (VERDICT r2 item #7)
    neighbor_cap: int = 0  # AA pair chain neighbor cap (see AAEncoder)

    def setup(self):
        if self.method != "euler":
            raise NotImplementedError(
                f"SDE method {self.method!r} is not supported (euler only)"
            )
        if self.adjoint:
            raise NotImplementedError(
                "adjoint SDE gradients are not supported (the shipped reference "
                "configs backprop through the unrolled Euler scheme, "
                "configs/...sdedec.yml:41)"
            )
        if self.ref_time != self.historical_steps - 1:
            # gather_eos_outputs computes eos = ref_time − argmax(bos) over
            # historical_steps ODE-RNN iterations; any other pairing can
            # index out of bounds, which take_along_axis fills with NaN
            # under jit — the NaN-guard would then silently skip EVERY step
            raise ValueError(
                f"ref_time ({self.ref_time}) must equal historical_steps - 1 "
                f"({self.historical_steps - 1}): the eos gather rule "
                "(reference enc_...sde_sep2.py:187-191) assumes the "
                "reference step is the final historical slot"
            )
        if not self.input_diff:
            raise NotImplementedError(
                "input_diff=false is not supported for the SDE encoder: the "
                "reference SDE AAEncoder hardcodes the bos-token "
                "substitution (only the baseline grid encoder branches "
                "on it, enc_hivt_nusargo_grid.py:152)"
            )
        if not self.run_backwards:
            raise NotImplementedError(
                "run_backwards=false is a DEAD branch in the reference: its "
                "forward iteration passes DESCENDING ts ([2.0, 1.9]) into "
                "sdeint_dual, which check_contract rejects ('ts must be "
                "strictly increasing', sdeint.py:877) — the branch crashes "
                "on the second step; only the backwards ODE-RNN is "
                "implemented here"
            )
        seg = self.max_past_t / max(1, self.historical_steps - 1)
        if self.minimum_step < seg - 1e-9:
            raise NotImplementedError(
                f"minimum_step ({self.minimum_step}) below the observation "
                f"spacing ({seg:g}) would take multiple Euler substeps per "
                "segment (torchsde clipped stepping); this encoder "
                "integrates exactly one clipped step per segment — the "
                "shipped reference configs use minimum_step == spacing "
                "(0.1), where both are identical"
            )
        aa_cls = nn.remat(AAEncoder, static_argnums=(7,)) if self.remat else AAEncoder
        al_cls = nn.remat(ALEncoder, static_argnums=(6,)) if self.remat else ALEncoder
        self.aa_encoder = aa_cls(
            self.historical_steps,
            self.embed_dim,
            self.num_heads,
            self.dropout,
            input_diff=True,  # the reference SDE AAEncoder always substitutes bos
            dtype=self.dtype,
            fused=self.fused,
            rows_fwd=self.rows_fwd,
            rows_bwd=self.rows_bwd,
            ln_mm=self.ln_mm,
            neighbor_cap=self.neighbor_cap,
            name="aa_encoder",
        )
        self.al_encoder = al_cls(
            self.embed_dim, self.num_heads, self.dropout, dtype=self.dtype,
            name="al_encoder",
        )
        # adaptive=True swaps the single Euler step per observation segment
        # for bounded step-doubling integration (rtol/atol config knobs) —
        # the reference's ``adaptive: true`` capability, which is broken in
        # the reference itself for this dual path (``sdeint.py:354-358``)
        self.sde_rnn = scanned(
            SDEGRUStep,
            "sde_rnn",
            embed_dim=self.embed_dim,
            sde_layers=self.sde_layers,
            dtype=self.dtype,
            adaptive=self.adaptive,
            rtol=self.rtol,
            atol=self.atol,
            unroll=self.scan_unroll,
            packed=self.packed,
        )
        self.hidden = self.param("hidden", TOKEN_INIT, (self.embed_dim,))

    # ------------------------------------------------------------------
    def _aa_with_twin(self, scene: SceneBatch, deterministic: bool, twin_noise=None):
        """AA attention over A real actors + 1 twin query row.

        Returns (aa_out [B, Th, A+1, D], bos_q [B, A+1, Th],
        valid_q [B, A+1, Th], nus_row [B, A+1]).  ``twin_noise`` optionally
        supplies the twin's unit-normal perturbation (gradient-parity
        harness; shape [B, 1, Th, 2]).
        """
        B, A, Th = scene.x.shape[0], scene.x.shape[1], self.historical_steps
        rot = scene.rotate_mat()

        mask = graph.aa_masks(scene, self.local_radius)     # [B, Th, A, A]
        edge_vec = graph.aa_edge_vectors(scene)             # [B, Th, A, A, 2]
        x_t = jnp.transpose(scene.x, (0, 2, 1, 3))          # [B, Th, A, 2]

        # twin: perturbed displacement features, agent's geometry/masks
        x_agent = _gather_actor(scene.x, scene.agent_index, axis=1)  # [B,1,Th,2]
        if twin_noise is None:
            noise = jax.random.normal(self.make_rng("sde"), x_agent.shape, x_agent.dtype)
        else:
            noise = twin_noise.astype(x_agent.dtype)
        x_twin = x_agent + 2.0 * noise
        x_q = jnp.concatenate(
            [x_t, jnp.transpose(x_twin, (0, 2, 1, 3))], axis=2
        )  # [B, Th, A+1, 2]

        rot_q = jnp.concatenate([rot, _gather_actor(rot, scene.agent_index, 1)], axis=1)
        bos_q = jnp.concatenate(
            [scene.bos_mask, _gather_actor(scene.bos_mask, scene.agent_index, 1)], axis=1
        )
        mask_q = jnp.concatenate([mask, _gather_actor(mask, scene.agent_index, 2)], axis=2)
        edge_q = jnp.concatenate(
            [edge_vec, _gather_actor(edge_vec, scene.agent_index, 2)], axis=2
        )

        aa_out = self.aa_encoder(
            x_q, x_t, rot_q, bos_q, mask_q, edge_q, deterministic
        )  # [B, Th, A+1, D]

        pad = scene.padding_mask[:, :, :Th]
        valid_q = ~jnp.concatenate(
            [pad, _gather_actor(pad, scene.agent_index, 1)], axis=1
        )  # [B, A+1, Th]
        nus = scene.source == 0
        nus_row = jnp.broadcast_to(nus[:, None], (B, A + 1))
        return aa_out, bos_q, valid_q, nus_row

    def _run_rnn(self, h0, aa_out, valid_q, nus_row, sde_noise=None):
        """Scan the ODE-RNN newest→oldest; returns iteration-ordered outputs.

        aa_out [B, Th, N, D]; iteration k consumes time step Th−1−k
        (``run_backwards``, ``enc_hivt_nusargo_sde_sep2.py:131-133``).
        ``sde_noise`` optionally supplies the per-step Brownian unit normals,
        ITERATION-ordered [Th, B, N, D] (entry 0 = newest step).
        """
        t0s, dts = encoder_time_grid(
            self.historical_steps, self.max_past_t, self.minimum_step
        )
        obs = jnp.flip(jnp.transpose(aa_out, (1, 0, 2, 3)), axis=0)  # [Th, B, N, D]
        obs_mask = jnp.flip(jnp.transpose(valid_q, (2, 0, 1)), axis=0)  # [Th, B, N]
        xs = (obs, obs_mask, t0s, dts)
        if sde_noise is not None:
            xs = xs + (sde_noise,)
        (_, _), (ys, gs) = self.sde_rnn((h0, nus_row), xs)
        return ys, gs  # [Th, B, N, D], [Th, B, N]

    # ------------------------------------------------------------------
    def __call__(
        self,
        scene: SceneBatch,
        deterministic: bool = True,
        sde_noise=None,
        twin_noise=None,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
        """Returns (local_embed [B,A,D], diff_in [B], diff_out [B],
        label_in [B], label_out [B]).  ``sde_noise`` [Th, B, A+1, D]
        (iteration-ordered) / ``twin_noise`` [B, 1, Th, 2] optionally pin
        the Brownian and twin-perturbation draws (gradient-parity harness)."""
        B, A = scene.x.shape[0], scene.x.shape[1]
        Th = self.historical_steps

        aa_out, bos_q, valid_q, nus_row = self._aa_with_twin(
            scene, deterministic, twin_noise
        )

        h0 = jnp.broadcast_to(self.hidden, (B, A + 1, self.embed_dim))
        if self.dtype is not None:
            h0 = h0.astype(self.dtype)
        ys, gs = self._run_rnn(h0, aa_out, valid_q, nus_row, sde_noise)

        # per-actor final state at eos + agent/twin diffusion taps (``:184-196``)
        out, diff_in, diff_out = gather_eos_outputs(
            ys, gs, bos_q, self.ref_time, scene.agent_index.astype(jnp.int32), A
        )

        al_mask, al_vec = graph.al_edges(scene, self.ref_time, self.local_radius)
        lane_feat = graph.lane_features(scene)
        out = self.al_encoder(
            out, lane_feat, al_vec, al_mask, scene.rotate_mat(), deterministic
        )

        out = out.astype(jnp.float32)
        diff_in = diff_in.astype(jnp.float32)
        diff_out = diff_out.astype(jnp.float32)
        label_in = jnp.full((B,), REAL_LABEL, jnp.float32)
        label_out = jnp.full((B,), FAKE_LABEL, jnp.float32)
        return out, diff_in, diff_out, label_in, label_out

    # ------------------------------------------------------------------
    def forward_ood(
        self, scene: SceneBatch, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        """OOD scoring: ``eval_iter`` stochastic re-runs, std of embeddings.

        Returns (local_embed [B, A, D], actors_std [B, A]).  Matches
        ``forward_ood`` (``enc_hivt_nusargo_sde_sep2.py:204-314``): zeros
        initial state, no twins, mean embedding through the AL encoder.
        """
        B, A = scene.x.shape[0], scene.x.shape[1]
        Th = self.historical_steps
        rot = scene.rotate_mat()

        mask = graph.aa_masks(scene, self.local_radius)
        edge_vec = graph.aa_edge_vectors(scene)
        x_t = jnp.transpose(scene.x, (0, 2, 1, 3))
        aa_out = self.aa_encoder(
            x_t, x_t, rot, scene.bos_mask, mask, edge_vec, deterministic
        )
        valid = ~scene.padding_mask[:, :, :Th]
        nus_row = jnp.broadcast_to((scene.source == 0)[:, None], (B, A))
        eos = self.ref_time - jnp.argmax(scene.bos_mask.astype(jnp.int32), axis=-1)

        # fold the ensemble axis into the batch: ONE scan evaluates all
        # eval_iter stochastic re-runs (the reference loops them in Python,
        # ``enc_hivt_nusargo_sde_sep2.py:255``); per-step rngs differ per
        # row because the fold happens before the scan splits its streams.
        # ``ood_chunk`` bounds the fold (memory fallback: each chunk is an
        # independent scan over chunk·B rows, unrolled at trace time)
        E = self.eval_iter
        chunk = self.ood_chunk if self.ood_chunk > 0 else E
        if E % chunk != 0:
            raise ValueError(f"ood_chunk {chunk} must divide eval_iter {E}")
        dt = scene.x.dtype if self.dtype is None else self.dtype
        picked_chunks = []
        for _ in range(E // chunk):
            h0 = jnp.zeros((chunk * B, A, self.embed_dim), dt)
            tile = lambda arr: jnp.concatenate([arr] * chunk, axis=0)
            ys, _ = self._run_rnn(
                h0,
                tile(aa_out),
                tile(valid),
                tile(nus_row),
            )                                            # [Th, chunk·B, A, D]
            ys_bn = jnp.transpose(ys, (1, 2, 0, 3))      # [chunk·B, A, Th, D]
            eos_t = jnp.concatenate([eos] * chunk, axis=0)
            picked_chunks.append(
                jnp.take_along_axis(
                    ys_bn, eos_t[:, :, None, None].astype(jnp.int32), axis=2
                )[:, :, 0, :]
            )
        stacked = jnp.concatenate(picked_chunks, axis=0).reshape(
            E, B, A, self.embed_dim
        )
        actors_std = jnp.std(stacked, axis=0).mean(-1)   # [B, A]
        out = stacked.mean(0)

        al_mask, al_vec = graph.al_edges(scene, self.ref_time, self.local_radius)
        lane_feat = graph.lane_features(scene)
        out = self.al_encoder(out, lane_feat, al_vec, al_mask, rot, deterministic)
        return out.astype(jnp.float32), actors_std.astype(jnp.float32)
