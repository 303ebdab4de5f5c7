"""Model composition: encoder → aggregator → decoder (+ target rotation).

Reference: ``models/model_base_mix.py:75-93`` / ``model_base_mix_sde.py:74-102``.
The Lightning-specific orchestration (logging, optimizers, metric plumbing)
lives in ``trajsde_tpu/train``; this module is the pure forward function.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from flax import linen as nn

from trajsde_tpu.data.scene import SceneBatch, rotate_into


class PredictionModel(nn.Module):
    """Baseline composition (registry name ``PredictionModel``).

    ``__call__(scene)`` returns the decoder output dict plus ``y`` — the
    future targets rotated into per-agent frames (the reference mutates
    ``data.y`` in place before encoding, ``model_base_mix.py:84-85``; losses
    and metrics consume the rotated targets).
    """

    encoder: nn.Module
    aggregator: nn.Module
    decoder: nn.Module
    rotate: bool = True
    # optional device mesh: when set, the per-mode activations
    # ([B, F, A, D] and the decoder rollout state) are sharded over the
    # mesh's 'model' axis in addition to batch-over-'data' (the modes axis
    # is this architecture's natural tensor-parallel dimension)
    mesh: Optional[Any] = None

    def _constrain(self, global_embed: jax.Array) -> jax.Array:
        if self.mesh is None:
            return global_embed
        from trajsde_tpu.parallel.mesh import constrain_modes

        return constrain_modes(global_embed, self.mesh)

    def _rotated_y(self, scene: SceneBatch) -> Optional[jax.Array]:
        if scene.y is None:
            return None
        if not self.rotate:
            return scene.y
        rot = scene.rotate_mat()
        return rotate_into(scene.y, rot[:, :, None])

    def __call__(
        self, scene: SceneBatch, deterministic: bool = True
    ) -> Dict[str, Any]:
        local_embed = self.encoder(scene, deterministic)
        global_embed = self._constrain(
            self.aggregator(scene, local_embed, deterministic)
        )
        out = self.decoder(scene, local_embed, global_embed, deterministic)
        out["y"] = self._rotated_y(scene)
        return out


class PredictionModelSDENet(PredictionModel):
    """SDE composition (registry name ``PredictionModelSDENet``).

    The encoder additionally emits the diffusion-magnitude discrimination
    tensors (``model_base_mix_sde.py:92-100``); ``ood=True`` routes through
    ``encoder.forward_ood`` and attaches per-actor stds (``:89-98``).
    """

    def __call__(
        self, scene: SceneBatch, deterministic: bool = True, ood: bool = False
    ) -> Dict[str, Any]:
        if ood:
            local_embed, stds = self.encoder.forward_ood(scene, deterministic)
        else:
            local_embed, diff_in, diff_out, label_in, label_out = self.encoder(
                scene, deterministic
            )
        global_embed = self._constrain(
            self.aggregator(scene, local_embed, deterministic)
        )
        out = self.decoder(scene, local_embed, global_embed, deterministic)
        out["y"] = self._rotated_y(scene)
        if ood:
            out["stds"] = stds
        else:
            out["diff_in"], out["diff_out"] = diff_in, diff_out
            out["label_in"], out["label_out"] = label_in, label_out
        return out
