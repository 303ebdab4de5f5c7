"""Jittable on-device SceneBatch transforms.

* :func:`ts_drop` — random historical-timestep masking regularization
  (``models/model_base_mix.py:96-101``): each historical step is dropped
  with probability ``rate``, except begin-of-sequence steps and the
  reference (last historical) step; dropped steps zero the features and
  join the padding mask.
* :func:`leave_only_agent` — restrict a batch to its focal agents
  (``model_base_mix.py:170-204``): in the dense formulation this is a
  1-actor batch whose single slot is each scene's agent.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from trajsde_tpu.data.scene import SceneBatch


def ts_drop(scene: SceneBatch, rate: float, key: jax.Array) -> SceneBatch:
    Th = scene.historical_steps
    drop = jax.random.uniform(key, scene.bos_mask.shape) < rate
    drop = drop & ~scene.bos_mask
    drop = drop.at[:, :, -1].set(False)
    x = jnp.where(drop[..., None], 0.0, scene.x)
    padding = scene.padding_mask.at[:, :, :Th].set(
        scene.padding_mask[:, :, :Th] | drop
    )
    return dataclasses.replace(scene, x=x, padding_mask=padding)


def take_per_scene(arr, idx, axis=1):
    """Gather one index per scene along ``axis`` (keeps a size-1 axis).

    The shared per-scene gather used by the only-agent filters here and
    by ``test.py``'s stds filtering; ``train/loop.py::gather_agent`` is
    the squeezing variant of the same broadcast ``take_along_axis``.
    """
    if arr is None:
        return None
    shape = [1] * arr.ndim
    shape[0] = arr.shape[0]
    bidx = idx.reshape(shape).astype(jnp.int32)
    bidx = jnp.broadcast_to(bidx, arr.shape[:axis] + (1,) + arr.shape[axis + 1 :])
    return jnp.take_along_axis(arr, bidx, axis=axis)


def leave_only_agent_output(output: dict, agent_index: jax.Array) -> dict:
    """Filter a decoder output dict to the focal-agent rows (size-1 actor
    axis), the output half of ``leave_only_agent``
    (``model_base_mix.py:188-195``)."""
    out = dict(output)
    out["loc"] = _take(output["loc"], agent_index, axis=2)
    out["reg_mask"] = _take(output["reg_mask"], agent_index, axis=1)
    if output.get("pi") is not None:
        out["pi"] = _take(output["pi"], agent_index, axis=1)
    if output.get("y") is not None:
        out["y"] = _take(output["y"], agent_index, axis=1)
    return out


def leave_only_agent(scene: SceneBatch) -> SceneBatch:
    idx = scene.agent_index
    zeros = jnp.zeros_like(scene.agent_index)
    return dataclasses.replace(
        scene,
        x=_take(scene.x, idx),
        y=_take(scene.y, idx),
        positions=_take(scene.positions, idx),
        padding_mask=_take(scene.padding_mask, idx),
        bos_mask=_take(scene.bos_mask, idx),
        rotate_angles=_take(scene.rotate_angles, idx),
        actor_valid=_take(scene.actor_valid, idx),
        goal_idcs=_take(scene.goal_idcs, idx),
        has_goal=_take(scene.has_goal, idx),
        agent_index=zeros,
        av_index=zeros,
    )


# backwards-compatible private alias
_take = take_per_scene
