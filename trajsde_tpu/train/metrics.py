"""Transfer-aware evaluation metrics (reference: ``metrics/ade_t.py``,
``fde_t.py``, ``mr_t.py``) as pure (sum, count) accumulators.

Each ``*_update`` is jittable and returns a contribution ``(sum, count)``;
under data parallelism the pair is ``psum``-reduced over the mesh (the
torchmetrics ``dist_reduce_fx='sum'`` analog, ``metrics/ade_t.py:33-34``).

Inputs are focal-agent slices:
  pred     [B, K, Tf, 2]   target [B, Tf, 2]
  reg_mask [B, Tf] bool    source [B] int (0 = nuScenes, 1 = Argoverse)

Per-source horizons: ``end_idcs[source[b]]`` maps each scene to its
evaluation end index on the shared grid (59 for 6 s nuScenes, 29 for 3 s
Argoverse — ``configs/...sdedec.yml:88-96``).  Deviation from the
reference noted for the record: the reference builds per-row end indices
with ``repeat_interleave`` over source *counts*, which silently assumes
the batch is sorted by source (``metrics/fde_t.py:47-50``); here the end
index is selected per row by ``source``, which is order-independent and
agrees with the reference whenever its assumption holds.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _end_idx(source: jax.Array, end_idcs: Sequence[int]) -> jax.Array:
    table = jnp.asarray(end_idcs, dtype=jnp.int32)
    return table[source]


def _l2(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.linalg.norm(pred - target[:, None], axis=-1)  # [B, K, Tf]


def ade_t_update(
    pred, target, reg_mask, source, *, dataset: str, end_idcs: Sequence[int]
) -> Tuple[jax.Array, jax.Array]:
    """minADE with the per-dataset best-mode rule (``metrics/ade_t.py:44-66``):
    nuScenes eval → best mode by min ADE; Argoverse eval → best mode by min
    FDE at the per-source end index.

    Deliberate parity note: the FDE selection indexes the MASK-ZEROED l2
    (a row invalid at its end step ties argmin to mode 0 yet still counts)
    because the reference does exactly that — ``l2[:, ~reg_mask] = 0``
    precedes its end-index gather (``metrics/ade_t.py:47-60``)."""
    l2 = _l2(pred, target) * reg_mask[:, None]
    valid = jnp.any(reg_mask, axis=-1)                          # [B]
    steps = jnp.maximum(jnp.sum(reg_mask, axis=-1), 1)[:, None]
    ade = jnp.sum(l2, axis=-1) / steps                          # [B, K]
    if dataset == "nuScenes":
        best = jnp.argmin(ade, axis=-1)
    elif dataset == "Argoverse":
        e = _end_idx(source, end_idcs)[:, None, None]
        fde = jnp.take_along_axis(l2, e, axis=-1)[..., 0]       # [B, K]
        best = jnp.argmin(fde, axis=-1)
    else:
        raise NotImplementedError(dataset)
    ade_best = jnp.take_along_axis(ade, best[:, None], axis=-1)[:, 0]
    return jnp.sum(ade_best * valid), jnp.sum(valid)


def fde_t_update(
    pred, target, reg_mask, source, *, dataset: str, end_idcs: Sequence[int]
) -> Tuple[jax.Array, jax.Array]:
    """minFDE at the per-source end index (``metrics/fde_t.py:40-57``)."""
    e = _end_idx(source, end_idcs)
    pred_e = jnp.take_along_axis(pred, e[:, None, None, None], axis=2)[:, :, 0]  # [B, K, 2]
    targ_e = jnp.take_along_axis(target, e[:, None, None], axis=1)[:, 0]         # [B, 2]
    l2 = jnp.linalg.norm(pred_e - targ_e[:, None], axis=-1)                       # [B, K]
    valid = jnp.take_along_axis(reg_mask, e[:, None], axis=1)[:, 0]
    fde_best = jnp.min(l2, axis=-1)
    return jnp.sum(fde_best * valid), jnp.sum(valid)


def mr_t_update(
    pred,
    target,
    reg_mask,
    source,
    *,
    dataset: str,
    end_idcs: Sequence[int],
    miss_threshold: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Miss rate @ threshold (``metrics/mr_t.py:44-67``): nuScenes eval uses
    the max-over-valid-steps L2 minimized over modes; Argoverse eval uses the
    best FDE at the end index."""
    if dataset == "nuScenes":
        l2 = _l2(pred, target) * reg_mask[:, None]
        valid = jnp.any(reg_mask, axis=-1)
        maxmin = jnp.min(jnp.max(l2, axis=-1), axis=-1)         # [B]
        missed = maxmin > miss_threshold
    elif dataset == "Argoverse":
        e = _end_idx(source, end_idcs)
        pred_e = jnp.take_along_axis(pred, e[:, None, None, None], axis=2)[:, :, 0]
        targ_e = jnp.take_along_axis(target, e[:, None, None], axis=1)[:, 0]
        l2 = jnp.linalg.norm(pred_e - targ_e[:, None], axis=-1)
        valid = jnp.take_along_axis(reg_mask, e[:, None], axis=1)[:, 0]
        missed = jnp.min(l2, axis=-1) > miss_threshold
    else:
        raise NotImplementedError(dataset)
    return jnp.sum(missed * valid), jnp.sum(valid)


_UPDATE_FNS = {
    "ADE_T": ade_t_update,
    "FDE_T": fde_t_update,
    "MR_T": mr_t_update,
}


class TransferMetric:
    """Host-side (sum, count) accumulator around a jittable update fn.

    Mirrors the torchmetrics API surface used by the reference model bases
    (``update(pred, target, reg_mask, source)`` / ``compute()`` / ``reset()``)
    — with the epoch-boundary reset the reference forgot (SURVEY §2.2 warts).

    ``source_filter`` restricts the accumulation to one domain (0 =
    nuScenes, 1 = Argoverse) for per-source transfer breakdowns — a
    capability the reference's aggregate-only metrics lack.
    """

    def __init__(
        self,
        name: str,
        dataset: str,
        end_idcs: Sequence[int],
        source_filter: int = None,
        **kwargs,
    ):
        extra = {}
        if name == "MR_T" and "miss_threshold" in kwargs:
            extra["miss_threshold"] = kwargs["miss_threshold"]
        base = partial(
            _UPDATE_FNS[name], dataset=dataset, end_idcs=tuple(end_idcs), **extra
        )
        self.name = name if source_filter is None else f"{name}_src{source_filter}"
        if source_filter is None:
            self.update_fn = base
        else:
            def filtered(pred, target, reg_mask, source, _base=base, _sf=source_filter):
                keep = source == _sf
                return _base(pred, target, reg_mask & keep[:, None], source)

            self.update_fn = filtered
        self.reset()

    def reset(self) -> None:
        self._sum = 0.0
        self._count = 0.0

    def accumulate(self, contribution: Tuple[jax.Array, jax.Array]) -> None:
        # accumulate WITHOUT pulling values to the host: adding device
        # arrays keeps the (sum, count) pair on device across the whole
        # epoch so eval never serializes on a per-batch transfer; the only
        # host sync is the final ``compute()``
        s, c = contribution
        self._sum = self._sum + s
        self._count = self._count + c

    def update(self, pred, target, reg_mask, source) -> None:
        self.accumulate(self.update_fn(pred, target, reg_mask, source))

    def compute(self) -> float:
        # an empty accumulator (e.g. a per-source variant on a split with
        # no scenes from that domain) is NaN, not a perfect-looking 0.0
        if float(self._count) == 0.0:
            return float("nan")
        return float(self._sum) / float(self._count)


def make_metrics(names, metric_args) -> list:
    """Build metric accumulators; ``per_source: true`` in an args dict adds
    per-domain variants (``<name>_src0`` / ``<name>_src1``) alongside the
    aggregate."""
    metrics = []
    for name, args in zip(names, metric_args):
        kwargs = {k: v for k, v in args.items() if k not in ("sources", "per_source")}
        metrics.append(TransferMetric(name, **kwargs))
        if args.get("per_source"):
            for sf in args.get("sources", [0, 1]):
                metrics.append(TransferMetric(name, source_filter=sf, **kwargs))
    return metrics
