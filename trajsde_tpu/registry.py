"""Component registry — the plugin system.

The reference wires components together by loading Python files from
string paths in YAML (``SourceFileLoader``, ``train.py:49``,
``models/model_base_mix.py:39-41``) — fragile enough that a typo'd path in
the shipped config is silently tolerated (``configs/...sdedec.yml:109``,
SURVEY §5).  Here the same YAML schema resolves through an explicit
name → constructor registry; reference ``file_path`` entries are accepted
and reduced to their ``module_name``.
"""
from __future__ import annotations

import inspect
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}

# reference module names → native names (config compatibility)
ALIASES = {
    "LocalEncoderSDESepPara2": "LocalEncoderSDESep",
    "LaplaceNLL": "LaplaceNLLLoss",
}


def resolve(name: str) -> Callable:
    name = ALIASES.get(name, name)
    if name not in _REGISTRY:
        _populate()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown component {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def build(name: str, kwargs: Dict[str, Any]):
    """Instantiate a component, dropping kwargs its constructor rejects.

    The reference passes every YAML kwarg through ``setattr`` loops, so its
    configs carry keys individual modules ignore; filtering preserves that
    tolerance without the attribute soup.
    """
    ctor = resolve(name)
    if isinstance(kwargs.get("dtype"), str):
        import jax.numpy as jnp

        kwargs = dict(kwargs, dtype=jnp.dtype(kwargs["dtype"]))
    sig = inspect.signature(ctor)
    accepts_var = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )
    if not accepts_var:
        kwargs = {k: v for k, v in kwargs.items() if k in sig.parameters}
    return ctor(**kwargs)


def _populate() -> None:
    """Late import to avoid cycles; registers all built-in components."""
    from trajsde_tpu.models.local_encoder import LocalEncoder
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import MLPDecoder, SDEDecoder
    from trajsde_tpu.models.prediction import PredictionModel, PredictionModelSDENet
    from trajsde_tpu.losses import LOSS_REGISTRY

    for cls in (
        LocalEncoder,
        LocalEncoderSDESep,
        GlobalInteractor,
        MLPDecoder,
        SDEDecoder,
        PredictionModel,
        PredictionModelSDENet,
    ):
        _REGISTRY.setdefault(cls.__name__, cls)
    for name, fn in LOSS_REGISTRY.items():
        _REGISTRY.setdefault(name, lambda _fn=fn, **kw: _fn)
