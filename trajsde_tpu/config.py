"""YAML experiment configuration (reference schema preserved).

The reference's entire flag system is two YAML files with anchors
(``configs/nusargo/*.yml``, SURVEY §2.1).  The same section layout is kept
— ``training_specific``, ``model_specific``, ``encoder``, ``aggregator``,
``decoder``, ``losses*``, ``metrics*``, ``datamodule_specific`` — so a
reference config drops in unchanged; ``file_path`` keys are ignored in
favor of ``module_name`` registry lookups.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import yaml

from trajsde_tpu import registry


@dataclasses.dataclass
class ExperimentConfig:
    raw: Dict[str, Any]

    @property
    def training(self) -> Dict[str, Any]:
        return self.raw.get("training_specific", {})

    @property
    def model_kwargs(self) -> Dict[str, Any]:
        return self.raw.get("model_specific", {}).get("kwargs", {})

    @property
    def model_name(self) -> str:
        return self.raw["model_specific"]["module_name"]

    def component(self, section: str):
        sec = self.raw[section]
        return sec["module_name"], dict(sec.get("kwargs", {}))

    @property
    def loss_specs(self) -> List[tuple]:
        names = self.raw.get("losses_module", [])
        weights = self.raw.get("loss_weights", [1.0] * len(names))
        args = self.raw.get("loss_args", [{}] * len(names))
        if len(weights) != len(names) or len(args) != len(names):
            # zip() would silently DROP the unmatched tail — a loss listed
            # in losses_module but missing a weight would never train
            raise ValueError(
                f"losses_module has {len(names)} entries but loss_weights "
                f"has {len(weights)} / loss_args has {len(args)} — the "
                "lists must align one-to-one"
            )
        return list(zip(names, weights, args))

    @property
    def metric_specs(self) -> List[tuple]:
        names = self.raw.get("metrics_module", [])
        args = self.raw.get("metric_args", [{}] * len(names))
        if len(args) != len(names):
            raise ValueError(
                f"metrics_module has {len(names)} entries but metric_args "
                f"has {len(args)} — the lists must align one-to-one"
            )
        return list(zip(names, args))

    @property
    def datamodule(self) -> Dict[str, Any]:
        return self.raw.get("datamodule_specific", {}).get("kwargs", {})


def load_config(path: str) -> ExperimentConfig:
    with open(path) as f:
        return ExperimentConfig(yaml.safe_load(f))


def build_model(cfg: ExperimentConfig):
    """Instantiate the composed prediction model from a config.

    Mirrors ``PredictionModel.__init__``'s dynamic component loading
    (``models/model_base_mix.py:38-45``) through the registry.
    """
    enc_name, enc_kwargs = cfg.component("encoder")
    agg_name, agg_kwargs = cfg.component("aggregator")
    dec_name, dec_kwargs = cfg.component("decoder")
    encoder = registry.build(enc_name, enc_kwargs)
    aggregator = registry.build(agg_name, agg_kwargs)
    decoder = registry.build(dec_name, dec_kwargs)
    model_ctor = registry.resolve(cfg.model_name)
    return model_ctor(
        encoder=encoder,
        aggregator=aggregator,
        decoder=decoder,
        rotate=cfg.model_kwargs.get("rotate", True),
        # the remaining model_specific kwargs are consumed elsewhere:
        # historical_steps/future_steps/num_modes via YAML anchors in the
        # component kwargs, is_gtabs by the datamodule/test args, ref_time
        # by test.py/serve.py, only_agent by test.py (reference
        # model_base_mix.py:133-137), and `parallel` is n/a (this design
        # is always dense time-parallel)
    )


def build_losses(cfg: ExperimentConfig) -> List[tuple]:
    """[(name, weight, callable)] — loss plugins per ``losses*`` sections."""
    out = []
    for name, weight, args in cfg.loss_specs:
        fn = registry.build(name, dict(args))
        out.append((name, float(weight), fn))
    return out
