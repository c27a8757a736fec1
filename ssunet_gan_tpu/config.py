"""Experiment configuration system.

Re-implements the reference's two-tier config contract
(/root/reference/scripts/train.py:195-240, configs/config_v1.json):

1. A 3-section JSON experiment file: ``file_path`` (directory layout),
   ``opt_config`` (training hyper-parameters), ``val_config`` (whole-scene
   eval settings).
2. A per-model ``config.yml`` "model card" persisted next to the weights,
   which every downstream tool (GAN trainer, val CLIs, inference API)
   uses to reconstruct the model (train.py:239-240, api:309-324).

The reference coerces boolean config values with a fragile substring test
(``'False' in value`` — train.py:210-221).  We preserve the observable
behaviour (the strings "True"/"False" work; "None" maps to None) through
:func:`coerce_string_bool`, but accept real booleans too.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import yaml

# Keys the reference coerces from string to bool (train.py:210-221, 256-259),
# plus this framework's extensions (mixed precision, per-block remat, the
# Pallas fused-SPADE kernel override — absent means auto: fused on TPU).
_STRING_BOOL_KEYS = ("deep_supervision", "nesterov", "resume",
                     "mixed_precision", "remat", "fused_spade")


def coerce_string_bool(value: Any) -> Any:
    """Reference-compatible string→bool coercion (train.py:210-218).

    The reference tests ``'False' in value`` so any string *containing*
    "False" is falsy and every other string is truthy; real bools pass
    through unchanged.
    """
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        return "False" not in value
    return bool(value)


def _coerce_opt_config(opt: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(opt)
    for key in _STRING_BOOL_KEYS:
        if key in out:
            out[key] = coerce_string_bool(out[key])
    # 'None' name → auto-generated (train.py:220-225)
    if isinstance(out.get("name"), str) and "None" in out["name"]:
        out["name"] = None
    if out.get("name") is None and "dataset" in out and "arch" in out:
        out["name"] = "%s_%s_segmodel" % (out["dataset"], out["arch"])
    return out


@dataclasses.dataclass
class FilePaths:
    """``file_path`` section (configs/config_v1.json:2-7)."""

    input_path: str = "../inputs"
    model_path: str = "../models"
    output_path: str = "../outputs"
    checkpoint_path: str = "../checkpoint"

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "FilePaths":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclasses.dataclass
class ExperimentConfig:
    """Parsed 3-section experiment configuration."""

    file_path: FilePaths
    opt_config: Dict[str, Any]
    val_config: Dict[str, Any]
    source: Optional[str] = None

    @property
    def name(self) -> str:
        return self.opt_config["name"]

    def model_dir(self, name: Optional[str] = None) -> str:
        return os.path.join(self.file_path.model_path, name or self.name)


def load_experiment_config(path: str) -> ExperimentConfig:
    """Load and coerce a 3-section JSON experiment file (train.py:199-221)."""
    with open(path, "rt") as f:
        config_dict = json.loads(f.read())
    return ExperimentConfig(
        file_path=FilePaths.from_dict(config_dict.get("file_path", {})),
        opt_config=_coerce_opt_config(config_dict.get("opt_config", {})),
        val_config=dict(config_dict.get("val_config", {})),
        source=path,
    )


def dump_model_card(opt_config: Dict[str, Any], model_dir: str) -> str:
    """Persist the per-model ``config.yml`` card (train.py:239-240)."""
    os.makedirs(model_dir, exist_ok=True)
    card_path = os.path.join(model_dir, "config.yml")
    with open(card_path, "w") as f:
        yaml.dump(opt_config, f)
    return card_path


def load_model_card(model_dir: str) -> Dict[str, Any]:
    """Load a model's ``config.yml`` card (api:309-311)."""
    with open(os.path.join(model_dir, "config.yml"), "r") as f:
        return yaml.load(f, Loader=yaml.FullLoader)
