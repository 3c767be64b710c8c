"""Config system: YAML composition compatible with the reference schema.

The reference composes five YAML files (prior/prob/codec/optimizer/data) into
one merged ``config.yaml`` at training time and consumes exactly that merged
file at inference (reference: train.py:42-65, synthesize.py:82-84).  We keep
the same on-disk schema so reference-trained configs load unchanged, but we
do not depend on OmegaConf: a small attribute-dict wrapper over PyYAML covers
every access pattern the model code needs (``cfg['a']['b']`` and ``cfg.a.b``).
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Iterator, Mapping, Optional

import yaml


class ConfigDict(dict):
    """A dict with attribute access and recursive wrapping.

    Supports both ``cfg['key']`` and ``cfg.key`` like OmegaConf's DictConfig.
    Values set to dicts are wrapped lazily on access.
    """

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as exc:
            raise AttributeError(name) from exc

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __getitem__(self, key: str) -> Any:
        value = dict.__getitem__(self, key)
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            value = ConfigDict(value)
            dict.__setitem__(self, key, value)
        return value

    def get(self, key: str, default: Any = None) -> Any:
        if key in self:
            return self[key]
        return default

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key in self:
            value = self[key]
            if isinstance(value, ConfigDict):
                out[key] = value.to_dict()
            else:
                out[key] = copy.deepcopy(value)
        return out


def _deep_merge(base: Dict[str, Any], override: Mapping[str, Any]) -> Dict[str, Any]:
    for key, value in override.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, Mapping):
            _deep_merge(base[key], value)
        else:
            base[key] = copy.deepcopy(value)
    return base


def load_yaml(path: str) -> ConfigDict:
    with open(path, "r", encoding="utf-8") as fin:
        data = yaml.safe_load(fin)
    if data is None:
        data = {}
    if not isinstance(data, dict):
        raise ValueError(f"Top-level YAML value in {path} must be a mapping")
    return ConfigDict(data)


def save_yaml(cfg: Mapping[str, Any], path: str) -> None:
    data = cfg.to_dict() if isinstance(cfg, ConfigDict) else dict(cfg)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fout:
        yaml.safe_dump(data, fout, sort_keys=False)


def compose_training_config(
    prior_path: str,
    prob_path: str,
    codec_path: str,
    optimizer_path: str,
    data_path: str,
    overrides: Optional[Mapping[str, Any]] = None,
) -> ConfigDict:
    """Compose the five config files into the merged training/inference config.

    Mirrors the composition in the reference's train.py:42-64: the merged
    config has top-level keys ``prior_generator``, ``prob_generator``,
    ``codec_cfg``, ``optimizer_cfg``, ``dataset_cfg``.
    """
    cfg = ConfigDict(
        {
            "prior_generator": load_yaml(prior_path),
            "prob_generator": load_yaml(prob_path),
            "codec_cfg": load_yaml(codec_path),
            "optimizer_cfg": load_yaml(optimizer_path),
            "dataset_cfg": load_yaml(data_path),
        }
    )
    if overrides:
        _deep_merge(cfg, overrides)
    return cfg


def load_config(path: str) -> ConfigDict:
    """Load a merged config.yaml (the file consumed by synthesize)."""
    return load_yaml(path)


def default_config_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs")


def load_default_config() -> ConfigDict:
    """Compose the in-repo default configs (mirrors reference defaults)."""
    d = default_config_dir()
    return compose_training_config(
        prior_path=os.path.join(d, "prior.yaml"),
        prob_path=os.path.join(d, "prob.yaml"),
        codec_path=os.path.join(d, "codec.yaml"),
        optimizer_path=os.path.join(d, "optimizer.yaml"),
        data_path=os.path.join(d, "data.yaml"),
    )


def iter_flat(cfg: Mapping[str, Any], prefix: str = "") -> Iterator[tuple]:
    for key, value in cfg.items():
        path = f"{prefix}.{key}" if prefix else str(key)
        if isinstance(value, Mapping):
            yield from iter_flat(value, path)
        else:
            yield path, value
