"""YAML config system with attribute access.

First-party replacement for the reference's yaml + EasyDict combo
(`/root/reference/utils/misc.py:22-24`): same YAML surface, so reference
train/sample configs port 1:1, but with explicit dict semantics (a `Config`
is a plain dict subclass — json/yaml round-trippable, checkpointable).
"""
from __future__ import annotations

import copy
import io
import os
from typing import Any, Mapping, Optional

import yaml


class Config(dict):
    """dict with recursive attribute access: cfg.model.diff.num_timesteps."""

    def __init__(self, data: Optional[Mapping] = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for k, v in data.items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, Config) else v) for k, v in self.items()}

    def merged(self, other: Mapping) -> "Config":
        """Deep-merge ``other`` over self, returning a new Config."""
        out = Config(self)
        for k, v in other.items():
            if k in out and isinstance(out[k], Config) and isinstance(v, Mapping):
                out[k] = out[k].merged(v)
            else:
                out[k] = _wrap(v)
        return out


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def load_config(path: str) -> Config:
    """YAML file -> Config (reference utils/misc.py:22-24)."""
    with open(path, "r") as f:
        return Config(yaml.safe_load(f))


def loads_config(text: str) -> Config:
    return Config(yaml.safe_load(io.StringIO(text)))


def save_config(config: Mapping, path: str) -> None:
    cfg = config.to_dict() if isinstance(config, Config) else dict(config)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
