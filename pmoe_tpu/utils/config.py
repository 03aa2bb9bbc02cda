"""YAML configuration system.

Keeps the reference's config surface (one YAML per stage whose keys are passed
wholesale into constructors — see /root/reference/PMoE/utils/utility.py:9-17 and
conf/*.yaml) without depending on OmegaConf: a light ``Config`` node offers both
attribute and mapping access, deep merging, and ``**kwargs`` splatting.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Iterator, Mapping

import yaml

__all__ = ["Config", "get_conf", "to_dict"]


class Config(Mapping):
    """A nested dict with attribute access, usable as ``**kwargs``.

    Missing attribute access returns ``None`` (OmegaConf-select-like leniency is NOT
    provided; missing keys raise ``AttributeError`` so config typos fail loudly).
    """

    __slots__ = ("_data",)

    def __init__(self, data: dict | None = None):
        object.__setattr__(self, "_data", {})
        if data:
            for k, v in data.items():
                self._data[k] = _wrap(v)

    # -- mapping protocol ---------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def values(self):
        return self._data.values()

    def get(self, key: str, default: Any = None) -> Any:
        return self._data.get(key, default)

    # -- attribute protocol ---------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        try:
            return self._data[key]
        except KeyError as e:
            raise AttributeError(f"Config has no key {key!r}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _wrap(value)

    def __contains__(self, key: object) -> bool:
        return key in self._data

    def __repr__(self) -> str:
        return f"Config({self._data!r})"

    def __deepcopy__(self, memo):
        return Config(copy.deepcopy(to_dict(self), memo))

    # -- utilities ------------------------------------------------------------
    def merge(self, other: "Config | dict") -> "Config":
        """Deep merge ``other`` on top of ``self`` and return a new Config."""
        out = to_dict(self)
        _deep_update(out, to_dict(other))
        return Config(out)

    def copy(self) -> "Config":
        return Config(to_dict(self))


def _wrap(value: Any) -> Any:
    if isinstance(value, Config):
        return value
    if isinstance(value, dict):
        return Config(value)
    if isinstance(value, (list, tuple)):
        return [_wrap(v) for v in value]
    return value


def to_dict(cfg: Any) -> Any:
    """Recursively convert a Config tree back to plain Python containers."""
    if isinstance(cfg, Config):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def _deep_update(base: dict, upd: dict) -> dict:
    for k, v in upd.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def get_conf(name: str | Path) -> Config:
    """Load a YAML config. Mirrors the reference's ``get_conf`` which appends
    ``.yaml`` to the given stem (reference utils/utility.py:9-17)."""
    path = Path(str(name) if str(name).endswith((".yaml", ".yml")) else str(name) + ".yaml")
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return Config(data or {})
