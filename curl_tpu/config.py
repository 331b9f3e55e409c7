"""Config system: YAML-backed dot-notation singleton with temp_override.

TPU-native rebuild of the reference's OmegaConf wrapper
(reference: curl/config/config.py:15-99). Same surface: a module-level ``cfg``
singleton, attribute/dot-path access, ``cfg.temp_override({...})`` context
manager, and YAML profiles shipped in ``curl_tpu/configs/``.

One TPU-specific addition: ``cfg.snapshot()`` returns a hashable frozen view,
because under ``jax.jit`` every config read is baked into the trace — code
that must react to config changes should be re-traced, and the snapshot is
the natural static argument for that.
"""

from __future__ import annotations

import contextlib
import copy
import os
from typing import Any, Dict

import yaml

_DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "configs", "default.yaml")


class _Node:
    """Attribute-accessible nested dict."""

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", {})
        for k, v in data.items():
            self._data[k] = _Node(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        try:
            return object.__getattribute__(self, "_data")[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self._data[name] = _Node(value) if isinstance(value, dict) else value

    def __contains__(self, name):
        return name in self._data

    def to_dict(self):
        return {
            k: v.to_dict() if isinstance(v, _Node) else v for k, v in self._data.items()
        }


def _freeze(obj):
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


class CurlConfig:
    """Configuration singleton; loads YAML and exposes dot access."""

    __DEFAULT_CONFIG_PATH = _DEFAULT_CONFIG

    def __init__(self, config_file=None):
        self.load_config(config_file)

    def load_config(self, config_file):
        if config_file is None:
            config_file = CurlConfig.__DEFAULT_CONFIG_PATH
        with open(config_file) as f:
            data = yaml.safe_load(f)
        self.config = _Node(data)

    def set_config(self, config):
        if isinstance(config, CurlConfig):
            self.config = config.config
        else:
            self.config = config

    def __getattribute__(self, name):
        try:
            return object.__getattribute__(self, name)
        except AttributeError:
            return getattr(object.__getattribute__(self, "config"), name)

    def __getitem__(self, name):
        return self.get(name)

    def __setitem__(self, name, value):
        self.set(name, value)

    def get(self, keys: str):
        node = self.config
        for k in keys.split("."):
            node = getattr(node, k)
        return node

    def set(self, keys: str, value):
        parts = keys.split(".")
        node = self.config
        for k in parts[:-1]:
            if k not in node:
                setattr(node, k, {})
            node = getattr(node, k)
        setattr(node, parts[-1], value)

    @contextlib.contextmanager
    def temp_override(self, override_dict: Dict[str, Any]):
        """Temporarily override dot-path keys (reference config.py:93)."""
        old = copy.deepcopy(self.config)
        try:
            for k, v in override_dict.items():
                self.set(k, v)
            yield
        finally:
            self.set_config(old)

    def snapshot(self):
        """Hashable frozen view of the full config (for jit static args)."""
        return _freeze(self.config.to_dict())

    def to_dict(self):
        return self.config.to_dict()


cfg = CurlConfig()
