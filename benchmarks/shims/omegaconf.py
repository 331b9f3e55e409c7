"""Minimal OmegaConf stand-in so the reference framework can run unmodified
for baseline measurement (the real omegaconf is not in this environment).
Implements only the surface the reference's config.py touches:
OmegaConf.create / from_dotlist / merge with attribute-style nested access;
missing keys resolve to None (non-struct semantics).
"""

import copy


class DictConfig:
    def __init__(self, data=None):
        object.__setattr__(self, "_data", {})
        for k, v in (data or {}).items():
            self._data[k] = DictConfig(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return object.__getattribute__(self, "_data").get(name)

    def __setattr__(self, name, value):
        self._data[name] = DictConfig(value) if isinstance(value, dict) else value

    def __getitem__(self, name):
        return getattr(self, name)

    def __setitem__(self, name, value):
        setattr(self, name, value)

    def __contains__(self, name):
        return name in self._data

    def __deepcopy__(self, memo):
        out = DictConfig()
        object.__setattr__(out, "_data", copy.deepcopy(self._data, memo))
        return out

    def to_dict(self):
        return {
            k: v.to_dict() if isinstance(v, DictConfig) else v
            for k, v in self._data.items()
        }


def _parse_value(v):
    for cast in (int, float):
        try:
            return cast(v)
        except (TypeError, ValueError):
            pass
    if isinstance(v, str):
        low = v.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("null", "none"):
            return None
    return v


class OmegaConf:
    @staticmethod
    def create(data=None):
        return DictConfig(data or {})

    @staticmethod
    def from_dotlist(dotlist):
        root = DictConfig()
        for item in dotlist:
            key, _, value = item.partition("=")
            node = root
            parts = key.split(".")
            for p in parts[:-1]:
                if not isinstance(getattr(node, p), DictConfig):
                    setattr(node, p, {})
                node = getattr(node, p)
            setattr(node, parts[-1], _parse_value(value))
        return root

    @staticmethod
    def merge(base, update):
        out = copy.deepcopy(base)

        def rec(dst, src):
            for k, v in src._data.items():
                if isinstance(v, DictConfig) and isinstance(dst._data.get(k), DictConfig):
                    rec(dst._data[k], v)
                else:
                    dst._data[k] = copy.deepcopy(v)

        rec(out, update)
        return out
