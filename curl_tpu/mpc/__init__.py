from ..config import cfg
from .provider import get_provider
from .ptype import ptype  # noqa: F401

_default_provider = None
_default_provider_name = None


def get_default_provider():
    """Provider singleton selected by cfg.mpc.provider (reference:
    curl/mpc/__init__.py:29-33)."""
    global _default_provider, _default_provider_name
    name = cfg.mpc.provider
    if _default_provider is None or _default_provider_name != name:
        _default_provider = get_provider(name)
        _default_provider_name = name
    return _default_provider


def set_default_provider(name: str):
    cfg.set("mpc.provider", name)
    get_default_provider()


from .mpc import MPCTensor  # noqa: E402,F401
from .context import run_multiprocess  # noqa: E402,F401


def ttp_required():
    """True when the configured provider needs the TTP dealer streams
    (reference curl/mpc/__init__.py ttp_required)."""
    return cfg.mpc.provider == "TTP"
