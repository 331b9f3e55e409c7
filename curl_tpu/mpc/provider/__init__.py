from .provider import TupleProvider  # noqa: F401
from .tfp_provider import TrustedFirstParty  # noqa: F401
from .ttp_provider import TrustedThirdParty  # noqa: F401
from .homomorphic_provider import HomomorphicProvider  # noqa: F401

__SUPPORTED_PROVIDERS = {
    "TFP": TrustedFirstParty,
    "TTP": TrustedThirdParty,
    "HE": HomomorphicProvider,
}


def get_provider(name: str):
    return __SUPPORTED_PROVIDERS[name]()
