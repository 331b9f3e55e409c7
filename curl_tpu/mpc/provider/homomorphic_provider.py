"""Homomorphic-encryption provider placeholder (reference:
curl/mpc/provider/homomorphic_provider.py:11 — also unimplemented there)."""

from .provider import TupleProvider


class HomomorphicProvider(TupleProvider):
    NAME = "HE"

    def generate_additive_triple(self, size0, size1, op, **kwargs):
        raise NotImplementedError("HE provider not implemented")

    def square(self, size):
        raise NotImplementedError("HE provider not implemented")

    def generate_binary_triple(self, size0, size1):
        raise NotImplementedError("HE provider not implemented")

    def wrap_rng(self, size):
        raise NotImplementedError("HE provider not implemented")

    def B2A_rng(self, size):
        raise NotImplementedError("HE provider not implemented")

    def generate_one_hot(self, tensor_size, lut_size):
        raise NotImplementedError("HE provider not implemented")

    def egk_trunc_pr_rng(self, size, l, m):
        raise NotImplementedError("HE provider not implemented")
