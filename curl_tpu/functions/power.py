"""Integer powers, pos_pow, polynomials, norms (reference:
curl/common/functions/power.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mpc.mpc import MPCTensor

__all__ = ["norm", "polynomial", "pos_pow", "pow"]


def pow(self, p):
    """Integer exponent by repeated squaring (power.py:16)."""
    if isinstance(p, float) and int(p) == p:
        p = int(p)
    if not isinstance(p, int):
        raise TypeError(
            "pow must take an integer exponent. For non-integer powers, use "
            "pos_pow with positive-valued base."
        )
    if p < -1:
        return self.reciprocal().pow(-p)
    if p == -1:
        return self.reciprocal()
    if p == 0:
        return MPCTensor.encrypt(jnp.ones(self.shape), src=0)
    if p == 1:
        return self.clone()
    if p == 2:
        return self.square()
    if p % 2 == 0:
        return self.square().pow(p // 2)
    return self.square().mul(self).pow((p - 1) // 2)


def pos_pow(self, p):
    """x^p = exp(p log x) for positive x (power.py:48)."""
    if isinstance(p, int) or (isinstance(p, float) and int(p) == p):
        return self.pow(p)
    return self.log().mul(p).exp()


def polynomial(self, coeffs, func="mul"):
    """Polynomial evaluation with exponential term tree (power.py:63).
    Coefficients start at the linear term."""
    if isinstance(coeffs, list):
        coeffs = jnp.asarray(coeffs, dtype=jnp.float64)
    if coeffs.ndim != 1:
        raise ValueError("coefficients must be 1-D")
    if coeffs.shape[0] == 1:
        return self.mul(coeffs[0])

    terms = MPCTensor.stack([self, self.square()])
    while terms.size(0) < coeffs.shape[0]:
        highest = terms.index_select(0, jnp.array([terms.size(0) - 1]))
        new_terms = getattr(terms, func)(highest)
        terms = MPCTensor.cat([terms, new_terms])

    terms = terms[: coeffs.shape[0]]
    c = coeffs.reshape((-1,) + (1,) * (terms.dim() - 1))
    return terms.mul(c).sum(axis=0)


def norm(self, p="fro", dim=None, keepdim=False):
    """p-norms (power.py:102)."""
    if p == "fro":
        p = 2
    if isinstance(p, (int, float)):
        assert p >= 1, "p-norm requires p >= 1"
        if p == 1:
            out = self.abs()
            return out.sum() if dim is None else out.sum(axis=dim, keepdim=keepdim)
        if p == 2:
            sq = self.square()
            tot = sq.sum() if dim is None else sq.sum(axis=dim, keepdim=keepdim)
            return tot.sqrt()
        if p == float("inf"):
            a = self.abs()
            return a.max() if dim is None else a.max(dim=dim, keepdim=keepdim)[0]
        a = self.abs().pos_pow(p)
        tot = a.sum() if dim is None else a.sum(axis=dim, keepdim=keepdim)
        return tot.pos_pow(1 / p)
    raise ValueError(f"Improper value p ({p}) for p-norm")


for _name, _fn in (
    ("pow", pow),
    ("pos_pow", pos_pow),
    ("polynomial", polynomial),
    ("norm", norm),
):
    setattr(MPCTensor, _name, _fn)
