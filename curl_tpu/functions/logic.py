"""Comparison / sign logic from the _ltz primitive (reference:
curl/common/functions/logic.py). Installed on MPCTensor."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..mpc.mpc import MPCTensor

__all__ = [
    "abs",
    "eq_fn",
    "ge",
    "gt",
    "hardtanh",
    "le",
    "lt",
    "ne_fn",
    "relu",
    "sign",
    "where",
]


def ge(self, y):
    """self >= y  =  1 - (self < y)"""
    return -(self.lt(y)) + 1


def gt(self, y):
    """self > y  =  ltz(y - self)"""
    return (self.neg() + y)._ltz()


def le(self, y):
    return -(self.gt(y)) + 1


def lt(self, y):
    return (self - y)._ltz()


def eq_fn(self, y):
    return self.eq(y)


def ne_fn(self, y):
    return self.ne(y)


def sign(self):
    """1 for >= 0, -1 for < 0 (logic.py:71)."""
    return -(self._ltz().mul(2)) + 1


def abs(self):
    return self.mul(self.sign())


def relu(self):
    return self.mul(self.ge(0))


def drelu(self):
    return -(self._ltz()) + 1


def hardtanh(self, min_value=-1, max_value=1):
    """Stacked-relu formulation — one comparison round for both clips
    (logic.py:86)."""
    inter = MPCTensor.stack([self - min_value, self - max_value]).relu()
    return inter[0].sub(inter[1]).add(min_value)


def where(self, condition, y):
    if isinstance(condition, MPCTensor):
        y_masked = (-(condition) + 1).mul(y)
        return self.mul(condition).add(y_masked)
    cond = jnp.asarray(condition).astype(jnp.float64)
    if isinstance(y, MPCTensor):
        y_masked = y.mul(1 - cond)
    else:
        y_masked = jnp.asarray(y) * (1 - cond)
    return self.mul(cond).add(y_masked)


for _name, _fn in (
    ("ge", ge),
    ("gt", gt),
    ("le", le),
    ("lt", lt),
    ("sign", sign),
    ("abs", abs),
    ("relu", relu),
    ("drelu", drelu),
    ("hardtanh", hardtanh),
    ("where", where),
):
    setattr(MPCTensor, _name, _fn)
