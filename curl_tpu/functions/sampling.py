"""Private sampling: randn (Box-Muller over MPC), bernoulli, weighted index
(reference: curl/common/functions/sampling.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import cfg
from ..mpc.mpc import MPCTensor

__all__ = ["bernoulli", "randn", "weighted_index", "weighted_sample"]


def randn(cls, *sizes):
    """Normal samples via Box-Muller on private uniforms (sampling.py:20)."""
    u = cls.rand(*sizes).flatten()
    numel = int(np.prod(sizes))
    odd = numel % 2 == 1
    if odd:
        u = cls.cat([u, cls.rand(1)])
        numel += 1
    n = numel // 2
    u1 = u[:n]
    u2 = u[n:]

    r2 = u1.log(input_in_01=True).mul(-2)
    r = r2.sqrt()
    cos, sin = u2.sub(0.5).mul(6.28318531).cossin()
    x = r.mul(sin)
    y = r.mul(cos)
    z = cls.cat([x, y])
    if odd:
        z = z[1:]
    return z.view(*sizes)


def bernoulli(self):
    """Element i is 1 w.p. self_i (sampling.py:53)."""
    return self > MPCTensor.rand(*self.size())


def bernoulli_public(cls, p):
    p = jnp.asarray(p)
    return cls.rand(*p.shape).lt(p)


def weighted_index(self, dim=None):
    """Random one-hot with weights self along dim (sampling.py:60)."""
    if dim is None:
        return weighted_index(self.flatten(), dim=0).view(self.size())

    x = self.cumsum(dim)
    max_weight = x.index_select(dim, jnp.array([x.size(dim) - 1]))
    r = MPCTensor.rand(*max_weight.size()) * max_weight

    gt = x.gt(r)
    shifted = gt.roll(1, dims=dim)
    # zero the wrapped-around first slot
    idx = [slice(None)] * shifted.ndim
    idx[dim] = slice(0, 1)
    zeroed = shifted.share.at[tuple(idx)].set(jnp.uint64(0))
    shifted = MPCTensor(type(shifted._tensor)(zeroed, shifted.encoder), shifted.ptype)

    return gt - shifted


def weighted_sample(self, dim=None):
    indices = weighted_index(self, dim)
    sample = self.mul(indices).sum(dim)
    return sample, indices


for _name, _fn in (
    ("bernoulli", bernoulli),
    ("weighted_index", weighted_index),
    ("weighted_sample", weighted_sample),
):
    setattr(MPCTensor, _name, _fn)
