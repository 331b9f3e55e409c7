"""Communication-free share-structure ops (reference:
curl/common/functions/regular.py).

These act on the share array alone — reshapes, permutations, index motion,
additive reductions — and are installed on ArithmeticSharedTensor,
BinarySharedTensor and MPCTensor alike. Protocol-using reductions
(mean/var/prod/dot/ger) are installed only where multiplication exists.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..mpc.mpc import MPCTensor
from ..mpc.primitives.arithmetic import ArithmeticSharedTensor
from ..mpc.primitives.binary import BinarySharedTensor

__all__ = [
    "cat",
    "cumsum",
    "dot",
    "expand",
    "flatten",
    "flip",
    "gather",
    "ger",
    "index_select",
    "mean",
    "narrow",
    "permute",
    "prod",
    "repeat",
    "reshape",
    "roll",
    "split",
    "squeeze",
    "stack",
    "sum",
    "t",
    "take",
    "trace",
    "transpose",
    "unbind",
    "unfold",
    "unsqueeze",
    "var",
    "view",
]


# -- share-level structure ops (same code for all classes) ------------------

def _structure_ops():
    def view(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return self.with_share(self.share.reshape(shape))

    def reshape(self, *shape):
        return view(self, *shape)

    def flatten(self, start_dim=0, end_dim=-1):
        shp = self.share.shape
        end = end_dim if end_dim >= 0 else len(shp) + end_dim
        new = shp[:start_dim] + (-1,) + shp[end + 1:]
        return self.with_share(self.share.reshape(new))

    def squeeze(self, axis=None):
        return self.with_share(jnp.squeeze(self.share, axis=axis))

    def unsqueeze(self, axis):
        return self.with_share(jnp.expand_dims(self.share, axis))

    def transpose(self, dim0, dim1):
        return self.with_share(jnp.swapaxes(self.share, dim0, dim1))

    def t(self):
        return self.with_share(self.share.T)

    def permute(self, *dims):
        if len(dims) == 1 and isinstance(dims[0], (tuple, list)):
            dims = tuple(dims[0])
        return self.with_share(jnp.transpose(self.share, dims))

    def roll(self, shifts, dims=None):
        return self.with_share(jnp.roll(self.share, shifts, axis=dims))

    def expand(self, *sizes):
        if len(sizes) == 1 and isinstance(sizes[0], (tuple, list)):
            sizes = tuple(sizes[0])
        cur = self.share.shape
        target = []
        offset = len(sizes) - len(cur)
        for i, s in enumerate(sizes):
            if s == -1:
                target.append(cur[i - offset])
            else:
                target.append(s)
        return self.with_share(jnp.broadcast_to(self.share, tuple(target)))

    def flip(self, dims):
        return self.with_share(jnp.flip(self.share, axis=dims))

    def narrow(self, dim, start, length):
        return self.with_share(
            lax.slice_in_dim(self.share, start, start + length, axis=dim)
        )

    def index_select(self, dim, index):
        return self.with_share(jnp.take(self.share, jnp.asarray(index), axis=dim))

    def gather(self, dim, index):
        return self.with_share(
            jnp.take_along_axis(self.share, jnp.asarray(index), axis=dim)
        )

    def take(self, index, dimension=None):
        if dimension is None:
            return self.with_share(self.share.reshape(-1)[jnp.asarray(index)])
        return index_select(self, dimension, index)

    def repeat(self, *reps):
        if len(reps) == 1 and isinstance(reps[0], (tuple, list)):
            reps = tuple(reps[0])
        return self.with_share(jnp.tile(self.share, reps))

    def unfold(self, dimension, size, step):
        shp = self.share.shape
        n = (shp[dimension] - size) // step + 1
        idx = (jnp.arange(n) * step)[:, None] + jnp.arange(size)[None, :]
        moved = jnp.moveaxis(self.share, dimension, -1)
        windows = moved[..., idx]  # (..., n, size)
        out = jnp.moveaxis(windows, -2, dimension)
        return self.with_share(out)

    def cumsum(self, dim):
        return self.with_share(jnp.cumsum(self.share, axis=dim, dtype=self.share.dtype))

    def sum_(self, axis=None, keepdim=False):
        return self.with_share(
            jnp.sum(self.share, axis=axis, keepdims=keepdim, dtype=self.share.dtype)
        )

    def trace_(self):
        return self.with_share(
            jnp.trace(self.share, dtype=self.share.dtype)
        )

    def split(self, split_size, dim=0):
        n = self.share.shape[dim]
        if isinstance(split_size, int):
            sizes = [split_size] * (n // split_size)
            if n % split_size:
                sizes.append(n % split_size)
        else:
            sizes = list(split_size)
        outs = []
        start = 0
        for s in sizes:
            outs.append(
                self.with_share(lax.slice_in_dim(self.share, start, start + s, axis=dim))
            )
            start += s
        return outs

    def chunk(self, chunks, dim=0):
        n = self.share.shape[dim]
        size = -(-n // chunks)
        return split(self, size, dim=dim)

    def unbind(self, dim=0):
        n = self.share.shape[dim]
        return [
            self.with_share(jnp.take(self.share, i, axis=dim)) for i in range(n)
        ]

    return {
        "view": view,
        "reshape": reshape,
        "flatten": flatten,
        "squeeze": squeeze,
        "unsqueeze": unsqueeze,
        "transpose": transpose,
        "t": t,
        "permute": permute,
        "roll": roll,
        "expand": expand,
        "flip": flip,
        "narrow": narrow,
        "index_select": index_select,
        "gather": gather,
        "take": take,
        "repeat": repeat,
        "unfold": unfold,
        "cumsum": cumsum,
        "sum": sum_,
        "trace": trace_,
        "split": split,
        "chunk": chunk,
        "unbind": unbind,
    }


_OPS = _structure_ops()

for _cls in (ArithmeticSharedTensor, BinarySharedTensor):
    for _name, _fn in _OPS.items():
        if not hasattr(_cls, _name):
            setattr(_cls, _name, _fn)


def _mpc_forward(name):
    def fwd(self, *args, **kwargs):
        out = getattr(self._tensor, name)(*args, **kwargs)
        if isinstance(out, list):
            return [MPCTensor(o, self.ptype) for o in out]
        return MPCTensor(out, self.ptype)

    fwd.__name__ = name
    return fwd


for _name in _OPS:
    if not hasattr(MPCTensor, _name):
        setattr(MPCTensor, _name, _mpc_forward(_name))


# -- protocol-using reductions (MPCTensor / ArithmeticSharedTensor) ---------

def mean(self, axis=None, keepdim=False):
    """sum / n (reference regular.py:151)."""
    total = self.sum(axis=axis, keepdim=keepdim)
    if axis is None:
        n = int(np.prod(self.shape)) if self.shape else 1
    elif isinstance(axis, (tuple, list)):
        n = int(np.prod([self.shape[a] for a in axis]))
    else:
        n = self.shape[axis]
    return total.div(n)


def var(self, axis=None, keepdim=False, unbiased=False):
    """E[(x - mean)^2] (reference regular.py:164)."""
    m = mean(self, axis=axis, keepdim=True) if axis is not None else mean(self)
    diff = self - m
    sq = diff.square()
    total = sq.sum(axis=axis, keepdim=keepdim)
    if axis is None:
        n = int(np.prod(self.shape)) if self.shape else 1
    elif isinstance(axis, (tuple, list)):
        n = int(np.prod([self.shape[a] for a in axis]))
    else:
        n = self.shape[axis]
    if unbiased:
        n = n - 1
    return total.div(n)


def prod(self, axis=None, keepdim=False):
    """Tree product along an axis — log-depth private muls
    (reference regular.py:202)."""
    if axis is None:
        flat = self.flatten()
        return prod(flat, axis=0).squeeze() if flat.shape[0] > 1 else flat[0]
    x = self
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        a = x.narrow(axis, 0, half)
        b = x.narrow(axis, half, half)
        m = a.mul(b)
        if n % 2 == 1:
            rest = x.narrow(axis, 2 * half, 1)
            x = type(m).cat([m, rest], axis=axis) if hasattr(type(m), "cat") else m
        else:
            x = m
        n = half + (n % 2)
    if not keepdim:
        x = x.squeeze(axis)
    return x


def dot(self, y, weights=None):
    """Dot product of flattened tensors (reference regular.py:228)."""
    result = self.flatten().mul(y.flatten() if hasattr(y, "flatten") else jnp.ravel(jnp.asarray(y)))
    if weights is not None:
        result = result.mul(weights)
    return result.sum()


def ger(self, y):
    """Outer product (reference regular.py:240)."""
    a = self.view(-1, 1)
    b = y.view(1, -1) if hasattr(y, "view") else jnp.reshape(jnp.asarray(y), (1, -1))
    return a.matmul(b)


for _cls in (ArithmeticSharedTensor, MPCTensor):
    for _name, _fn in (("mean", mean), ("var", var), ("prod", prod), ("dot", dot), ("ger", ger)):
        if not hasattr(_cls, _name):
            setattr(_cls, _name, _fn)


def cat(tensors, axis=0):
    return type(tensors[0]).cat(tensors, axis=axis)


def stack(tensors, axis=0):
    return type(tensors[0]).stack(tensors, axis=axis)
