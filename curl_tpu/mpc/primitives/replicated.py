"""Replicated secret sharing (RSS / ABY3-style) 3-party protocol.

Rebuild of the reference replicated module (reference:
curl/mpc/primitives/replicated.py). Each party passes its share one step
around the ring (lax.ppermute over the party axis instead of isend/irecv,
replicated.py:15-39); with both its own and its neighbour's share, bilinear
ops are computed locally and re-randomized with a PRZS.

Selected with cfg.mpc.protocol = "replicated"; truncation is the ABY3
two-share trick and is exact only for 3 parties (replicated.py:109-135).
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import comm
from ... import random as rng
from ... import ring
from ...config import cfg
from ...encoder import FixedPointEncoder
from .arithmetic import ArithmeticSharedTensor


def replicate_shares(shares):
    """Each party receives the share of the previous party (one ring pass)."""
    return [comm.ppermute(s, shift=1) for s in shares]


def _bilinear(op, x, y, **kwargs):
    x1, y1 = x.share, y.share
    x2, y2 = comm.ppermute(x.share, shift=1), comm.ppermute(y.share, shift=1)
    ring_op = {
        "mul": lambda a, b, **kw: a * b,
        "matmul": ring.matmul,
        "conv1d": ring.conv1d,
        "conv2d": ring.conv2d,
        "conv_transpose1d": ring.conv_transpose1d,
        "conv_transpose2d": ring.conv_transpose2d,
    }[op]
    z = (
        ring_op(x1, y1, **kwargs)
        + ring_op(x1, y2, **kwargs)
        + ring_op(x2, y1, **kwargs)
    )
    z = z + rng.przs_arithmetic(z.shape)
    return ArithmeticSharedTensor(z, x.encoder)


def mul(x, y):
    return _bilinear("mul", x, y)


def matmul(x, y):
    return _bilinear("matmul", x, y)


def conv1d(x, y, **kwargs):
    return _bilinear("conv1d", x, y, **kwargs)


def conv2d(x, y, **kwargs):
    return _bilinear("conv2d", x, y, **kwargs)


def conv_transpose1d(x, y, **kwargs):
    return _bilinear("conv_transpose1d", x, y, **kwargs)


def conv_transpose2d(x, y, **kwargs):
    return _bilinear("conv_transpose2d", x, y, **kwargs)


def square(x):
    x1 = x.share
    x2 = comm.ppermute(x.share, shift=1)
    z = x1 * x1 + ring.scalar(2) * x1 * x2
    z = z + rng.przs_arithmetic(z.shape)
    return ArithmeticSharedTensor(z, x.encoder)


def truncate(x, y: int):
    """3PC ABY3 truncation (replicated.py:109-135): parties 0/1 jointly hold
    x1+x2; party 2's share is truncated locally; rank 1 truncates the sum."""
    if comm.get_world_size() != 3:
        raise NotImplementedError("replicated truncation requires 3 parties")
    r = comm.rank_signed()
    nbr = comm.ppermute(x.share, shift=1)  # previous party's share
    # party 1 holds shares of ranks 0 and 1 after the pass
    sum01 = x.share + nbr
    t_sum = ring.trunc_div_signed(sum01, y)
    t_own = ring.trunc_div_signed(x.share, y)
    share = jnp.where(r == 1, t_sum, jnp.where(r == 2, t_own, jnp.uint64(0)))
    # re-randomize with PRZS to restore the 3-additive structure
    share = share + rng.przs_arithmetic(x.share.shape)
    return ArithmeticSharedTensor(share, x.encoder)


# LUT/EGK protocols are protocol-independent (they only use reveals and
# provider tuples); delegate to the beaver implementations.
from .beaver import (  # noqa: E402,F401
    AND,
    B2A_single_bit,
    egk_trunc_pr,
    evaluate_bior_lut,
    evaluate_embed,
    evaluate_lut,
    wraps,
)
