"""Trusted Third Party provider — dealer-correlated tuple distribution.

The reference runs the TTP as an extra process at rank == world_size holding
one seed per party: parties i >= 1 derive their tuple shares locally from
their TTP-shared generator, the server computes the complement
``value - sum_{i>=1} share_i`` and ships it to party 0
(reference: curl/mpc/provider/ttp_provider.py:25-430, _get_additive_PRSS
:339).

TPU-native mapping: the per-party TTP generator is a dedicated key stream
("ttp", unique per party) and the dealer's own randomness is the "dealer"
stream. The server's complement computation becomes one masked psum over the
party axis (rank-0 receives value - sum of others) — the same single
communication the reference spends on its ttp_comm_group send, but riding
ICI as an XLA collective instead of a pickled Gloo message.

Note on the trust model: under the single-trace runtimes every party traces
the dealer's sampling code (exactly as every party process runs the TFP
sampling in the reference's dev setup). A deployment that needs a physically
separate dealer should run the offline phase (TupleCache fill) on the
dealer's host and feed the cache to the online step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ... import comm
from ... import random as rng
from ... import ring
from ..primitives.arithmetic import ArithmeticSharedTensor
from ..primitives.binary import BinarySharedTensor
from .provider import TupleProvider


def _ttp_arith_share(value) -> ArithmeticSharedTensor:
    """Distribute `value`: parties >=1 draw from their ttp stream; party 0
    gets the complement via one masked psum."""
    shape = np.shape(value)
    mine = rng.random_ring(shape, "ttp")
    if comm.get_world_size() < 2:
        return ArithmeticSharedTensor.from_shares(value, precision=0)
    is_rest = (comm.rank_signed() > 0).astype(jnp.uint64)
    total = comm.all_sum(mine * is_rest)
    share = jnp.where(comm.rank_signed() == 0, value - total, mine)
    return ArithmeticSharedTensor.from_shares(share, precision=0)


def _ttp_bin_share(value) -> BinarySharedTensor:
    shape = np.shape(value)
    mine = rng.random_kbit(shape, 64, "ttp")
    if comm.get_world_size() < 2:
        return BinarySharedTensor.from_shares(value)
    mask = jnp.where(
        comm.rank_signed() > 0, jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64(0)
    )
    total = comm.all_xor(mine & mask)
    share = jnp.where(comm.rank_signed() == 0, value ^ total, mine)
    return BinarySharedTensor.from_shares(share)


class TrustedThirdParty(TupleProvider):
    NAME = "TTP"

    def generate_additive_triple(self, size0, size1, op, **kwargs):
        a = rng.random_ring(size0, "dealer")
        b = rng.random_ring(size1, "dealer")
        from ..primitives.beaver import _RING_OPS

        c = _RING_OPS[op](a, b, **kwargs)
        return _ttp_arith_share(a), _ttp_arith_share(b), _ttp_arith_share(c)

    def square(self, size):
        r = rng.random_ring(size, "dealer")
        return _ttp_arith_share(r), _ttp_arith_share(r * r)

    def generate_binary_triple(self, size0, size1):
        shape = np.broadcast_shapes(tuple(size0), tuple(size1))
        a = rng.random_kbit(size0, 64, "dealer")
        b = rng.random_kbit(size1, 64, "dealer")
        c = a & b
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        c = jnp.broadcast_to(c, shape)
        return _ttp_bin_share(a), _ttp_bin_share(b), _ttp_bin_share(c)

    def wrap_rng(self, size):
        n = comm.get_world_size()
        planes = jnp.stack(
            [rng.random_ring(size, "dealer") for _ in range(n)], 0
        )
        theta_r = ring.count_wraps(planes)
        if n > 1:
            my_plane = planes[comm.rank_signed()]
        else:
            my_plane = planes[0]
        r = ArithmeticSharedTensor.from_shares(my_plane, precision=0)
        return r, _ttp_arith_share(theta_r)

    def B2A_rng(self, size):
        r = rng.random_kbit(size, 1, "dealer")
        return _ttp_arith_share(r), _ttp_bin_share(r)

    def generate_one_hot(self, tensor_size, lut_size: int):
        r = rng.random_ring(tensor_size, "dealer")
        r_clear = jnp.mod(ring.to_signed(r), jnp.int64(lut_size))
        grid = jnp.arange(lut_size, dtype=jnp.int64)
        one_hot = (r_clear[..., None] == grid).astype(jnp.uint64)
        return (
            _ttp_arith_share(r_clear.view(jnp.uint64)),
            _ttp_arith_share(one_hot),
        )

    def egk_trunc_pr_rng(self, size, l: int, m: int):
        r = rng.random_kbit(size, l - m, "dealer")
        r_p = rng.random_kbit(size, m, "dealer")
        b = rng.random_kbit(size, 1, "dealer")
        return (
            _ttp_arith_share(r),
            _ttp_arith_share(r_p),
            _ttp_arith_share(b),
        )
