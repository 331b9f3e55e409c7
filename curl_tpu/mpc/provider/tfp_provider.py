"""Trusted First Party provider: insecure dev dealer (party 0 knows tuples).

Rebuild of the reference TFP provider (reference:
curl/mpc/provider/tfp_provider.py). Semantics: every tuple is a plaintext
drawn from party 0's local stream, secret-shared by PRZS with party 0 adding
the plaintext. Under the single-trace runtimes every party executes the same
sampling code, but only rank 0's draw enters the share sum — matching the
reference, where each party's process also runs the sampling locally and
only src=0's tensor matters.
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


def _share_from_local(value, precision: int = 0) -> ArithmeticSharedTensor:
    """PRZS + rank-0 adds `value` (a local plaintext draw). Bulk shapes on
    TPU run as one fused kernel pass (random.przs_share)."""
    return ArithmeticSharedTensor.from_shares(
        rng.przs_share(value), precision=precision
    )


def _bshare_from_local(value) -> BinarySharedTensor:
    share = rng.przs_binary(np.shape(value))
    if comm.get_world_size() > 1:
        mask = jnp.where(
            comm.rank_signed() == 0, jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64(0)
        )
        share = share ^ (value & mask)
    else:
        share = share ^ value
    return BinarySharedTensor.from_shares(share)


class TrustedFirstParty(TupleProvider):
    NAME = "TFP"

    def generate_additive_triple(self, size0, size1, op, **kwargs):
        """Beaver triple (a, b, c=op(a,b)) (tfp_provider.py:20-31)."""
        a = rng.random_ring(size0, rng.dealer_stream())
        b = rng.random_ring(size1, rng.dealer_stream())
        from ..primitives.beaver import _RING_OPS

        c = _RING_OPS[op](a, b, **kwargs)
        return (
            _share_from_local(a),
            _share_from_local(b),
            _share_from_local(c),
        )

    def square(self, size):
        r = rng.random_ring(size, rng.dealer_stream())
        r2 = r * r
        return _share_from_local(r), _share_from_local(r2)

    def generate_binary_triple(self, size0, size1):
        a = rng.random_kbit(size0, 64, rng.dealer_stream())
        b = rng.random_kbit(size1, 64, rng.dealer_stream())
        c = a & b
        shape = np.broadcast_shapes(tuple(size0), tuple(size1))
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        c = jnp.broadcast_to(c, shape)
        return (
            _bshare_from_local(a),
            _bshare_from_local(b),
            _bshare_from_local(c),
        )

    def wrap_rng(self, size):
        """Random share vector + sharing of its wrap count
        (tfp_provider.py:55-68). Party 0 draws all P share planes, counts
        wraps, and scatters plane i to party i."""
        n = comm.get_world_size()
        planes = jnp.stack([rng.random_ring(size, rng.dealer_stream()) for _ in range(n)], 0)
        theta_r = ring.count_wraps(planes)
        # scatter plane i to party i (only rank 0's draw is meaningful)
        my_plane = comm.scatter(planes, src=0)
        r = ArithmeticSharedTensor.from_shares(my_plane, precision=0)
        return r, _share_from_local(theta_r)

    def B2A_rng(self, size):
        r = rng.random_kbit(size, 1, rng.dealer_stream())
        return _share_from_local(r), _bshare_from_local(r)

    def generate_one_hot(self, tensor_size, lut_size: int):
        """r mod L and its one-hot row per element (tfp_provider.py:80-92)."""
        r = rng.random_ring(tensor_size, rng.dealer_stream())
        r_clear = jnp.mod(ring.to_signed(r), jnp.int64(lut_size))
        grid = jnp.arange(lut_size, dtype=jnp.int64)
        one_hot = (r_clear[..., None] == grid).astype(jnp.uint64)
        r_shares = _share_from_local(r_clear.view(jnp.uint64))
        one_hot_shares = _share_from_local(one_hot)
        return r_shares, one_hot_shares

    def generate_lut_masks(self, tensor_size, lut_size: int, n_tables: int):
        """Gather-form one-hot tuple: (r_clear, [r], output PRZS masks).

        Algebraic compression of generate_one_hot for the TFP knowledge
        model: the one-hot-dot sum_j oh_p[n,j]*T[(j+shift_n)%L] expands to
        sum_j przs_p[n,j]*T[...] + (rank0)*T[(r_n+shift_n)%L]. The first
        term is a PRZS of the output shape (any mask telescoping to zero
        has the same joint distribution), so the dealer tuple collapses to
        O(N): r's share plus one output-shaped mask per table. Each party's
        view is unchanged vs the reference one-hot protocol
        (tfp_provider.py:80-92): its own PRZS share, plus the plaintext
        tuple for rank 0 only. r_clear is each party's LOCAL draw — only
        rank 0's enters the share sum, and only rank 0 applies the gather.
        """
        r = rng.random_ring(tensor_size, rng.dealer_stream())
        r_clear = jnp.mod(ring.to_signed(r), jnp.int64(lut_size))
        r_shares = _share_from_local(r_clear.view(jnp.uint64))
        masks = jnp.stack(
            [rng.przs_arithmetic(tuple(tensor_size)) for _ in range(n_tables)]
        )
        return r_clear.astype(jnp.int32), r_shares, masks

    def egk_trunc_pr_rng(self, size, l: int, m: int):
        """(r, r', b) randomness for EGK truncation (tfp_provider.py:94)."""
        r = rng.random_kbit(size, l - m, rng.dealer_stream())
        r_p = rng.random_kbit(size, m, rng.dealer_stream())
        b = rng.random_kbit(size, 1, rng.dealer_stream())
        return (
            _share_from_local(r),
            _share_from_local(r_p),
            _share_from_local(b),
        )
