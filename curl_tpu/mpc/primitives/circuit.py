"""Constant-round Set-Propagate-Kill comparison/adder circuits on 64-bit words.

Rebuild of the reference circuit module (reference:
curl/mpc/primitives/circuit.py). The SPK tree performs a masked
parallel-prefix over the 64 bit-lanes of each uint64 word: 6 levels of
private AND (log2 64), each a single Beaver binary round with the S and P
operands stacked so both ANDs share one reveal (circuit.py:66).

The bit-lane masks select "arrow start/end" positions of the prefix tree at
each level; fanning values along arrows is a plain multiply by
(2^(2^i + 1) - 2) in the ring of bits — all local uint64 ops on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ... import ring

_BITS = 64
_LOG_BITS = 6

# level-i mask has ones at lane positions that are sources of the prefix
# arrows: pattern [2^i zeros, 1, (2^i - 1) zeros] repeated.
def _level_masks():
    masks = []
    for i in range(_LOG_BITS):
        step = 1 << (i + 1)
        m = 0
        # ones at lane positions p = (2^i - 1) + k * 2^(i+1)
        for start in range((1 << i) - 1, 64, step):
            m |= 1 << start
        masks.append(m)
    return masks


_MASKS = [np.uint64(m) for m in _level_masks()]
_MULTIPLIERS = [np.uint64(((1 << ((1 << i) + 1)) - 2) % (1 << 64)) for i in range(_LOG_BITS)]
_OUT_MASKS = [np.uint64((int(m) * int(mult)) % (1 << 64)) for m, mult in zip(_MASKS, _MULTIPLIERS)]


def _spk_circuit(S, P):
    """Parallel-prefix SPK reduction; returns (S, P) after 6 AND levels.

    At each level:  S <- S0 ^ (P0 & S1);  P <- P0 & P1
    (K is implied since (S, P, K) is one-hot.)
    """
    from .binary import BinarySharedTensor

    SP = BinarySharedTensor.stack([S, P])
    for i in range(_LOG_BITS):
        in_mask = _MASKS[i]
        out_mask = _OUT_MASKS[i]
        not_out_mask = np.uint64(int(out_mask) ^ ((1 << 64) - 1))

        P0 = SP[1].with_share(SP.share[1] & out_mask)
        S1P1 = SP.with_share(SP.share & in_mask)
        S1P1 = S1P1.with_share(S1P1.share * _MULTIPLIERS[i])  # fan along arrows

        update = P0 & S1P1  # one Beaver AND for both S and P lanes
        new_p = SP.share[1] & not_out_mask
        SP = SP.with_share(
            jnp.stack([SP.share[0], new_p], axis=0) ^ update.share
        )
    return SP[0], SP[1]


def _p_circuit(P):
    """AND-tree over bit lanes: result sign bit set iff all 64 bits are 1
    (circuit.py:90-105)."""
    shift = _BITS // 2
    for _ in range(_LOG_BITS):
        P = P & (P << shift)
        shift //= 2
    return P


def _flip_sign_bit(x):
    return x ^ ring.scalar(1 << 63)


def _get_sign_bit(x):
    """Extract the MSB into lane 0 (logical shift — equivalent to the
    reference's arithmetic-shift-then-eq(-1) at circuit.py:112-122)."""
    return x.logical_rshift(63)


def add(x, y):
    """Private 64-bit addition of XOR-shared words (circuit.py:125)."""
    S = x & y
    P = x ^ y
    carry, _ = _spk_circuit(S, P)
    return P ^ (carry << 1)


def eq(x, y):
    bitwise_equal = ~(x ^ y)
    P = _p_circuit(bitwise_equal)
    return _get_sign_bit(P)


def lt(x, y):
    x, y = _flip_sign_bit(x), _flip_sign_bit(y)
    S = y & ~x
    P = ~(x ^ y)
    S, _ = _spk_circuit(S, P)
    return _get_sign_bit(S)


def le(x, y):
    x, y = _flip_sign_bit(x), _flip_sign_bit(y)
    S = y & ~x
    P = ~(x ^ y)
    S, P = _spk_circuit(S, P)
    return _get_sign_bit(S ^ P)


def gt(x, y):
    x, y = _flip_sign_bit(x), _flip_sign_bit(y)
    S = x & ~y
    P = ~(x ^ y)
    S, _ = _spk_circuit(S, P)
    return _get_sign_bit(S)


def ge(x, y):
    x, y = _flip_sign_bit(x), _flip_sign_bit(y)
    S = x & ~y
    P = ~(x ^ y)
    S, P = _spk_circuit(S, P)
    return _get_sign_bit(S ^ P)
