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


def _log2(width):
    return {16: 4, 32: 5, 64: 6}[width]


def _boundary_clear(width):
    """Clear-mask for the carry bits that would cross a packed-segment
    boundary: after ``carry << 1`` the carry out of lane k*width - 1 lands at
    lane k*width and must be killed so each width-lane segment adds
    independently (packed comparisons: several narrow ring elements per
    64-bit word)."""
    m = (1 << 64) - 1
    for j in range(width, 64, width):
        m ^= 1 << j
    return np.uint64(m)


def _spk_circuit(S, P, levels=_LOG_BITS):
    """Parallel-prefix SPK reduction; returns (S, P) after ``levels`` AND
    levels. The masked prefix is Sklansky-structured: after k levels each bit
    lane holds the prefix over its aligned 2^k-lane block, so running
    log2(width) < 6 levels yields independent per-segment prefixes for
    64/width packed segments (no level-i arrow crosses an aligned 2^(i+1)
    block boundary).

    At each level:  S <- S0 ^ (P0 & S1);  P <- P0 & P1
    (K is implied since (S, P, K) is one-hot.)
    """
    from .binary import BinarySharedTensor

    SP = BinarySharedTensor.stack([S, P])
    for i in range(levels):
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


def _p_circuit(P, width=_BITS):
    """AND-tree over bit lanes: lane k*width - 1 ends up set iff all ``width``
    bits of segment k are 1 (circuit.py:90-105). With width < 64 the shift
    windows stay inside each width-lane segment at the segment-top lanes, so
    packed words evaluate 64/width equalities at once."""
    shift = width // 2
    for _ in range(_log2(width)):
        P = P & (P << shift)
        shift //= 2
    return P


def _flip_sign_bit(x):
    return x ^ ring.scalar(1 << 63)


def _get_sign_bit(x):
    """Extract the MSB into lane 0 (logical shift — equivalent to the
    reference's arithmetic-shift-then-eq(-1) at circuit.py:112-122)."""
    return x.logical_rshift(63)


def add(x, y, width=_BITS):
    """Private addition of XOR-shared words (circuit.py:125). With
    width < 64 each 64-bit word is treated as 64/width independent
    width-bit adders (packed narrow-ring elements): the prefix runs
    log2(width) levels and carries crossing segment boundaries are
    cleared, so chained adds (multi-party A2B trees) stay exact
    per-segment."""
    S = x & y
    P = x ^ y
    carry, _ = _spk_circuit(S, P, levels=_log2(width))
    shifted = carry << 1
    if width != _BITS:
        shifted = shifted.with_share(shifted.share & _boundary_clear(width))
    return P ^ shifted


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
