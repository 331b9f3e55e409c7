"""uint64 arithmetic as (lo, hi) uint32 pairs — Mosaic has no 64-bit ints.

Every function takes/returns plain jnp uint32 arrays, uses only ops with
both Mosaic-TPU and CPU lowerings (bitwise, shifts by constants, 32-bit
add/sub/multiply-low), and is exact mod 2^64. Multiplication decomposes to
16-bit digits so every partial product fits a uint32 multiply-low.

Shared by the fused protocol kernels (ops/pallas_max_step.py) and their
CPU unit tests (tests/test_fused_max.py) — the same traced code runs in
both, so the kernel math is fully validated off-device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars (not jnp arrays): Pallas kernels reject captured
# device-array constants; np scalars bake into the jaxpr as literals
U32 = np.uint32
_MASK16 = np.uint32(0xFFFF)


def from_u64(x):
    """uint64 array -> (lo, hi) uint32 planes (host/XLA side only)."""
    return (x & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), (
        x >> jnp.uint64(32)
    ).astype(jnp.uint32)


def to_u64(lo, hi):
    """(lo, hi) uint32 planes -> uint64 array (host/XLA side only)."""
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def and_(a, b):
    return a[0] & b[0], a[1] & b[1]


def or_(a, b):
    return a[0] | b[0], a[1] | b[1]


def not_(a):
    full = np.uint32(0xFFFFFFFF)
    return a[0] ^ full, a[1] ^ full


def and_const(a, c64):
    lo_c = np.uint32(c64 & 0xFFFFFFFF)
    hi_c = np.uint32((c64 >> 32) & 0xFFFFFFFF)
    return a[0] & lo_c, a[1] & hi_c


def xor_const(a, c64):
    lo_c = np.uint32(c64 & 0xFFFFFFFF)
    hi_c = np.uint32((c64 >> 32) & 0xFFFFFFFF)
    return a[0] ^ lo_c, a[1] ^ hi_c


def shl(a, k):
    """Left shift by Python-int k (0 <= k < 64)."""
    lo, hi = a
    if k == 0:
        return lo, hi
    if k >= 32:
        return jnp.zeros_like(lo), lo << U32(k - 32) if k > 32 else lo
    return lo << U32(k), (hi << U32(k)) | (lo >> U32(32 - k))


def shr(a, k):
    """Logical right shift by Python-int k (0 <= k < 64)."""
    lo, hi = a
    if k == 0:
        return lo, hi
    if k >= 32:
        return hi >> U32(k - 32) if k > 32 else hi, jnp.zeros_like(hi)
    return (lo >> U32(k)) | (hi << U32(32 - k)), hi >> U32(k)


def add(a, b):
    """(a + b) mod 2^64. Carry from the low word: lo_sum < a_lo."""
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    return lo, a[1] + b[1] + carry


def sub(a, b):
    """(a - b) mod 2^64. Borrow when a_lo < b_lo."""
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(U32)
    return lo, a[1] - b[1] - borrow


def neg(a):
    z = jnp.zeros_like(a[0])
    return sub((z, z), a)


def _digits(a):
    """(lo, hi) -> four 16-bit digits d0..d3 (as uint32)."""
    lo, hi = a
    return lo & _MASK16, lo >> U32(16), hi & _MASK16, hi >> U32(16)


def mul(a, b):
    """(a * b) mod 2^64 via 16-bit schoolbook — all partials fit uint32.

    Digit k of the result needs sum_{i+j<=3} a_i b_j 2^(16(i+j)); partials
    are accumulated into a running (lo, hi) pair with 64-bit adds, so carries
    propagate exactly.
    """
    a0, a1, a2, a3 = _digits(a)
    b0, b1, b2, b3 = _digits(b)
    zero = jnp.zeros_like(a0)

    def pp(x, y):  # 16x16 -> 32 exact
        return x * y

    # weight 2^0
    acc = (pp(a0, b0), zero)
    # weight 2^16: two partials
    for p in (pp(a0, b1), pp(a1, b0)):
        acc = add(acc, shl((p, zero), 16))
    # weight 2^32: three partials (land entirely in hi)
    for p in (pp(a0, b2), pp(a1, b1), pp(a2, b0)):
        acc = add(acc, (zero, p))
    # weight 2^48: only low 16 bits of each partial survive mod 2^64
    s = pp(a0, b3) + pp(a1, b2) + pp(a2, b1) + pp(a3, b0)  # wraps u32: fine
    acc = add(acc, (zero, s << U32(16)))
    return acc


def select_bit(t, a, b):
    """t ? a : b with t a 0/1 uint32 mask (elementwise, both planes)."""
    m = np.uint32(0) - t  # 0 or 0xffffffff
    return (b[0] ^ ((a[0] ^ b[0]) & m), b[1] ^ ((a[1] ^ b[1]) & m))
