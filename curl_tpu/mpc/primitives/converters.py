"""A2B / B2A share conversion (reference: curl/mpc/primitives/converters.py).

_A2B: each party re-shares its arithmetic share as a binary tensor, and the
P binary tensors are summed with the SPK adder tree — O(log P) rounds of
6-level AND circuits.

_B2A: bit-decompose, convert each bit with B2A_single_bit (one reveal,
batched over all 64 bit-planes), then weighted-sum. bits=1 fast path for
comparison outputs.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import comm
from ...encoder import FixedPointEncoder
from . import beaver
from .arithmetic import ArithmeticSharedTensor
from .binary import BinarySharedTensor


def A2B(arithmetic_tensor: ArithmeticSharedTensor, width=64) -> BinarySharedTensor:
    """``width < 64``: the word is 64/width packed width-bit ring elements;
    the adder tree then runs log2(width) prefix levels per add with
    boundary carries cleared (circuit.add)."""
    n = comm.get_world_size()
    if n == 1:
        return BinarySharedTensor(arithmetic_tensor.share, arithmetic_tensor.encoder)
    parts = [
        BinarySharedTensor.encrypt(arithmetic_tensor.share, src=i) for i in range(n)
    ]
    binary_tensor = BinarySharedTensor.stack(parts).sum(axis=0, width=width)
    return BinarySharedTensor(binary_tensor.share, arithmetic_tensor.encoder)


def B2A(
    binary_tensor: BinarySharedTensor, precision=None, bits=None
) -> ArithmeticSharedTensor:
    if bits is None:
        bits = 64

    if bits == 1:
        binary_bit = binary_tensor & 1
        arithmetic_tensor = beaver.B2A_single_bit(binary_bit)
    else:
        stacked = BinarySharedTensor.stack(
            [binary_tensor.logical_rshift(i) for i in range(bits)]
        )
        stacked = stacked & 1
        arithmetic_bits = beaver.B2A_single_bit(stacked)
        multiplier = jnp.array(
            [1 << i for i in range(bits)], dtype=jnp.uint64
        ).reshape((bits,) + (1,) * binary_tensor.ndim)
        share = jnp.sum(arithmetic_bits.share * multiplier, axis=0)
        arithmetic_tensor = ArithmeticSharedTensor(share, FixedPointEncoder(0))

    encoder = FixedPointEncoder(precision)
    scale = encoder.scale // max(binary_tensor.encoder.scale, 1)
    out = ArithmeticSharedTensor(
        arithmetic_tensor.share * jnp.uint64(max(scale, 1)), encoder
    )
    return out
