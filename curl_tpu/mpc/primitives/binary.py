"""XOR secret sharing over 64-bit words — per-party, functional, jit-native.

Rebuild of the reference BinarySharedTensor (reference:
curl/mpc/primitives/binary.py:26). Shares are uint64 bit-vectors; XOR/NOT/
shifts are local, AND runs the Beaver binary protocol, comparisons delegate
to the constant-round SPK circuits (circuit.py). Reveal is an XOR-reduction
over the party axis (the Gloo BXOR all_reduce of the reference,
binary.py:371-392, becomes all_gather + xor tree on ICI).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import comm
from ... import random as rng
from ... import ring
from ...encoder import FixedPointEncoder


@jax.tree_util.register_pytree_node_class
class BinarySharedTensor:
    __slots__ = ("share", "encoder")

    def __init__(self, share: jax.Array, encoder: Optional[FixedPointEncoder] = None):
        self.share = share
        self.encoder = encoder if encoder is not None else FixedPointEncoder(0)

    def tree_flatten(self):
        return (self.share,), (self.encoder.precision_bits,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], FixedPointEncoder(aux[0]))

    # -- constructors ------------------------------------------------------
    @classmethod
    def encrypt(cls, value, src: int = 0):
        """XOR-share a plaintext bit-vector from party ``src``
        (binary.py: PRZS ^ src-contribution)."""
        value = ring.to_ring(jnp.asarray(value))
        share = rng.przs_binary(value.shape)
        if comm.get_world_size() > 1:
            mask = jnp.where(
                comm.rank_signed() == src, jnp.uint64(0xFFFFFFFFFFFFFFFF), jnp.uint64(0)
            )
            share = share ^ (value & mask)
        else:
            share = share ^ value
        return cls(share)

    @classmethod
    def from_shares(cls, share):
        return cls(ring.to_ring(share))

    @classmethod
    def PRZS(cls, shape, bits: int = 64):
        return cls(rng.przs_binary(shape, bits))

    @classmethod
    def rand(cls, shape, bits: int = 64):
        """Uniform random secret bits: each party contributes local bits
        XORed together (binary.py:136)."""
        return cls(rng.random_kbit(shape, bits, "local"))

    # -- structure ---------------------------------------------------------
    @property
    def shape(self):
        return self.share.shape

    @property
    def ndim(self):
        return self.share.ndim

    def size(self):
        return self.share.shape

    def dim(self):
        return self.share.ndim

    def with_share(self, share) -> "BinarySharedTensor":
        return BinarySharedTensor(share, self.encoder)

    def clone(self):
        return BinarySharedTensor(self.share, self.encoder)

    shallow_copy = clone

    def __repr__(self):
        return f"BinarySharedTensor({self.share})"

    @staticmethod
    def stack(tensors, axis=0):
        return BinarySharedTensor(
            jnp.stack([t.share for t in tensors], axis=axis), tensors[0].encoder
        )

    @staticmethod
    def cat(tensors, axis=0):
        return BinarySharedTensor(
            jnp.concatenate([t.share for t in tensors], axis=axis), tensors[0].encoder
        )

    def __getitem__(self, idx):
        return self.with_share(self.share[idx])

    # -- reveal ------------------------------------------------------------
    def reveal(self) -> jax.Array:
        return comm.all_xor(self.share)

    @staticmethod
    def reveal_batch(tensors):
        return comm.all_xor([t.share for t in tensors])

    def get_plain_text(self) -> np.ndarray:
        return np.asarray(self.reveal())

    # -- bitwise ops -------------------------------------------------------
    def __xor__(self, y):
        if isinstance(y, BinarySharedTensor):
            return self.with_share(self.share ^ y.share)
        yv = (
            ring.scalar(int(y))
            if isinstance(y, (int, np.integer))
            else ring.to_ring(jnp.asarray(y))
        )
        if comm.get_world_size() > 1:
            yv = jnp.where(comm.rank_signed() == 0, yv, jnp.uint64(0))
        return self.with_share(self.share ^ yv)

    def __and__(self, y):
        if isinstance(y, BinarySharedTensor):
            from . import beaver

            return beaver.AND(self, y)
        y = ring.to_ring(jnp.asarray(y)) if not isinstance(y, (int, np.integer)) else ring.scalar(int(y))
        return self.with_share(self.share & y)

    def __or__(self, y):
        # x | y = x ^ y ^ (x & y)
        return (self ^ y) ^ (self & y)

    def __invert__(self):
        return self ^ ring.scalar(0xFFFFFFFFFFFFFFFF)

    def __lshift__(self, bits):
        return self.with_share(self.share << jnp.uint64(bits))

    def __rshift__(self, bits):
        """Arithmetic shift — the reference changed __rshift__ to arithmetic
        (circuit.py note at :103)."""
        return self.with_share(ring.shift_right_arith(self.share, bits))

    def lshift(self, bits):
        return self << bits

    def rshift(self, bits):
        return self >> bits

    def logical_rshift(self, bits):
        return self.with_share(self.share >> jnp.uint64(bits))

    # -- arithmetic-over-binary --------------------------------------------
    def add(self, y, width=64):
        from . import circuit

        return circuit.add(self, y, width=width)

    __add__ = add

    def sum(self, axis=0, width=64):
        """Log-tree ripple add over an axis via the SPK adder
        (binary.py:339-362). ``width < 64`` adds packed narrow-ring
        segments independently (circuit.add)."""
        from . import circuit

        n = self.share.shape[axis]
        x = self
        while n > 1:
            half = n // 2
            idx_a = [slice(None)] * x.ndim
            idx_b = [slice(None)] * x.ndim
            idx_a[axis] = slice(0, half)
            idx_b[axis] = slice(half, 2 * half)
            a = x.with_share(x.share[tuple(idx_a)])
            b = x.with_share(x.share[tuple(idx_b)])
            added = circuit.add(a, b, width=width)
            if n % 2 == 1:
                idx_r = [slice(None)] * x.ndim
                idx_r[axis] = slice(2 * half, n)
                rem = x.share[tuple(idx_r)]
                x = x.with_share(jnp.concatenate([added.share, rem], axis=axis))
                n = half + 1
            else:
                x = added
                n = half
        idx = [slice(None)] * x.ndim
        idx[axis] = 0
        return x.with_share(x.share[tuple(idx)])

    # -- comparisons -------------------------------------------------------
    def eq(self, y):
        from . import circuit

        return circuit.eq(self, y)

    def ne(self, y):
        return self.eq(y) ^ 1

    def lt(self, y):
        from . import circuit

        return circuit.lt(self, y)

    def le(self, y):
        from . import circuit

        return circuit.le(self, y)

    def gt(self, y):
        from . import circuit

        return circuit.gt(self, y)

    def ge(self, y):
        from . import circuit

        return circuit.ge(self, y)
