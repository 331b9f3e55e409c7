"""Additive secret sharing over Z_2^64 — per-party, functional, jit-native.

Rebuild of the reference ArithmeticSharedTensor (reference:
curl/mpc/primitives/arithmetic.py:28) with three deliberate departures:

  1. **Functional**: every op returns a new tensor; shares are immutable
     uint64 jax arrays. This is what lets whole protocols trace into single
     XLA programs (the reference mutates `share` in place under eager torch).
  2. **Per-party view**: there is no leading party dimension; the party is a
     named axis bound by the runtime (vmap for simulation, shard_map for real
     chips). ``reveal`` is ``comm.all_sum`` = lax.psum over that axis.
  3. **Registered pytree**: instances flow through jit/vmap/scan directly;
     the fixed-point precision is static aux data, so a scale change is a
     (cheap, intended) retrace.

Semantics preserved exactly: PRZS construction, reveal, public/private
arithmetic dispatch, the post-multiply rescale choice between 2PC local
truncation ("crypten") and EGK probabilistic truncation ("egk"), signed
wrap-corrected truncation for >2PC.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import comm
from ... import random as rng
from ... import ring
from ...config import cfg
from ...encoder import FixedPointEncoder


def _is_public(value) -> bool:
    import numbers

    if isinstance(value, (ArithmeticSharedTensor,)):
        return False
    return (
        isinstance(value, numbers.Number)
        or isinstance(value, (np.ndarray, jax.Array))
        or isinstance(value, (list, tuple))
    )


def _get_protocol():
    from . import beaver, replicated

    name = cfg.mpc.protocol
    return {"beaver": beaver, "replicated": replicated}[name]


@jax.tree_util.register_pytree_node_class
class ArithmeticSharedTensor:
    __slots__ = ("share", "encoder")

    def __init__(self, share: jax.Array, encoder: FixedPointEncoder):
        self.share = share
        self.encoder = encoder

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.share,), (self.encoder.precision_bits,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], FixedPointEncoder(aux[0]))

    # -- constructors ------------------------------------------------------
    @classmethod
    def encrypt(cls, value, src: int = 0, precision: Optional[int] = None):
        """Share a plaintext provided by party ``src`` (arithmetic.py:101-104).

        All parties call this with a value of the correct shape (non-src
        values are ignored — only src's encoding enters the sum).
        """
        enc = FixedPointEncoder(precision)
        value = jnp.asarray(value)
        if jnp.issubdtype(value.dtype, jnp.integer) and precision != 0:
            value = value.astype(jnp.float64)
        encoded = enc.encode(value)
        encoded = jnp.asarray(encoded)
        share = rng.przs_arithmetic(encoded.shape)
        if comm.get_world_size() > 1:
            mask = (comm.rank_signed() == src).astype(jnp.uint64)
            share = share + mask * encoded
        else:
            share = share + encoded
        return cls(share, enc)

    @classmethod
    def from_shares(cls, share, precision: Optional[int] = None):
        return cls(ring.to_ring(share), FixedPointEncoder(precision))

    @classmethod
    def PRZS(cls, shape):
        return cls(rng.przs_arithmetic(shape), FixedPointEncoder())

    @classmethod
    def PRSS(cls, shape):
        """Pseudo-random secret share from each party's local stream."""
        return cls(rng.random_ring(shape, "local"), FixedPointEncoder())

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

    def nelement(self):
        return int(np.prod(self.share.shape)) if self.share.shape else 1

    @property
    def rank(self):
        return comm.rank_signed()

    def with_share(self, share) -> "ArithmeticSharedTensor":
        return ArithmeticSharedTensor(share, self.encoder)

    def with_scale_bits(self, bits: int) -> "ArithmeticSharedTensor":
        return ArithmeticSharedTensor(self.share, FixedPointEncoder(bits))

    def clone(self):
        return ArithmeticSharedTensor(self.share, self.encoder)

    shallow_copy = clone

    def __repr__(self):
        return f"ArithmeticSharedTensor({self.share})"

    # -- reveal / decode ---------------------------------------------------
    def reveal(self) -> jax.Array:
        """Raw ring reconstruction: psum of shares (arithmetic.py:296-302)."""
        return comm.all_sum(self.share)

    @staticmethod
    def reveal_batch(tensors):
        """Batched reveal — one communication round (arithmetic.py:282)."""
        return comm.all_sum([t.share for t in tensors])

    def get_plain_text(self) -> np.ndarray:
        return self.encoder.decode(self.reveal())

    # -- public/private arithmetic dispatch --------------------------------
    def _add_sub(self, y, op: str):
        if _is_public(y):
            # rank 0 adds the encoded public value; all parties broadcast
            # their share to the result shape (arithmetic.py:364-368)
            encoded = jnp.asarray(self.encoder.encode(y))
            out_shape = np.broadcast_shapes(self.shape, np.shape(encoded))
            share = jnp.broadcast_to(self.share, out_shape)
            if comm.get_world_size() > 1:
                mask = (comm.rank_signed() == 0).astype(jnp.uint64)
                encoded = mask * encoded
            share = share + encoded if op == "add" else share - encoded
            return self.with_share(share)
        assert isinstance(y, ArithmeticSharedTensor)
        a, b = self, y
        # align scales (arithmetic.py:374-380)
        if a.encoder.scale > b.encoder.scale:
            b = b.encode_as(a)
        elif a.encoder.scale < b.encoder.scale:
            a = a.encode_as(b)
        share = a.share + b.share if op == "add" else a.share - b.share
        return ArithmeticSharedTensor(share, a.encoder)

    def add(self, y):
        return self._add_sub(y, "add")

    def sub(self, y):
        return self._add_sub(y, "sub")

    def __add__(self, y):
        return self.add(y)

    __radd__ = __add__

    def __sub__(self, y):
        return self.sub(y)

    def __rsub__(self, y):
        return self.neg().add(y)

    def neg(self):
        return self.with_share(jnp.negative(self.share))

    __neg__ = neg

    def _rescale_product(self, result: "ArithmeticSharedTensor", y_scale: int):
        """Post-multiplication rescale (arithmetic.py:389-408)."""
        if self.encoder.scale > 1 and y_scale > 1:
            if cfg.encoder.trunc_method.prod == "crypten":
                return result.div_trunc(result.encoder.scale)
            return result.egk_trunc_pr(62, result.encoder.precision_bits)
        if self.encoder.scale > 1:
            return ArithmeticSharedTensor(result.share, self.encoder)
        return ArithmeticSharedTensor(
            result.share, FixedPointEncoder(int(math.log2(max(y_scale, 1))))
        )

    def _fused_mul_mode(self, y):
        """(trunc, m) for the fused elementwise mul kernel
        (ops/pallas_mul.py), or None for the composable path. Covers the
        two hot scale patterns; mixed-scale products keep the composable
        rescale bookkeeping."""
        from ...ops import pallas_mul

        if not pallas_mul.fused_available(self, y):
            return None
        if self.encoder.scale > 1 and y.encoder.scale > 1:
            return str(cfg.encoder.trunc_method.prod), self.encoder.precision_bits
        if self.encoder.scale == 1 and y.encoder.scale == 1:
            return "none", 0
        return None

    def mul(self, y):
        import numbers

        if isinstance(y, numbers.Integral):
            return self.with_share(self.share * ring.scalar(int(y)))
        if _is_public(y):
            encoded = jnp.asarray(self.encoder.encode(y))
            out = self.with_share(self.share * encoded)
            return self._rescale_product(out, self.encoder.scale)
        fused = self._fused_mul_mode(y)
        if fused is not None:
            from ...ops import pallas_mul

            return pallas_mul.fused_mul_mpc(self, y, *fused)
        protocol = _get_protocol()
        out = protocol.mul(self, y)
        return self._rescale_product(out, y.encoder.scale)

    def __mul__(self, y):
        return self.mul(y)

    __rmul__ = __mul__

    def matmul(self, y):
        if _is_public(y):
            encoded = ring.to_ring(jnp.asarray(self.encoder.encode(y)))
            out = self.with_share(ring.matmul(self.share, encoded))
            return self._rescale_product(out, self.encoder.scale)
        protocol = _get_protocol()
        out = protocol.matmul(self, y)
        return self._rescale_product(out, y.encoder.scale)

    def __matmul__(self, y):
        return self.matmul(y)

    def conv1d(self, kernel, **kwargs):
        return self._conv(kernel, "conv1d", **kwargs)

    def conv2d(self, kernel, **kwargs):
        return self._conv(kernel, "conv2d", **kwargs)

    def conv_transpose1d(self, kernel, **kwargs):
        return self._conv(kernel, "conv_transpose1d", **kwargs)

    def conv_transpose2d(self, kernel, **kwargs):
        return self._conv(kernel, "conv_transpose2d", **kwargs)

    def _conv(self, kernel, op, **kwargs):
        if _is_public(kernel):
            encoded = ring.to_ring(jnp.asarray(self.encoder.encode(kernel)))
            out = self.with_share(getattr(ring, op)(self.share, encoded, **kwargs))
            return self._rescale_product(out, self.encoder.scale)
        protocol = _get_protocol()
        out = getattr(protocol, op)(self, kernel, **kwargs)
        return self._rescale_product(out, kernel.encoder.scale)

    def square(self):
        from ...ops import pallas_mul

        if pallas_mul.fused_available(self):
            # square always rescales crypten-locally (div_trunc), matching
            # the composable path below and the reference (mpc square)
            return pallas_mul.fused_square_mpc(
                self, "crypten", self.encoder.precision_bits
                if self.encoder.scale > 1 else 0
            )
        protocol = _get_protocol()
        out = protocol.square(self)
        return out.div_trunc(self.encoder.scale)

    # -- division / truncation --------------------------------------------
    def div_trunc(self, divisor: int):
        """Divide by a public positive integer (arithmetic.py:452-481).

        2PC: local signed truncated division of each share.
        >2PC: wrap-corrected truncation via the `wraps` protocol.
        """
        if comm.get_world_size() > 2:
            protocol = _get_protocol()
            return protocol.truncate(self, divisor)
        return self.with_share(ring.trunc_div_signed(self.share, divisor))

    def div(self, y):
        import numbers

        if isinstance(y, numbers.Real) and not isinstance(y, numbers.Integral):
            if float(y).is_integer():
                y = int(y)
        if isinstance(y, numbers.Integral):
            return self.div_trunc(int(y))
        y_arr = jnp.asarray(y)
        if jnp.issubdtype(y_arr.dtype, jnp.integer):
            # torch path truncates each element; we only support scalar here
            raise NotImplementedError("elementwise integer division")
        return self.mul(1.0 / y if isinstance(y, float) else jnp.reciprocal(y_arr))

    __truediv__ = div

    def divmod(self, y: int):
        """(self // y, self % y) in the encoded domain (arithmetic.py:490)."""
        divisor = self.div(y)
        remainder = self - divisor * y
        return divisor, remainder

    def mod(self, y: int):
        return self.divmod(y)[1]

    __mod__ = mod

    def egk_trunc_pr(self, l: int, m: int):
        """EGK+20 probabilistic truncation by m bits (arithmetic.py:508)."""
        if m == 0:
            return self
        from ...ops import pallas_mul

        # fused kernel implements the l=62 instance (the only l used by the
        # LUT index truncations and product rescale)
        if l == 62 and pallas_mul.fused_available(self, key="fused_trunc"):
            return pallas_mul.fused_trunc_mpc(self, m)
        protocol = _get_protocol()
        return ArithmeticSharedTensor(
            protocol.egk_trunc_pr(self, l, m).share, self.encoder
        )

    def egk_truncmod_pr(self, l: int, m: int):
        """(truncation, remainder) pair (arithmetic.py:515-519)."""
        divisor = self.egk_trunc_pr(l, m)
        remainder_share = self.share - divisor.share * ring.scalar(1 << m)
        remainder = ArithmeticSharedTensor(remainder_share, self.encoder)
        return divisor, remainder

    # -- LUT protocol entry points ----------------------------------------
    def evaluate_lut(self, lut):
        protocol = _get_protocol()
        return ArithmeticSharedTensor(
            protocol.evaluate_lut(self, lut).share, self.encoder
        )

    def evaluate_bior_lut(self, luts, scale: "ArithmeticSharedTensor", bias: int):
        protocol = _get_protocol()
        return ArithmeticSharedTensor(
            protocol.evaluate_bior_lut(self, luts, scale, bias).share, self.encoder
        )

    def evaluate_embed(self, embed: "ArithmeticSharedTensor"):
        protocol = _get_protocol()
        # pass the tensor, not the raw share: a Beaver-masked table
        # (beaver.MaskedArithmetic) keeps its reusable mask through the
        # lookup's private-x-private matmul
        out = protocol.evaluate_embed(self, embed)
        return ArithmeticSharedTensor(out.share, embed.encoder)

    # -- scale management --------------------------------------------------
    def encode_(self, new_encoder):
        return self.encode_to(new_encoder)

    def encode_to(self, new_encoder: FixedPointEncoder):
        if self.encoder.scale == new_encoder.scale:
            return ArithmeticSharedTensor(self.share, new_encoder)
        if self.encoder.scale < new_encoder.scale:
            factor = new_encoder.scale // self.encoder.scale
            return ArithmeticSharedTensor(
                self.share * ring.scalar(factor), new_encoder
            )
        factor = self.encoder.scale // new_encoder.scale
        out = self.div_trunc(factor)
        return ArithmeticSharedTensor(out.share, new_encoder)

    def encode_as(self, other: "ArithmeticSharedTensor"):
        return self.encode_to(other.encoder)

    # -- selection / structure ops (local, no comm) ------------------------
    def where(self, condition, y):
        """condition*self + (1-condition)*y (arithmetic.py:661)."""
        if _is_public(condition):
            cond = jnp.asarray(condition).astype(jnp.float64)
            y_masked = (
                y.mul(1 - cond) if isinstance(y, ArithmeticSharedTensor)
                else jnp.asarray(y) * (1 - cond)
            )
            return self.mul(cond).add(y_masked)
        one_minus = condition.neg().add(1)
        y_masked = one_minus.mul(y) if isinstance(y, ArithmeticSharedTensor) else one_minus.mul(y)
        return self.mul(condition).add(y_masked)

    def pad(self, pad_width, value=0):
        """Constant-pad; rank 0 contributes the encoded pad value."""
        encoded = int(np.uint64(self.encoder.encode(value)))
        # jnp.pad pads all dims; emulate torch's F.pad tail-dims convention
        pairs = [(0, 0)] * self.ndim
        flat = list(pad_width)
        for i in range(len(flat) // 2):
            dim = self.ndim - 1 - i
            pairs[dim] = (flat[2 * i], flat[2 * i + 1])
        if comm.get_world_size() > 1:
            pad0 = jnp.pad(self.share, pairs, constant_values=np.uint64(encoded))
            padz = jnp.pad(self.share, pairs, constant_values=np.uint64(0))
            share = jnp.where(comm.rank_signed() == 0, pad0, padz)
        else:
            share = jnp.pad(self.share, pairs, constant_values=np.uint64(encoded))
        return self.with_share(share)

    @staticmethod
    def stack(tensors, axis=0):
        enc = tensors[0].encoder
        return ArithmeticSharedTensor(
            jnp.stack([t.share for t in tensors], axis=axis), enc
        )

    @staticmethod
    def cat(tensors, axis=0):
        enc = tensors[0].encoder
        return ArithmeticSharedTensor(
            jnp.concatenate([t.share for t in tensors], axis=axis), enc
        )

    def __getitem__(self, idx):
        return self.with_share(self.share[idx])

    def index_add(self, dim, index, tensor):
        if _is_public(tensor):
            encoded = jnp.asarray(self.encoder.encode(tensor))
            if comm.get_world_size() > 1:
                mask = (comm.rank_signed() == 0).astype(jnp.uint64)
                encoded = encoded * mask
            updated = _jnp_index_add(self.share, dim, index, encoded)
        else:
            updated = _jnp_index_add(self.share, dim, index, tensor.share)
        return self.with_share(updated)

    def scatter_add(self, dim, index, other):
        if _is_public(other):
            encoded = jnp.asarray(self.encoder.encode(other))
            if comm.get_world_size() > 1:
                mask = (comm.rank_signed() == 0).astype(jnp.uint64)
                encoded = encoded * mask
            updated = _jnp_scatter_add(self.share, dim, index, encoded)
        else:
            updated = _jnp_scatter_add(self.share, dim, index, other.share)
        return self.with_share(updated)

    def scatter(self, dim, index, src):
        """Replace entries at `index` along `dim` with `src` (reference
        arithmetic.py scatter_). Both shares are local arrays, so this is a
        communication-free write; a public src is encoded and contributed by
        rank 0 only."""
        if _is_public(src):
            values = jnp.asarray(self.encoder.encode(src))
            if comm.get_world_size() > 1:
                mask = (comm.rank_signed() == 0).astype(jnp.uint64)
                values = values * mask
        else:
            values = src.share
        index = jnp.asarray(index)
        dims = jnp.meshgrid(*[jnp.arange(s) for s in index.shape], indexing="ij")
        dims[dim] = index
        sliced = jnp.broadcast_to(values, index.shape)
        return self.with_share(self.share.at[tuple(dims)].set(sliced))

    def avg_pool2d(self, kernel_size, stride=None, padding=0, ceil_mode=False):
        if ceil_mode:
            raise NotImplementedError("ceil_mode not supported for avg_pool2d")
        z = self._sum_pool2d(kernel_size, stride=stride, padding=padding)
        if isinstance(kernel_size, (int, float)):
            pool_size = int(kernel_size) ** 2
        else:
            pool_size = kernel_size[0] * kernel_size[1]
        return z.div(pool_size)

    def _sum_pool2d(self, kernel_size, stride=None, padding=0):
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        if stride is None:
            stride = kernel_size
        if isinstance(stride, int):
            stride = (stride, stride)
        if isinstance(padding, int):
            padding = (padding, padding)
        share = jax.lax.reduce_window(
            self.share,
            np.uint64(0),
            jax.lax.add,
            window_dimensions=(1, 1) + kernel_size,
            window_strides=(1, 1) + stride,
            padding=((0, 0), (0, 0), (padding[0], padding[0]), (padding[1], padding[1])),
        )
        return self.with_share(share)


def _jnp_index_add(share, dim, index, values):
    idx = [slice(None)] * share.ndim
    idx[dim] = jnp.asarray(index)
    return share.at[tuple(idx)].add(values)


def _jnp_scatter_add(share, dim, index, values):
    index = jnp.asarray(index)
    dims = jnp.meshgrid(
        *[jnp.arange(s) for s in index.shape], indexing="ij"
    )
    dims[dim] = index
    return share.at[tuple(dims)].add(values[tuple(slice(0, s) for s in index.shape)])
