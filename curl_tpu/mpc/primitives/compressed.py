"""Seed-compressed 2PC arithmetic shares: halve at-rest share memory.

A fresh additive sharing of w is (w - r, r) with r uniform. Since r is
pure PRG output, party 1's share never needs to be MATERIALIZED at rest:
store (share0 = w - r, key) and regenerate r inside the compiled program at
the point of use. This is the standard seed-compression trick for secret
shares (used by real MPC deployments to halve share storage/shipping) and
is the enabler for GPT-Neo-scale private inference on one 16 GB TPU chip:
1.3B params x 8 B x 2 parties = 21 GB of materialized shares does not fit,
but 10.5 GB of share0 + per-block PRG expansion does.

Design notes (TPU-first):
  * ``share`` is a PROPERTY that expands lazily inside the party trace:
    lane p gets ``where(rank == 0, share0, r)``. Under the vmap runtime the
    expansion is a per-lane transient — placed inside a lax.scan body
    (scan_identical_blocks / scan_chunked), XLA frees it between
    iterations, so the live set is one block's weights, not the model's.
  * The PRG impl is pinned at construction (aux data), not read from
    config at expansion time: the bits that reconstruct w are the bits
    drawn when share0 was computed, whatever the session config says later.
  * 2PC only, inference-oriented (parameters enter as plain MPCTensor
    wrappers with requires_grad=False; training needs materialized shares).

The reference has no analogue (CrypTen/Curl materialize every share;
reference curl/mpc/primitives/arithmetic.py:69-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import comm
from ...encoder import FixedPointEncoder
from .arithmetic import ArithmeticSharedTensor


def bits_for_impl(key, shape, impl: str):
    """Uniform uint64 bits from ``key`` using a PINNED implementation."""
    if impl == "pallas_tpu":
        from ...ops import pallas_rng

        return pallas_rng.pallas_random_bits_u64(
            pallas_rng.seed_from_key(key), shape
        )
    if impl == "rbg":
        from ... import random as crng

        # one RngBitGenerator op keyed by (key, 0): the per-tensor key is
        # the whole stream identity, so the draw counter is fixed at 0
        return crng._rbg_bits_u64(key, 0, tuple(shape))
    return jax.random.bits(key, shape, dtype=jnp.uint64)


def default_impl() -> str:
    """Pick the PRG impl the session's bulk-RNG dispatch would use, so
    encrypt-time r and trace-time expansion are generated the same way.

    Mirrors random._bulk_rng_impl(): "pallas_tpu" when explicitly
    configured on TPU, "rbg" when configured or selected by "auto" on the
    TPU backend (the round-4 default — fastest measured and ~4x smaller
    HLO), threefry ("xla") otherwise (CPU keeps recorded test streams
    stable). The choice is PINNED at encrypt time; later config changes
    cannot desync expansion (bits_for_impl is keyed by the stored impl).
    """
    from ... import random as crng

    impl = crng._bulk_rng_impl()
    on_tpu = jax.default_backend() == "tpu"
    if impl == "pallas_tpu" and on_tpu:
        return "pallas_tpu"
    if impl == "rbg" or (impl == "auto" and on_tpu):
        return "rbg"
    return "xla"


@jax.tree_util.register_pytree_node_class
class SeedCompressedArithmetic(ArithmeticSharedTensor):
    """2PC ArithmeticSharedTensor whose party-1 share is PRG(key).

    share0: uint64 array (w_encoded - r); key: PRNG key array.
    Every inherited op reads ``self.share`` (the lazy expansion) and
    returns a plain ArithmeticSharedTensor via with_share().
    """

    __slots__ = ("share0_lo", "share0_hi", "key", "_impl")

    def __init__(self, share0_lo, share0_hi, key, encoder: FixedPointEncoder,
                 impl: str):
        # deliberately NOT calling super().__init__ — `share` is a property.
        # share0 is stored as uint32 (lo, hi) PLANES, not uint64: on TPU the
        # X64 emulation splits every uint64 program INPUT into u32-pair
        # temporaries (X64SplitLow custom-calls) — a full second copy of the
        # resident weights, which is exactly the memory this class exists
        # to save (measured: GPT-Neo's 11.3 GB of share0 inputs spawned
        # ~11 GB of split temps and OOM'd). u32 inputs split nothing.
        self.share0_lo = share0_lo
        self.share0_hi = share0_hi
        self.key = key
        self.encoder = encoder
        self._impl = impl

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.share0_lo, self.share0_hi, self.key), (
            self.encoder.precision_bits,
            self._impl,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, FixedPointEncoder(aux[0]), aux[1])

    # -- construction ------------------------------------------------------
    @classmethod
    def encrypt(cls, value, key, precision=None, impl=None):
        """Share plaintext ``value`` (party 0's data) under seed compression.

        Computes r = PRG(key) ONCE to form share0 = encode(value) - r, then
        discards r. Runs outside any party context (host/encrypt time).
        """
        impl = impl or default_impl()
        enc = FixedPointEncoder(precision)
        value = jnp.asarray(value)
        if jnp.issubdtype(value.dtype, jnp.integer) and precision != 0:
            value = value.astype(jnp.float64)
        encoded = jnp.asarray(enc.encode(value))
        r = bits_for_impl(key, encoded.shape, impl)
        share0 = encoded - r
        lo = (share0 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (share0 >> jnp.uint64(32)).astype(jnp.uint32)
        return cls(lo, hi, key, enc, impl)

    # -- lazy expansion ----------------------------------------------------
    @property
    def share0(self):
        """The resident share reassembled to uint64 (in-trace view)."""
        return (
            self.share0_hi.astype(jnp.uint64) << jnp.uint64(32)
        ) | self.share0_lo.astype(jnp.uint64)

    @property
    def share(self):
        """This lane's materialized share (party trace only, 2PC)."""
        ws = comm.get_world_size()
        if ws > 2:
            # share0 + r telescopes only over exactly two lanes; at ws>2
            # every extra lane would add another r and decode garbage
            # silently. Enforced here — the single consumption choke point.
            raise RuntimeError(
                f"seed-compressed shares are 2PC-only (world_size={ws}): "
                "party 1's share is PRG(key) and parties 2.. would "
                "duplicate it, decoding garbage. Use materialized shares "
                "(encrypt with seed_compress=False) for ws > 2."
            )
        share0 = self.share0
        r = bits_for_impl(self.key, share0.shape, self._impl)
        if ws == 1:
            return share0 + r  # degenerate: the plain encoding
        is0 = (comm.rank_signed() == 0).astype(jnp.uint64)
        # both lanes compute both operands; select is lane-local
        return is0 * share0 + (jnp.uint64(1) - is0) * r

    @property
    def shape(self):
        return self.share0_lo.shape

    @property
    def ndim(self):
        return self.share0_lo.ndim

    def with_share(self, share) -> ArithmeticSharedTensor:
        return ArithmeticSharedTensor(share, self.encoder)
