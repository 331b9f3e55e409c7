"""Sequence-axis (long-context) sharding for encrypted softmax/attention.

The additive TPU design axis SURVEY §5 calls for: shard the sequence
dimension T over a mesh axis ("seq") and compute softmax over the sharded
axis blockwise — the MPC analogue of blockwise/flash softmax:

  1. shard-local encrypted max            (MPC reduction, forked RNG)
  2. all-gather the S per-shard maxima's *shares* (S tiny) and run ONE
     replicated MPC max over them         (shared RNG -> every shard
     computes the bit-identical global max; reveals repeat the same
     masked values, leaking nothing new)
  3. shard-local exp(x - m) and local sum (forked RNG)
  4. psum of the local sums' shares over "seq" — additive shares are
     linear, so the cross-shard sum is a share of the global sum and
     costs ZERO protocol rounds
  5. one replicated reciprocal of the global sum, then a shard-local
     multiply

RNG discipline is the crux: Beaver masks must differ wherever the
*secrets* differ. Ops on shard-local values run under fork_seq (keys
folded with the shard index, preserving cross-party correlation within
each shard), while ops on replicated values run under the base keys so
all shards stay bit-identical. Reusing a mask across shards on different
secrets would hand every party differences of masked values — the same
leak class as Beaver-mask reuse across scan iterations (random.py:fork).

Reference contrast: curl has no sequence parallelism (its multi-GPU story
is per-party processes); this module is mesh-native and composes with the
party axis — collectives over "seq" move shares, collectives over "party"
run the protocol.
"""

from __future__ import annotations

import contextlib

import jax
from jax import lax

from .. import random as rng
from ..mpc.mpc import MPCTensor

SEQ_AXIS = "seq"

# fork-index offset for per-shard streams; block scans use small indices,
# the fold-scan head uses >= 2**20, sequence shards use >= 3 * 2**20
_SEQ_FORK_BASE = 3 * (1 << 20)


@contextlib.contextmanager
def fork_seq(axis_name: str = SEQ_AXIS):
    """Per-shard protocol randomness: fold the shard index into all keys."""
    with rng.fork(lax.axis_index(axis_name) + _SEQ_FORK_BASE):
        yield


def _gather_shares(x: MPCTensor, axis_name: str) -> MPCTensor:
    """All-gather an MPCTensor's shares over a mesh axis -> new leading dim.

    Valid for any linear share representation (additive, RSS limbs): the
    gather is pure data movement of shares."""
    share = jax.tree_util.tree_map(
        lambda a: lax.all_gather(a, axis_name, axis=0), x.share
    )
    return MPCTensor.from_shares(share, precision=x.encoder.precision_bits)


def _psum_shares(x: MPCTensor, axis_name: str) -> MPCTensor:
    """Sum an MPCTensor's shares over a mesh axis (zero protocol rounds:
    addition is linear in the shares)."""
    share = jax.tree_util.tree_map(lambda a: lax.psum(a, axis_name), x.share)
    return MPCTensor.from_shares(share, precision=x.encoder.precision_bits)


def sharded_softmax(x: MPCTensor, dim: int = -1, axis_name: str = SEQ_AXIS):
    """Softmax over a dimension that is SHARDED across `axis_name`.

    `x` holds the local shard (local length along `dim`); returns the local
    shard of softmax computed as if the full axis were resident. Decoded
    parity with the unsharded functions/approximations.py softmax is
    asserted by tests/test_sequence_parallel.py.
    """
    from ..config import cfg

    dim = dim + x.dim() if dim < 0 else dim

    # 1. shard-local max (keepdim) — local secrets, forked randomness
    with fork_seq(axis_name):
        local_max = x.max(dim, keepdim=True)[0]

    # 2. replicated global max over the S gathered shard-maxima
    gathered = _gather_shares(local_max, axis_name)  # (S, ..., 1)
    global_max = gathered.max(0, keepdim=False)[0]

    # 3. shard-local exp + local sum
    with fork_seq(axis_name):
        logits = x - global_max
        with cfg.temp_override({"functions.exp_all_neg": True}):
            numerator = logits.exp()
        local_sum = numerator.sum(axis=dim, keepdim=True)

    # 4. global sum: free on shares
    total = _psum_shares(local_sum, axis_name)

    # 5. replicated reciprocal, shard-local product
    with cfg.temp_override({"functions.reciprocal_all_pos": True}):
        inv = total.reciprocal()
    with fork_seq(axis_name):
        return numerator * inv


def sharded_attention_scores(q: MPCTensor, k: MPCTensor, axis_name: str = SEQ_AXIS):
    """(q_local @ k_full^T) softmaxed blockwise: gathers K's shares (ring
    all-gather over `axis_name`), computes the local query block's scores
    against all keys, then sharded softmax is unnecessary — the score axis
    is fully resident per query block. This is the MPC analogue of ring
    attention's K/V gather with blockwise queries."""
    k_full = _gather_shares(k, axis_name)  # (S, *lead, Tk_local, D)
    nd = k_full.dim()
    # move the gathered shard axis next to the local key axis, then merge:
    # (S, *lead, T, D) -> (*lead, S, T, D) -> (*lead, S*T, D)
    perm = tuple(range(1, nd - 2)) + (0, nd - 2, nd - 1)
    k_full = k_full.permute(*perm)
    s = k_full.shape
    k_flat = k_full.reshape(*s[: nd - 3], s[-3] * s[-2], s[-1])
    with fork_seq(axis_name):
        return q.matmul(k_flat.transpose(-1, -2))


