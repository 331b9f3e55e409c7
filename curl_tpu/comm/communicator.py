"""Party-axis communicator: MPC collectives as JAX named-axis primitives.

The reference exchanges shares over torch.distributed/Gloo with an abstract
``Communicator`` (reference: curl/communicator/communicator.py:14,
distributed_communicator.py:54-64). The TPU-native design instead makes the
MPC *party* a named mesh axis:

  * simulated parties  -> ``jax.vmap(fn, axis_name="party")`` on one chip
  * real parties       -> ``jax.shard_map`` over a Mesh axis "party";
                          collectives ride ICI/DCN as XLA AllReduce et al.

Protocol code is written ONCE against this module; the axis binding decides
whether a reveal is a vectorized sum or a cross-chip AllReduce. Mapping of
the reference's Gloo primitives:

  reference                         here
  ---------------------------------------------------------------
  all_reduce(SUM)  (reveal)         all_sum      -> lax.psum
  all_reduce(BXOR) (binary reveal)  all_xor      -> all_gather + xor tree
  broadcast(src)                    broadcast    -> psum of masked value
  gather / all_gather               all_gather_stack -> lax.all_gather
  isend/irecv ring (seed sync)      ppermute     -> lax.ppermute
  scatter                           scatter      -> masked selection from stack

Communication stats (rounds/bytes) are counted at *trace time* by wrapping
each collective — the analogue of the reference's ``_logging`` decorator
(communicator.py:118-203). Counters accumulate while a protocol function is
being traced; reset + read around a trace to get per-step round/byte counts.
"""

from __future__ import annotations

import contextlib
import functools
import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import lax

PARTY_AXIS = "party"

# world size is static per protocol context (set by the runtime in
# curl_tpu.init / runners); collectives need it for ring permutations.
_WORLD_SIZE = 1

# which binding is executing protocol code: "vmap" (simulated parties on one
# chip — the party axis is a vmap axis) or "shard_map" (one party per
# device). Some fused kernels rely on the party axis being a *vmap* axis
# (custom_vmap batching rules) and must not engage under shard_map.
_RUNTIME = "vmap"


def set_world_size(n: int):
    global _WORLD_SIZE
    _WORLD_SIZE = int(n)


def get_world_size() -> int:
    return _WORLD_SIZE


def set_runtime(kind: str):
    global _RUNTIME
    assert kind in ("vmap", "shard_map"), kind
    _RUNTIME = kind


def get_runtime() -> str:
    return _RUNTIME


def rank():
    """Traced per-party rank (inside a party context) or 0 if world_size==1."""
    if _WORLD_SIZE < 2:
        return jnp.uint64(0)
    return lax.axis_index(PARTY_AXIS).astype(jnp.uint64)


def rank_signed():
    if _WORLD_SIZE < 2:
        return jnp.int32(0)
    return lax.axis_index(PARTY_AXIS)


# ---------------------------------------------------------------------------
# Stats
# ---------------------------------------------------------------------------

@dataclass
class CommStats:
    rounds: int = 0
    bytes: int = 0
    calls: dict = field(default_factory=dict)

    def reset(self):
        self.rounds = 0
        self.bytes = 0
        self.calls = {}


comm_stats = CommStats()


def _count(name, *arrays):
    comm_stats.rounds += 1
    nbytes = sum(int(getattr(a, "size", 0)) * a.dtype.itemsize for a in arrays)
    comm_stats.bytes += nbytes
    comm_stats.calls[name] = comm_stats.calls.get(name, 0) + 1


def register_virtual(name, nbytes, rounds=1):
    """Account communication a fused kernel performs internally: the same
    messages/bytes as the composable protocol path, executed inside one
    device kernel (e.g. ops/pallas_max_step.py). Keeps trace-time
    round/byte profiles honest when fusion is enabled."""
    for _ in range(rounds):
        comm_stats.rounds += 1
        comm_stats.calls[name] = comm_stats.calls.get(name, 0) + 1
    comm_stats.bytes += int(nbytes)


def reset_communication_stats():
    comm_stats.reset()


def get_communication_stats():
    """Snapshot of the trace-time communication counters as a plain dict.

    Convenience accessor over the reference surface (the reference exposes
    only print/reset, communicator.py:118-131; CrypTen-era code also read
    the raw counters)."""
    return {
        "rounds": comm_stats.rounds,
        "bytes": comm_stats.bytes,
        "calls": dict(comm_stats.calls),
    }


def print_communication_stats():
    logging.info("====Communication Stats====")
    logging.info("Rounds: %d", comm_stats.rounds)
    logging.info("Bytes: %d", comm_stats.bytes)
    for k, v in sorted(comm_stats.calls.items()):
        logging.info("  %s: %d", k, v)


# ---------------------------------------------------------------------------
# Collectives
# ---------------------------------------------------------------------------

def _tree_count(name, tree):
    # one round per collective invocation (a batched reveal is ONE round,
    # matching the reference's reveal_batch accounting); bytes sum leaves
    _count(name, *jax.tree_util.tree_leaves(tree))


def all_sum(x):
    """Reveal-sum over the party axis (arithmetic share reconstruction)."""
    if _WORLD_SIZE < 2:
        return x
    _tree_count("all_sum", x)
    return jax.tree_util.tree_map(lambda a: lax.psum(a, PARTY_AXIS), x)


def all_xor(x):
    """XOR-reduce over the party axis (binary share reconstruction)."""
    if _WORLD_SIZE < 2:
        return x
    _tree_count("all_xor", x)

    def one(a):
        g = lax.all_gather(a, PARTY_AXIS)
        out = g[0]
        for i in range(1, _WORLD_SIZE):
            out = out ^ g[i]
        return out

    return jax.tree_util.tree_map(one, x)


def all_gather_stack(x):
    """All-gather over the party axis; returns arrays with leading P dim."""
    if _WORLD_SIZE < 2:
        return jax.tree_util.tree_map(lambda a: a[None], x)
    _tree_count("all_gather", x)
    return jax.tree_util.tree_map(lambda a: lax.all_gather(a, PARTY_AXIS), x)


def gather(x, dst: int):
    """Gather to party ``dst``; other parties see zeros-shaped stack.

    In SPMD there is no true single-destination gather without breaking the
    program's single-trace property, so this is all_gather with the caller
    masking on rank where needed (same data movement cost on ICI).
    """
    return all_gather_stack(x)


def broadcast(x, src: int):
    """Broadcast src party's value to all parties."""
    if _WORLD_SIZE < 2:
        return x
    _tree_count("broadcast", x)

    def one(a):
        mask = (lax.axis_index(PARTY_AXIS) == src)
        if jnp.issubdtype(a.dtype, jnp.integer) or a.dtype == jnp.bool_:
            za = jnp.where(mask, a, jnp.zeros_like(a))
            return lax.psum(za, PARTY_AXIS)
        return lax.psum(jnp.where(mask, a, jnp.zeros_like(a)), PARTY_AXIS)

    return jax.tree_util.tree_map(one, x)


def scatter(stacked, src: int):
    """Party i receives stacked[i]; stacked only meaningful on ``src``.

    reference: communicator scatter used by TFP wrap_rng
    (tfp_provider.py:64). Implemented as broadcast-from-src + local select,
    which on a TPU mesh is one AllReduce of the stack.
    """
    if _WORLD_SIZE < 2:
        return jax.tree_util.tree_map(lambda a: a[0], stacked)
    stacked = broadcast(stacked, src)
    r = lax.axis_index(PARTY_AXIS)

    def one(a):
        return lax.dynamic_index_in_dim(a, r, axis=0, keepdims=False)

    return jax.tree_util.tree_map(one, stacked)


def ppermute(x, shift: int = 1):
    """Ring-pass: each party sends to (rank + shift) % P, receives likewise."""
    if _WORLD_SIZE < 2:
        return x
    _tree_count("ppermute", x)
    perm = [(i, (i + shift) % _WORLD_SIZE) for i in range(_WORLD_SIZE)]
    return jax.tree_util.tree_map(lambda a: lax.ppermute(a, PARTY_AXIS, perm), x)
