"""Party execution runtimes: one protocol codebase, two bindings.

Protocol code in curl_tpu is written *per-party*: share arrays carry no party
dimension, collectives are named-axis ops on ``comm.PARTY_AXIS``. This module
binds that code to hardware:

  * ``run_parties``  — simulated parties on one host/chip via
    ``jax.vmap(axis_name="party")``. All parties' shares live in one stacked
    array; reveals become vectorized reductions. This replaces the
    reference's thread-based InProcessCommunicator
    (reference: curl/communicator/in_process_communicator.py:19) but is a
    single XLA program: the whole multi-party protocol JIT-compiles into one
    fused graph — the idiomatic TPU answer to multi-party simulation.

  * ``run_parties_spmd`` — real party-parallelism via ``jax.shard_map`` over
    a Mesh axis "party" (one party per chip/host); collectives become XLA
    AllReduce/CollectivePermute over ICI/DCN. This replaces Gloo
    (reference: curl/communicator/distributed_communicator.py:54).

Both take stacked (P, ...) inputs for shares and unstacked values for public
arguments (mark with ``Public``).
"""

from __future__ import annotations

import contextlib
import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import comm
from .. import random as rng


@dataclass
class Public:
    """Wrapper marking an argument as public (identical across parties)."""

    value: Any


@contextlib.contextmanager
def mpc_context(keys, world_size: int, runtime: str = "vmap"):
    """Bind PRNG keys + world size (+ runtime binding kind) for protocol
    code in this thread. ``runtime="shard_map"`` disables fused kernels
    whose protocol math lives in a custom_vmap batching rule over the
    party axis (no vmap axis exists under shard_map)."""
    old_ws = comm.get_world_size()
    old_rt = comm.get_runtime()
    comm.set_world_size(world_size)
    comm.set_runtime(runtime)
    try:
        with rng.KeyContext(keys):
            yield
    finally:
        comm.set_world_size(old_ws)
        comm.set_runtime(old_rt)


def _arg_axes(a):
    """vmap in_axes for one arg pytree: 0 for party-stacked leaves, None
    for seed-compressed parameter subtrees (share0/key are party-invariant
    — the whole point of compression is ONE resident copy, expanded
    per-lane at use; see mpc/primitives/compressed.py)."""
    from ..mpc.mpc import MPCTensor
    from ..mpc.primitives.compressed import SeedCompressedArithmetic

    def is_node(x):
        return isinstance(x, (MPCTensor, SeedCompressedArithmetic))

    def axis(x):
        t = x._tensor if isinstance(x, MPCTensor) else x
        return None if isinstance(t, SeedCompressedArithmetic) else 0

    tree = jax.tree_util.tree_map(axis, a, is_leaf=is_node)
    if not any(
        v is None
        for v in jax.tree_util.tree_leaves(tree, is_leaf=lambda v: v is None)
    ):
        return 0
    return tree


def _split_args(args):
    in_axes = []
    vals = []
    for a in args:
        if isinstance(a, Public):
            vals.append(a.value)
            in_axes.append(None)
        else:
            vals.append(a)
            in_axes.append(_arg_axes(a))
    return vals, in_axes


def run_parties(fn, world_size: int, seed, *args, jit: bool = False):
    """Run ``fn`` as ``world_size`` simulated parties (vmap over party axis).

    args: pytrees whose leaves are stacked (P, ...) per-party values, or
    ``Public(x)`` for unreplicated public values. Returns stacked outputs.
    """
    keys = rng.make_party_keys(seed, world_size, stacked=False)
    vals, in_axes = _split_args(args)

    def party_fn(party_keys, *inner):
        with mpc_context(party_keys, world_size):
            return fn(*inner)

    mapped = jax.vmap(
        party_fn, in_axes=(rng.KEY_AXES,) + tuple(in_axes),
        axis_name=comm.PARTY_AXIS,
    )
    if jit:
        mapped = jax.jit(mapped)
    return mapped(keys, *vals)


def compile_parties(fn, world_size: int, jit: bool = True):
    """Build a reusable compiled runner: (seed, *stacked_args) -> stacked out.

    The returned callable is jitted once; pass a fresh seed per invocation
    for fresh protocol randomness.
    """

    def wrapper(seed, *args):
        keys = rng.make_party_keys(seed, world_size, stacked=False)
        vals, in_axes = _split_args(args)

        def party_fn(party_keys, *inner):
            with mpc_context(party_keys, world_size):
                return fn(*inner)

        return jax.vmap(
            party_fn, in_axes=(rng.KEY_AXES,) + tuple(in_axes),
            axis_name=comm.PARTY_AXIS,
        )(keys, *vals)

    return jax.jit(wrapper) if jit else wrapper


def compile_parties_cached(fn, world_size: int, seed, *args):
    """Offline/online split compilation (the reference's tuple-cache mode,
    curl/mpc/provider/provider.py:47-157, as a two-program pipeline):

      1. trace `fn` once recording every tuple request,
      2. compile + run the offline program generating all tuples
         (the dealer phase — can run ahead of time / on the dealer's host),
      3. compile the online program taking the tuple stream as an argument.

    Returns (online_step, fill_offline) where:
      online_step(seed, cache_entries, *stacked_args) -> stacked outputs
      fill_offline(seed) -> cache_entries   (jit-compiled offline program)
    """
    from ..mpc import get_default_provider

    provider = get_default_provider()

    # 1. record requests with a throwaway trace
    provider.requests = []
    provider.trace(True)
    try:
        jax.eval_shape(
            lambda s, *a: _run_with_keys(fn, world_size, s, list(a)),
            rng.make_party_keys(seed, world_size),
            *[a for a in args],
        )
    finally:
        provider.trace(False)

    requests = list(provider.requests)

    # 2. offline program: generate all recorded tuples
    def offline(s):
        keys = rng.make_party_keys(s, world_size, stacked=False)

        def party_fn(party_keys):
            with mpc_context(party_keys, world_size):
                provider.requests = requests
                return provider.fill_cache_entries()

        return jax.vmap(
            party_fn, in_axes=(rng.KEY_AXES,), axis_name=comm.PARTY_AXIS
        )(keys)

    fill_offline = jax.jit(offline)

    # 3. online program: serve tuples from the cache argument
    def online(s, cache_entries, *online_args):
        from ..mpc.provider.provider import TupleCache

        keys = rng.make_party_keys(s, world_size, stacked=False)
        vals, in_axes = _split_args(online_args)

        def party_fn(party_keys, entries, *inner):
            with mpc_context(party_keys, world_size):
                provider.attach_serving_cache(TupleCache(list(entries)))
                try:
                    return fn(*inner)
                finally:
                    provider.attach_serving_cache(None)

        return jax.vmap(
            party_fn, in_axes=(rng.KEY_AXES, 0) + tuple(in_axes),
            axis_name=comm.PARTY_AXIS,
        )(keys, cache_entries, *vals)

    return jax.jit(online), fill_offline


def _key_axes_for(keys):
    """vmap in_axes for a party-keys pytree: per-leaf KEY_AXES when the
    party-invariant global/dealer keys are UNSTACKED (one ndim below the
    per-party streams), plain 0 for the fully stacked form."""
    if (
        isinstance(keys, dict)
        and "global" in keys
        and "local" in keys
        and getattr(keys["global"], "ndim", None) is not None
        and keys["global"].ndim == keys["local"].ndim - 1
    ):
        return {k: rng.KEY_AXES.get(k, 0) for k in keys}
    return 0


def _run_with_keys(fn, world_size, keys, args):
    vals, in_axes = _split_args(args)

    def party_fn(party_keys, *inner):
        with mpc_context(party_keys, world_size):
            return fn(*inner)

    return jax.vmap(
        party_fn, in_axes=(_key_axes_for(keys),) + tuple(in_axes),
        axis_name=comm.PARTY_AXIS,
    )(keys, *vals)


def shard_map_parties(fn, mesh, world_size: int):
    """Bind ``fn`` over the 'party' axis of ``mesh`` with shard_map.

    Input shares must be stacked (P, ...) and are sharded so each party's
    slice lives on its own device; inside, the leading axis of size 1 is
    squeezed so protocol code sees per-party shapes identical to vmap mode.
    """
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map as _shard_map_mod  # jax >= 0.7 style

        shard_map = _shard_map_mod
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def wrapper(keys, *args):
        vals, in_axes = _split_args(args)
        specs = tuple(
            jax.tree_util.tree_map(lambda _: P(comm.PARTY_AXIS) if ax == 0 else P(), v)
            for v, ax in zip(vals, in_axes)
        )

        def local_fn(party_keys, *inner):
            party_keys = jax.tree_util.tree_map(lambda a: a[0], party_keys)
            inner = [
                jax.tree_util.tree_map(lambda a: a[0], x) if ax == 0 else x
                for x, ax in zip(inner, in_axes)
            ]
            with mpc_context(party_keys, world_size, runtime="shard_map"):
                out = fn(*inner)
            return jax.tree_util.tree_map(lambda a: jnp.asarray(a)[None], out)

        key_spec = jax.tree_util.tree_map(lambda _: P(comm.PARTY_AXIS), keys)
        sm = shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(key_spec,) + specs,
            out_specs=P(comm.PARTY_AXIS),
            check_vma=False,
        )
        return sm(keys, *vals)

    return wrapper


def run_parties_spmd(fn, mesh, world_size: int, seed, *args, jit: bool = True):
    """Run fn with real party-parallelism over ``mesh`` axis 'party'."""
    keys = rng.make_party_keys(seed, world_size)
    wrapped = shard_map_parties(fn, mesh, world_size)
    if jit:
        wrapped = jax.jit(wrapped)
    return wrapped(keys, *args)
