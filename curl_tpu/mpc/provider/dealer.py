"""Stand-alone dealer: fill tuple caches in a separate process and ship
per-party slices.

The reference runs its TTP as a real server process at rank == world_size
with its own RNG and a request loop (reference:
curl/mpc/provider/ttp_provider.py:256-306, TTPServer). The TPU-native
equivalent keeps the *physical* separation but replaces the per-request
socket round-trips with the offline/online split that the TupleCache
already implements:

  1. A party session records its tuple requests at trace time and ships
     the request file to the dealer (``TupleProvider.save_requests``).
  2. The dealer process — this module's CLI (``scripts/dealer.py``) —
     replays the requests with ITS OWN randomness (its session seed never
     leaves its host) and writes ONE CACHE FILE PER PARTY, each containing
     only that party's share slices.
  3. Each party loads its own file; the online program consumes the
     entries positionally. Under the fused simulated runtime the host
     stacks the slices (it already holds all parties' shares); under the
     shard_map SPMD runtime the party-axis sharding places each party's
     slice on that party's device, so no party ever materializes another
     party's slice.

Unlike the in-trace TTP provider (ttp_provider.py:17-21), no party ever
traces or executes the dealer's sampling code — tuples arrive as data.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ... import comm
from ... import random as rng
from .provider import TupleCache


def fill_standalone(requests, world_size: int, seed, provider=None):
    """Generate all `requests` in the calling (dealer) process.

    Returns party-stacked entries: every array leaf has leading dim
    ``world_size`` (slice r is party r's share). The sampling runs under
    the dealer's own key tree derived from ``seed``.
    """
    from ...parallel.runner import mpc_context
    from .. import get_default_provider

    provider = provider or get_default_provider()
    keys = rng.make_party_keys(seed, world_size)
    saved_requests = provider.requests
    saved_tracing = provider.tracing

    def party_fn(party_keys):
        with mpc_context(party_keys, world_size):
            provider.requests = list(requests)
            return provider.fill_cache_entries()

    try:
        entries = jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(keys)
    finally:
        provider.requests = saved_requests
        provider.tracing = saved_tracing
    return entries


def save_party_caches(entries, prefix: str, world_size: int):
    """Write `{prefix}.party{r}.npz` for each party r.

    Each file holds only party r's slice of every leaf (axis 0 is the
    party axis of the stacked fill output) — the artifact that gets
    shipped to party r's host.
    """
    leaves, treedef = jax.tree_util.tree_flatten(entries)
    td = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    paths = []
    for r in range(world_size):
        path = f"{prefix}.party{r}.npz"
        np.savez(
            path,
            *[np.asarray(leaf)[r] for leaf in leaves],
            __treedef__=td,
            __meta__=np.array([world_size, r], dtype=np.int64),
        )
        paths.append(path)
    return paths


def _load_party_file(path):
    from ...utils.serial import restricted_loads

    data = np.load(path)
    treedef = restricted_loads(bytes(data["__treedef__"]))
    ws, party = (int(v) for v in data["__meta__"])
    leaves = [data[k] for k in data.files if not k.startswith("__")]
    return leaves, treedef, ws, party


def load_party_caches(paths) -> TupleCache:
    """Assemble a party-stacked TupleCache from per-party dealer files.

    ``paths`` must cover every party exactly once (any order; the embedded
    party index orders them). The result feeds the same serve path as
    ``fill_cache``: vmap slices axis 0 per party in the fused runtime, and
    the shard_map runtime shards axis 0 over the party mesh axis.
    """
    loaded = {}
    world_size = None
    treedef = None
    for path in paths:
        leaves, td, ws, party = _load_party_file(path)
        if world_size is None:
            world_size, treedef = ws, td
        if ws != world_size:
            raise ValueError(
                f"{path}: world_size {ws} != expected {world_size}"
            )
        if party in loaded:
            raise ValueError(f"duplicate cache file for party {party}")
        loaded[party] = leaves
    missing = set(range(world_size)) - set(loaded)
    if missing:
        raise ValueError(f"missing cache files for parties {sorted(missing)}")
    stacked = [
        jnp.stack([jnp.asarray(loaded[r][i]) for r in range(world_size)])
        for i in range(len(loaded[0]))
    ]
    entries = jax.tree_util.tree_unflatten(treedef, stacked)
    return TupleCache(entries=entries)


def attach_party_caches(paths, provider=None) -> TupleCache:
    """Load dealer-produced per-party files and make them the active cache."""
    from .. import get_default_provider

    provider = provider or get_default_provider()
    cache = load_party_caches(paths)
    provider.attach_cache(cache)
    return cache
