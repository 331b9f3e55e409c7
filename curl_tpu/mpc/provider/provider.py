"""TupleProvider base: request tracing + offline tuple cache, jit-native.

The reference interposes __getattribute__ to record tuple requests and serve
them from a prefilled cache (reference: curl/mpc/provider/provider.py:
114-157). The TPU-native equivalent must work *inside* a jit trace, where a
Python-side cache pop would bake tuples in as constants. Design:

  * trace mode: provider methods record (func, shapes, kwargs) at trace time
    while still generating inline (so tracing runs produce valid results).
  * fill_cache(): replays the recorded requests inside a dedicated party
    program whose outputs are the tuple pytrees — the offline phase as one
    XLA computation.
  * serve mode: the compiled online step takes the cache as an *argument*;
    provider methods pop entries positionally at trace time. Trace order is
    deterministic, so request N of the online trace aligns with entry N of
    the offline run.

This turns Curl's tuple cache into what it conceptually is on TPU: an
offline-generated stream of correlated randomness living in HBM.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any, List, Optional

TRACEABLE_FUNCTIONS = [
    "generate_additive_triple",
    "square",
    "generate_binary_triple",
    "wrap_rng",
    "B2A_rng",
    "generate_one_hot",
    "generate_lut_masks",
    "egk_trunc_pr_rng",
]


@dataclass
class TupleRequest:
    func: str
    args: tuple
    kwargs: tuple


@dataclass
class TupleCache:
    """Positional stream of precomputed tuple pytrees (per-party leaves)."""

    entries: List[Any] = field(default_factory=list)
    cursor: int = 0

    def pop(self):
        if self.cursor >= len(self.entries):
            raise RuntimeError(
                "tuple cache exhausted — online trace requests more tuples "
                "than were prefilled"
            )
        out = self.entries[self.cursor]
        self.cursor += 1
        return out

    def reset(self):
        self.cursor = 0


def _make_traced(fname, fn):
    def wrapper(self, *args, **kwargs):
        return self._serve_or(fname, lambda: fn(self, *args, **kwargs), args, kwargs)

    wrapper.__name__ = fname
    wrapper.__wrapped__ = fn
    return wrapper


class TupleProvider:
    """Base provider with trace/cache interposition.

    Subclass methods named in TRACEABLE_FUNCTIONS are wrapped automatically
    (the analogue of the reference's __getattribute__ interposition,
    provider.py:114-157)."""

    NAME: str = "base"

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        for fname in TRACEABLE_FUNCTIONS:
            fn = cls.__dict__.get(fname)
            if fn is not None and not hasattr(fn, "__wrapped__"):
                setattr(cls, fname, _make_traced(fname, fn))

    def __init__(self):
        self.tracing: bool = False
        self.requests: List[TupleRequest] = []
        self._active_cache: Optional[TupleCache] = None
        self._serving_cache: Optional[TupleCache] = None

    # -- trace / cache management (reference provider.py:28-157) -----------
    def trace(self, tracing: bool = True):
        self.tracing = tracing

    def trace_once(self):
        untraced = len(self.requests) == 0
        self.trace(untraced)

    def record_request(self, func, args, kwargs):
        self.requests.append(
            TupleRequest(func, args, tuple(sorted(kwargs.items())))
        )

    def attach_cache(self, cache: Optional[TupleCache]):
        """Host-side: store the party-stacked prefilled entries. The runtime
        feeds them into each traced program as vmapped arguments and binds a
        per-party serving view via attach_serving_cache."""
        self._active_cache = cache
        if cache is not None:
            cache.reset()

    def attach_serving_cache(self, cache: Optional[TupleCache]):
        """Trace-side: bind per-party cache views for the current trace."""
        self._serving_cache = cache

    def _serve_or(self, func_name, generate_fn, args, kwargs):
        serving = getattr(self, "_serving_cache", None)
        if serving is not None:
            return serving.pop()
        if self.tracing:
            self.record_request(func_name, args, kwargs)
        return generate_fn()

    def fill_cache_entries(self):
        """Generate all recorded requests in order; returns list of tuples.

        Call inside a party context (e.g. via run_parties) and wrap the
        result in a TupleCache; feed that cache to the online step.
        """
        entries = []
        was_tracing = self.tracing
        self.tracing = False
        try:
            for req in self.requests:
                fn = getattr(self, req.func)
                entries.append(fn(*req.args, **dict(req.kwargs)))
        finally:
            self.tracing = was_tracing
        return entries

    def save_requests(self, path):
        with open(path, "wb") as f:
            pickle.dump(self.requests, f)

    def load_requests(self, path):
        from ...utils.serial import restricted_loads

        with open(path, "rb") as f:
            self.requests = restricted_loads(f.read())

    # -- cache persistence (reference provider.py:62-112) -------------------
    def save_cache(self, path):
        """Persist prefilled tuple entries (the offline-phase checkpoint)."""
        import jax
        import numpy as np

        if self._active_cache is None:
            raise RuntimeError("no active cache to save")
        leaves, treedef = jax.tree_util.tree_flatten(self._active_cache.entries)
        np.savez(
            path,
            *[np.asarray(leaf) for leaf in leaves],
            __treedef__=np.frombuffer(
                pickle.dumps(treedef), dtype=np.uint8
            ),
        )

    def load_cache(self, path):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from ...utils.serial import restricted_loads

        data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
        treedef = restricted_loads(bytes(data["__treedef__"]))
        leaves = [
            jnp.asarray(data[k]) for k in data.files if k != "__treedef__"
        ]
        entries = jax.tree_util.tree_unflatten(treedef, leaves)
        cache = TupleCache(entries=entries)
        self.attach_cache(cache)
        return cache
