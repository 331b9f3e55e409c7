"""Lazy eager batching: record per-op protocol calls, flush as ONE program.

The reference framework's primary UX is eager per-op dispatch
(reference: curl/mpc/mpc.py method surface). On the remote-TPU platform an
eager op costs a host<->device tunnel round trip (~30 ms floor), so per-op
eager is not production-viable there (round-1 finding). This module is the
TPU-first answer, and has no reference counterpart:

    with curl_tpu.lazy():
        h = (x @ w + b).gelu()
        p = h.softmax(-1)
    print(p.get_plain_text())      # ONE fused device program ran

Inside the scope, ``_eager_run`` records each op on a tape instead of
dispatching: the op is abstractly shape-evaluated (jax.eval_shape — no
device work), and pending CrypTensors carrying the abstract result are
returned, so shapes/dtypes/ptypes remain queryable without execution. The
first materialization (``.mpc`` access: get_plain_text, reveal, share,
numpy export) — or scope exit — replays the whole recorded graph inside a
single jit-compiled party-vmapped program, with fresh protocol randomness
derived per node (rng.fork), and fills every pending tensor. Repeated
identical graphs (training loops) hit XLA's persistent compile cache.

Non-CrypTensor arguments are captured STATICALLY (closed over), which is
what the per-op protocol methods expect of public metadata (shift counts,
split sizes, pad specs). Ops that are not abstractly traceable, or whose
outputs are not MPCTensors, fall back to immediate eager dispatch
(FALLBACK) — correctness first.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

FALLBACK = object()

_tape = None  # active Tape (module-global; set by the lazy() context)


def _sds_like(tree):
    """Pytree -> same tree with ShapeDtypeStruct leaves."""
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree
    )


def _is_mpc(x):
    from .mpc.mpc import MPCTensor

    return isinstance(x, MPCTensor)


class Tape:
    def __init__(self):
        # node: (fn, entries, n_out) with entries = ('t', CrypTensor) | ('s', value)
        self.nodes = []
        self.pending = []  # every pending CrypTensor handed out

    # -- record ------------------------------------------------------------
    def record(self, fn, args):
        import curl_tpu as ct

        entries = []
        abs_args = []
        for a in args:
            if isinstance(a, ct.CrypTensor):
                if a._mpc is None and a._tape is not None and a._tape is not self:
                    a._tape.flush()  # cross-tape dependency: settle theirs first
                entries.append(("t", a))
                abs_args.append(
                    _sds_like(a._mpc) if a._mpc is not None else a._abs
                )
            else:
                entries.append(("s", a))

        ws = ct._session.world_size
        keys_abs = _sds_like(ct._session.keys)

        def absfn(party_keys, *tensor_mpcs):
            from . import comm
            from .parallel.runner import mpc_context

            def party_fn(pk, *inner_t):
                inner_it = iter(inner_t)
                full = [
                    next(inner_it) if kind == "t" else val
                    for kind, val in entries
                ]
                with mpc_context(pk, ws):
                    return fn(*full)

            n_t = len(tensor_mpcs)
            return jax.vmap(
                party_fn,
                in_axes=(0,) + (0,) * n_t,
                axis_name=comm.PARTY_AXIS,
            )(party_keys, *tensor_mpcs)

        try:
            out_abs = jax.eval_shape(absfn, keys_abs, *abs_args)
        except Exception:
            return FALLBACK  # op not abstractly traceable -> run it eagerly

        flat, treedef = jax.tree_util.tree_flatten(out_abs, is_leaf=_is_mpc)
        if not flat or not all(_is_mpc(x) for x in flat):
            return FALLBACK  # non-MPCTensor outputs -> run it eagerly

        node_idx = len(self.nodes)
        self.nodes.append((fn, entries, len(flat)))
        outs = [
            ct.CrypTensor._pending(abs_mpc, self, node_idx, leaf_idx)
            for leaf_idx, abs_mpc in enumerate(flat)
        ]
        self.pending.extend(outs)
        return jax.tree_util.tree_unflatten(treedef, outs)

    # -- flush ---------------------------------------------------------------
    def flush(self):
        import curl_tpu as ct
        from . import random as crng

        if not self.nodes:
            return
        nodes, self.nodes = self.nodes, []
        pending, self.pending = self.pending, []

        # ordered-dedup concrete roots; pending args resolve to node outputs
        roots, root_pos = [], {}
        for _fn, entries, _n in nodes:
            for kind, a in entries:
                if kind == "t" and a._mpc is not None and id(a) not in root_pos:
                    root_pos[id(a)] = len(roots)
                    roots.append(a)

        def fn_total(*root_mpcs):
            outs = []  # per node: flat list of MPCTensor outputs
            for i, (fn, entries, _n) in enumerate(nodes):
                vals = []
                for kind, a in entries:
                    if kind == "s":
                        vals.append(a)
                    elif a._mpc is not None:
                        vals.append(root_mpcs[root_pos[id(a)]])
                    else:
                        vals.append(outs[a._node_idx][a._leaf_idx])
                with crng.fork(1000003 + i):
                    out = fn(*vals)
                flat, _ = jax.tree_util.tree_flatten(out, is_leaf=_is_mpc)
                outs.append(flat)
            return tuple(x for node_out in outs for x in node_out)

        global _tape
        saved, _tape = _tape, None
        try:
            results = ct._eager_run(fn_total, *roots, _jit=True)
        finally:
            _tape = saved

        # results arrive in fn_total's flatten order: node-major, leaf-minor
        starts, acc = [], 0
        for _fn, _entries, n_out in nodes:
            starts.append(acc)
            acc += n_out
        flat_results = list(results)
        assert len(flat_results) == acc, "lazy flush: output arity mismatch"
        for t in pending:
            if t._mpc is None and t._tape is self:
                res = flat_results[starts[t._node_idx] + t._leaf_idx]
                t._mpc = res.mpc if hasattr(res, "mpc") else res
                t._tape = None


@contextlib.contextmanager
def lazy():
    """Batch eager ops into one fused program (see module docstring)."""
    import curl_tpu as ct

    ct._require_init()
    global _tape
    prev = _tape
    tape = Tape()
    _tape = tape
    try:
        yield tape
    finally:
        _tape = prev
        tape.flush()
