"""Collective-by-collective communicator tests: value semantics AND the
round/byte accounting for every collective, at ws=2 and ws=3, under the
vmap party runtime (plus a shard_map cross-check on virtual devices).

Ports the intent of the reference's per-collective suite
(reference: test/test_communicator.py:56-187 — scatter/reduce/all_reduce/
gather/all_gather/broadcast value tests, batched one-round accounting,
mutation checks, stats verification via the @count_wraps pattern) to the
named-axis collective set in curl_tpu/comm/communicator.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu import comm
from curl_tpu.parallel import run_parties

from conftest import reinit


def _stacked(ws, shape=(3, 4), dtype=np.int64, seed=7):
    r = np.random.default_rng(seed)
    return r.integers(-100, 100, size=(ws,) + shape).astype(dtype)


def _run(fn, ws, *stacked):
    return np.asarray(run_parties(fn, ws, 1001, *[jnp.asarray(s) for s in stacked]))


# ---------------------------------------------------------------------------
# value semantics
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ws", [2, 3])
def test_all_sum_values(ws):
    reinit(world_size=ws)
    x = _stacked(ws)
    out = _run(comm.all_sum, ws, x)
    expect = x.sum(axis=0)
    for p in range(ws):
        np.testing.assert_array_equal(out[p], expect)


@pytest.mark.parametrize("ws", [2, 3])
def test_all_xor_values(ws):
    reinit(world_size=ws)
    x = _stacked(ws, dtype=np.uint64)
    out = _run(comm.all_xor, ws, x)
    expect = x[0]
    for p in range(1, ws):
        expect = expect ^ x[p]
    for p in range(ws):
        np.testing.assert_array_equal(out[p], expect)


@pytest.mark.parametrize("ws", [2, 3])
def test_all_gather_values(ws):
    reinit(world_size=ws)
    x = _stacked(ws)
    out = _run(comm.all_gather_stack, ws, x)  # (P, P, ...) stacked result
    for p in range(ws):
        np.testing.assert_array_equal(out[p], x)


@pytest.mark.parametrize("ws", [2, 3])
def test_gather_is_all_gather(ws):
    # SPMD gather == all_gather with caller-side masking (communicator.py
    # docstring); every party must therefore hold the full stack.
    reinit(world_size=ws)
    x = _stacked(ws)
    out = _run(lambda v: comm.gather(v, dst=0), ws, x)
    for p in range(ws):
        np.testing.assert_array_equal(out[p], x)


@pytest.mark.parametrize("ws", [2, 3])
def test_broadcast_values_every_src(ws):
    reinit(world_size=ws)
    x = _stacked(ws)
    for src in range(ws):
        out = _run(lambda v, s=src: comm.broadcast(v, src=s), ws, x)
        for p in range(ws):
            np.testing.assert_array_equal(out[p], x[src])


def test_broadcast_float_dtype():
    reinit(world_size=2)
    x = np.random.default_rng(0).normal(size=(2, 5))
    out = _run(lambda v: comm.broadcast(v, src=1), 2, x)
    np.testing.assert_allclose(out[0], x[1])
    np.testing.assert_allclose(out[1], x[1])


@pytest.mark.parametrize("ws", [2, 3])
def test_scatter_values(ws):
    # party i ends up with stacked[i], where the stack is src's
    # (reference: test_communicator.py:56-64)
    reinit(world_size=ws)
    src = 0
    per_src = _stacked(ws, shape=(ws, 4), seed=9)  # each party's (ws, 4) stack

    out = _run(lambda v: comm.scatter(v, src=src), ws, per_src)
    for p in range(ws):
        np.testing.assert_array_equal(out[p], per_src[src][p])


@pytest.mark.parametrize("ws,shift", [(2, 1), (3, 1), (3, 2), (3, -1)])
def test_ppermute_ring(ws, shift):
    reinit(world_size=ws)
    x = _stacked(ws)
    out = _run(lambda v: comm.ppermute(v, shift=shift), ws, x)
    for p in range(ws):
        # party p receives from (p - shift) mod ws: lax.ppermute perm pairs
        # are (source, dest) with dest = (i + shift) % ws
        np.testing.assert_array_equal(out[p], x[(p - shift) % ws])


def test_world_size_one_passthrough():
    reinit(world_size=2)
    old_ws = comm.get_world_size()
    comm.set_world_size(1)
    try:
        x = jnp.arange(6.0).reshape(2, 3)
        comm.reset_communication_stats()
        np.testing.assert_array_equal(np.asarray(comm.all_sum(x)), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(comm.broadcast(x, 0)), np.asarray(x))
        np.testing.assert_array_equal(np.asarray(comm.ppermute(x)), np.asarray(x))
        # degenerate world performs no communication at all
        assert comm.get_communication_stats()["rounds"] == 0
    finally:
        # restore the PRE-TEST value: a hard-coded 2 here leaked a
        # module-global world size into every later test file (ordering
        # flake: compressed .share outside a party trace then took the
        # ws==2 branch and hit an unbound axis error)
        comm.set_world_size(old_ws)


@pytest.mark.parametrize("ws", [2, 3])
def test_collectives_do_not_mutate_input(ws):
    # reference: test_communicator.py:115-126 (test_mutation)
    reinit(world_size=ws)
    x = _stacked(ws)
    before = x.copy()
    _run(comm.all_sum, ws, x)
    _run(lambda v: comm.broadcast(v, src=0), ws, x)
    np.testing.assert_array_equal(x, before)


def test_rank_and_world_size_inside_party_fn():
    reinit(world_size=3)

    def fn(v):
        assert comm.get_world_size() == 3
        return v + comm.rank()

    x = np.zeros((3, 2), dtype=np.int64)
    out = _run(fn, 3, x)
    np.testing.assert_array_equal(out, np.arange(3)[:, None] * np.ones((3, 2)))


# ---------------------------------------------------------------------------
# stats accounting: rounds / bytes / per-call counters
# ---------------------------------------------------------------------------


def _stats_of(fn, ws, *stacked):
    comm.reset_communication_stats()
    run_parties(fn, ws, 1001, *[jnp.asarray(s) for s in stacked])
    return comm.get_communication_stats()


@pytest.mark.parametrize(
    "name,fn",
    [
        ("all_sum", comm.all_sum),
        ("all_xor", lambda v: comm.all_xor(v)),
        ("all_gather", comm.all_gather_stack),
        ("broadcast", lambda v: comm.broadcast(v, src=0)),
        ("ppermute", lambda v: comm.ppermute(v)),
    ],
)
def test_single_collective_accounting(name, fn):
    ws = 2
    reinit(world_size=ws)
    x = _stacked(ws, shape=(4, 5), dtype=np.uint64)
    stats = _stats_of(fn, ws, x)
    # exactly one round, counted under the collective's own name, with
    # bytes equal to the per-party payload (4*5 u64 = 160 B)
    assert stats["rounds"] == 1
    assert stats["calls"] == {name: 1}
    assert stats["bytes"] == 4 * 5 * 8


def test_batched_reveal_is_one_round():
    # a pytree argument is ONE collective round with summed bytes — the
    # reference's batched all_reduce accounting
    # (test_communicator.py:152-174)
    ws = 2
    reinit(world_size=ws)
    a = _stacked(ws, shape=(2, 2), dtype=np.uint64)
    b = _stacked(ws, shape=(8,), dtype=np.uint64, seed=8)
    stats = _stats_of(lambda x, y: comm.all_sum([x, y]), ws, a, b)
    assert stats["rounds"] == 1
    assert stats["calls"] == {"all_sum": 1}
    assert stats["bytes"] == (2 * 2 + 8) * 8


def test_sequential_collectives_accumulate():
    ws = 2
    reinit(world_size=ws)
    x = _stacked(ws, shape=(2, 3), dtype=np.uint64)

    def fn(v):
        s = comm.all_sum(v)
        s = comm.all_sum(s)
        return comm.ppermute(s)

    stats = _stats_of(fn, ws, x)
    assert stats["rounds"] == 3
    assert stats["calls"] == {"all_sum": 2, "ppermute": 1}
    assert stats["bytes"] == 3 * (2 * 3 * 8)


def test_scatter_accounts_as_broadcast():
    # scatter = broadcast + local select (communicator.py:217-232): the
    # wire accounting must record the broadcast round
    ws = 2
    reinit(world_size=ws)
    x = _stacked(ws, shape=(ws, 3), dtype=np.uint64)
    stats = _stats_of(lambda v: comm.scatter(v, src=0), ws, x)
    assert stats["rounds"] == 1
    assert stats["calls"] == {"broadcast": 1}
    assert stats["bytes"] == ws * 3 * 8


def test_register_virtual_accounting():
    # fused kernels report their internal messages through register_virtual
    # (communicator.py:113-121); profiles must match the composable path
    comm.reset_communication_stats()
    comm.register_virtual("fused_reveal", nbytes=1024, rounds=2)
    stats = comm.get_communication_stats()
    assert stats["rounds"] == 2
    assert stats["bytes"] == 1024
    assert stats["calls"] == {"fused_reveal": 2}


def test_protocol_stats_match_between_runtimes():
    """vmap and shard_map runs of the same protocol record identical
    trace-time round/byte profiles (the counters describe the protocol,
    not the binding)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import curl_tpu
    from curl_tpu.parallel import run_parties_spmd
    from jax.sharding import Mesh

    reinit(world_size=2)
    a = np.random.default_rng(5).normal(size=(3, 3))
    ea = curl_tpu.cryptensor(a)

    def protocol(x):
        return x.mul(x).relu()

    comm.reset_communication_stats()
    run_parties(protocol, 2, 11, ea.mpc)
    vmap_stats = comm.get_communication_stats()

    mesh = Mesh(np.array(jax.devices()[:2]), ("party",))
    comm.reset_communication_stats()
    run_parties_spmd(protocol, mesh, 2, 11, ea.mpc)
    spmd_stats = comm.get_communication_stats()

    assert vmap_stats["rounds"] == spmd_stats["rounds"] > 0
    assert vmap_stats["bytes"] == spmd_stats["bytes"] > 0
    assert vmap_stats["calls"] == spmd_stats["calls"]
