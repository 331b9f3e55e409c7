"""run_multiprocess decorator edge cases (reference: test/test_context.py —
exception fail-stop, large world sizes, arg/kwarg passthrough, init-in-first,
per-party RNG seed coordination)."""

import numpy as np
import pytest

import jax

import curl_tpu
from curl_tpu.mpc import run_multiprocess
from conftest import reinit


def test_exception_returns_none():
    # fail-stop semantics: any party failure -> the call returns None
    # (reference: test_context.py:66-69 / context.py:102-105)
    @run_multiprocess(world_size=2)
    def boom():
        raise RuntimeError("party failure")

    assert boom() is None
    reinit(world_size=2)


def test_world_size_ten():
    # reference: test_context.py:71-73 — ws=10 parties all report
    @run_multiprocess(world_size=10)
    def ones():
        assert curl_tpu._session.world_size == 10
        return 1

    assert ones() == [1] * 10
    reinit(world_size=2)


def test_args_kwargs_passthrough():
    # reference: test_context.py:45-48 (test_with_args_kwargs_func)
    @run_multiprocess(world_size=2)
    def strip_first(first, *args, a=None, **kwargs):
        return args, kwargs

    args, kwargs = strip_first("x", "y", "z", a=1, b=2)[0]
    assert args == ("y", "z")
    assert kwargs == {"b": 2}
    reinit(world_size=2)


def test_init_in_first():
    # parent session at ws=2, decorated call at ws=3, parent restored after
    # (reference: test_context.py:78-88 test_in_first)
    reinit(world_size=2)
    assert curl_tpu._session.world_size == 2

    @run_multiprocess(world_size=3)
    def inner():
        return curl_tpu._session.world_size

    assert inner() == [3, 3, 3]
    assert curl_tpu._session.world_size == 2


def test_exception_restores_world_size():
    reinit(world_size=2)

    @run_multiprocess(world_size=4)
    def boom():
        raise ValueError()

    assert boom() is None
    assert curl_tpu._session.world_size == 2


def test_rng_seeds_coordinate():
    """Per-party streams coordinate exactly as the reference's generators
    (reference: test_context.py:51-60 test_rng_seeds_func): party p's
    "next" stream equals party p+1's "prev" stream (the PRZS ring), and
    "local" streams are pairwise distinct; "global" is shared."""
    from curl_tpu import random as rng_mod

    ws = 5
    keys = rng_mod.make_party_keys(seed=77, world_size=ws, stacked=True)

    def data(k):
        return np.asarray(jax.random.key_data(k))

    nxt, prv = data(keys["next"]), data(keys["prev"])
    for p in range(ws):
        np.testing.assert_array_equal(nxt[p], prv[(p + 1) % ws])
    local = data(keys["local"])
    assert len({tuple(local[p].ravel()) for p in range(ws)}) == ws
    # and locals never collide with the ring streams
    ring = {tuple(nxt[p].ravel()) for p in range(ws)}
    assert not ring & {tuple(local[p].ravel()) for p in range(ws)}
    reinit(world_size=2)
