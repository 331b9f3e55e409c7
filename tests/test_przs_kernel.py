"""Dispatch/fallback logic for the fused PRZS/sharing kernel
(ops/pallas_przs.py, random.przs_share). The kernel itself is TPU-only
(pltpu.prng has no CPU interpret rule); its on-device properties (stream
identity with pallas_rng, telescoping, sharing correctness, e2e decode)
are asserted by scripts/validate_przs_kernel.py — re-run it after any
kernel change. Here: the CPU suite locks in the gating predicate and the
bit-exact composable fallback."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import curl_tpu
from curl_tpu import comm
from curl_tpu import random as rng
from curl_tpu.parallel import runner


@pytest.fixture(autouse=True)
def _init():
    curl_tpu.init(world_size=2, seed=5)


def test_kernel_gate_predicate(monkeypatch):
    n_big = 1 << 18
    # CPU: never, regardless of size/config
    assert not rng._przs_kernel_enabled(n_big)
    with curl_tpu.cfg.temp_override({"mpc.przs_kernel": "pallas_tpu"}):
        assert not rng._przs_kernel_enabled(n_big)
    # TPU (monkeypatched backend): the "auto" default engages at/above
    # the threshold; explicit null selects the composable path
    monkeypatch.setattr(rng.jax, "default_backend", lambda: "tpu")
    assert rng._przs_kernel_enabled(n_big)
    assert rng._przs_kernel_enabled(rng._PRZS_KERNEL_MIN_ELEMENTS)
    assert not rng._przs_kernel_enabled(rng._PRZS_KERNEL_MIN_ELEMENTS - 1)
    with curl_tpu.cfg.temp_override({"mpc.przs_kernel": None}):
        assert not rng._przs_kernel_enabled(n_big)
    with curl_tpu.cfg.temp_override({"mpc.przs_kernel": "pallas_tpu"}):
        assert rng._przs_kernel_enabled(n_big)


def test_przs_share_fallback_matches_manual_composable():
    """On CPU przs_share must be bit-identical to the hand-written
    przs + (rank==src) * value it replaced (same stream, same counter
    consumption)."""
    shape = (300, 220)  # above _RING_BULK_MIN_ELEMENTS
    value = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 63, shape, dtype=np.uint64)
    )

    def fused():
        return rng.przs_share(value)

    def manual():
        share = rng.przs_arithmetic(shape)
        mask = (comm.rank_signed() == 0).astype(jnp.uint64)
        return share + mask * value

    rng._counter = itertools.count(50_000)
    a = runner.run_parties(fused, 2, 99, jit=True)
    rng._counter = itertools.count(50_000)
    b = runner.run_parties(manual, 2, 99, jit=True)
    assert (np.asarray(a) == np.asarray(b)).all()
    # and the sharing decodes: lanes sum to the plaintext
    total = np.asarray(a).sum(axis=0, dtype=np.uint64)
    assert (total == np.asarray(value)).all()


@pytest.mark.parametrize("src", [0, 1])
def test_przs_share_src_param(src):
    shape = (8, 8)
    value = jnp.asarray(
        np.random.default_rng(1).integers(0, 1 << 62, shape, dtype=np.uint64)
    )

    def prog():
        return rng.przs_share(value, src=src)

    out = runner.run_parties(prog, 3, 7 + src, jit=True)
    total = np.asarray(out).sum(axis=0, dtype=np.uint64)
    assert (total == np.asarray(value)).all()
