"""SPMD (shard_map) party binding must agree with vmap simulation —
validates the real-multi-chip code path on virtual CPU devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import curl_tpu
from curl_tpu import random as rng_mod
from curl_tpu.parallel import run_parties, run_parties_spmd, Public


def _protocol(x, y):
    z = x.mul(y)
    w = z.add(x).relu()
    return w


def _encrypt_inputs(seed):
    curl_tpu.init(world_size=2, seed=seed)
    r = np.random.default_rng(3)
    a, b = r.normal(size=(4, 8)), r.normal(size=(4, 8))
    ea = curl_tpu.cryptensor(a)
    eb = curl_tpu.cryptensor(b)
    return a, b, ea, eb


def test_shard_map_matches_vmap():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from jax.sharding import Mesh

    a, b, ea, eb = _encrypt_inputs(41)
    out_vmap = run_parties(_protocol, 2, 7, ea.mpc, eb.mpc)

    mesh = Mesh(np.array(jax.devices()[:2]), ("party",))
    out_spmd = run_parties_spmd(_protocol, mesh, 2, 7, ea.mpc, eb.mpc)

    # decoded results agree with plaintext (shares themselves differ only by
    # jit/no-jit numerics of the same program — they are in fact identical)
    dec_v = curl_tpu.CrypTensor(out_vmap).get_plain_text()
    dec_s = curl_tpu.CrypTensor(out_spmd).get_plain_text()
    ref = np.maximum(a * b + a, 0)
    np.testing.assert_allclose(dec_v, ref, atol=0.02)
    np.testing.assert_allclose(dec_s, ref, atol=0.02)
    # raw shares are NOT compared: each trace advances the global trace-time
    # PRNG counter, so the two programs draw different (equally valid) masks


def test_party_by_data_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    ge.dryrun_multichip(8)


def test_lut_protocol_under_shard_map():
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from jax.sharding import Mesh

    curl_tpu.init(world_size=2, seed=55)
    x = np.linspace(-2, 2, 16)
    ex = curl_tpu.cryptensor(x)
    mesh = Mesh(np.array(jax.devices()[:2]), ("party",))
    out = run_parties_spmd(lambda m: m.gelu(), mesh, 2, 9, ex.mpc)
    import math

    ref = x * (1 + np.vectorize(math.erf)(x / math.sqrt(2))) / 2
    np.testing.assert_allclose(
        curl_tpu.CrypTensor(out).get_plain_text(), ref, atol=0.05
    )
