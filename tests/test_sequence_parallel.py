"""Sequence-axis sharding (long context): decoded parity with the
unsharded softmax on a virtual party x seq mesh (SURVEY §5's additive TPU
design axis; the reference has no sequence parallelism to mirror)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import curl_tpu
from curl_tpu import random as rng_mod
from curl_tpu.parallel import mpc_context, run_parties
from curl_tpu.parallel.sequence import sharded_attention_scores, sharded_softmax

WORLD = 2
N_SEQ = 4


def _shard_map():
    try:
        from jax import shard_map as _sm

        return _sm.shard_map if hasattr(_sm, "shard_map") else _sm
    except ImportError:
        from jax.experimental.shard_map import shard_map

        return shard_map


def _party_seq_mesh():
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[: WORLD * N_SEQ]).reshape(WORLD, N_SEQ)
    return Mesh(devices, ("party", "seq"))


def _decode(stacked_share):
    total = stacked_share.astype(jnp.uint64).sum(0).view(jnp.int64)
    return np.asarray(total, dtype=np.float64) / (1 << 16)


@pytest.mark.skipif(len(jax.devices()) < WORLD * N_SEQ, reason="needs 8 devices")
def test_sharded_softmax_parity_seq256():
    from jax.sharding import PartitionSpec as P

    T, B = 256, 2
    curl_tpu.init(world_size=WORLD, seed=21)
    # scale 1.5 keeps the softmax denominator (sum of exps) inside the
    # haar reciprocal LUT domain [0, 2^reciprocal_lut_max_bits = 64) —
    # the same envelope the unsharded encrypted softmax has
    x = np.random.default_rng(8).normal(size=(B, T)) * 1.5
    xe = curl_tpu.cryptensor(x)

    keys = rng_mod.make_party_keys(13, WORLD)
    mesh = _party_seq_mesh()

    def local_fn(party_keys, xm):
        party_keys = jax.tree_util.tree_map(lambda a: a[0], party_keys)
        xm = jax.tree_util.tree_map(lambda a: a[0], xm)  # local (B, T/N_SEQ)
        with mpc_context(party_keys, WORLD, runtime="shard_map"):
            out = sharded_softmax(xm, dim=-1, axis_name="seq")
        return out.share[None]

    key_specs = jax.tree_util.tree_map(lambda _: P("party"), keys)
    fn = _shard_map()(
        local_fn,
        mesh=mesh,
        in_specs=(key_specs, P("party", None, "seq")),
        out_specs=P("party", None, "seq"),
        check_vma=False,
    )
    out_share = jax.jit(fn)(keys, xe.mpc)
    got = _decode(out_share)

    e = np.exp(x - x.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, ref, atol=0.02)
    assert abs(got.sum(-1) - 1).max() < 0.05

    # cross-check against the unsharded encrypted softmax (vmap sim)
    unsharded = run_parties(lambda m: m.softmax(-1), WORLD, 13, xe.mpc)
    base = curl_tpu.CrypTensor(unsharded).get_plain_text()
    np.testing.assert_allclose(got, base, atol=0.02)


@pytest.mark.skipif(len(jax.devices()) < WORLD * N_SEQ, reason="needs 8 devices")
def test_sharded_attention_scores_parity():
    from jax.sharding import PartitionSpec as P

    T, D = 32, 8
    curl_tpu.init(world_size=WORLD, seed=22)
    r = np.random.default_rng(9)
    q = r.normal(size=(T, D)) * 0.3
    k = r.normal(size=(T, D)) * 0.3
    qe = curl_tpu.cryptensor(q)
    ke = curl_tpu.cryptensor(k)

    keys = rng_mod.make_party_keys(14, WORLD)
    mesh = _party_seq_mesh()

    def local_fn(party_keys, qm, km):
        party_keys = jax.tree_util.tree_map(lambda a: a[0], party_keys)
        qm = jax.tree_util.tree_map(lambda a: a[0], qm)  # (T/N_SEQ, D)
        km = jax.tree_util.tree_map(lambda a: a[0], km)
        with mpc_context(party_keys, WORLD, runtime="shard_map"):
            s = sharded_attention_scores(qm, km, axis_name="seq")
        return s.share[None]

    key_specs = jax.tree_util.tree_map(lambda _: P("party"), keys)
    fn = _shard_map()(
        local_fn,
        mesh=mesh,
        in_specs=(key_specs, P("party", "seq"), P("party", "seq")),
        out_specs=P("party", "seq", None),
        check_vma=False,
    )
    out_share = jax.jit(fn)(keys, qe.mpc, ke.mpc)
    got = _decode(out_share)
    np.testing.assert_allclose(got, q @ k.T, atol=0.03)
