"""Native C++ tuple engine: parity with the jax dealer fill.

The engine (native/tuple_engine.cc via mpc/provider/native_engine.py) must
produce entries with the identical pytree structure the jax path emits and
satisfy every tuple kind's protocol invariant. Reference analogue: the TTP
dealer generates the same correlations with torch on the dealer host
(curl/mpc/provider/ttp_provider.py:157-254).
"""

import numpy as np
import pytest

import jax

import curl_tpu
from conftest import reinit

from curl_tpu.mpc.provider import native_engine
from curl_tpu.mpc.provider.provider import TupleRequest


def _requests_for_all_kinds():
    return [
        TupleRequest("generate_additive_triple", ((3, 4), (4, 5), "matmul"), ()),
        TupleRequest("generate_additive_triple", ((2, 3), (2, 3), "mul"), ()),
        TupleRequest("square", ((6,),), ()),
        TupleRequest("generate_binary_triple", ((2, 3), (2, 3)), ()),
        TupleRequest("wrap_rng", ((5,),), ()),
        TupleRequest("B2A_rng", ((7,),), ()),
        TupleRequest("generate_one_hot", ((4,), 16), ()),
        TupleRequest("generate_lut_masks", ((4,), 16, 2), ()),
        TupleRequest("egk_trunc_pr_rng", ((5,), 62, 16), ()),
    ]


@pytest.fixture(scope="module")
def entries():
    reinit(world_size=2)
    return native_engine.fill_standalone_native(_requests_for_all_kinds(), 2, 99)


def _dec(t):
    """Decode an additively shared stacked tensor (sum over party axis)."""
    return np.sum(np.asarray(t.share, dtype=np.uint64), axis=0)


def _xdec(t):
    out = np.asarray(t.share, dtype=np.uint64)
    res = out[0]
    for p in range(1, out.shape[0]):
        res = res ^ out[p]
    return res


def test_structure_matches_jax_fill():
    from curl_tpu.mpc.provider import dealer

    reinit(world_size=2)
    provider = curl_tpu.get_default_provider()
    reqs = _requests_for_all_kinds()
    jax_entries = dealer.fill_standalone(reqs, 2, 3, provider=provider)
    nat_entries = native_engine.fill_standalone_native(reqs, 2, 3)
    assert jax.tree_util.tree_structure(jax_entries) == jax.tree_util.tree_structure(
        nat_entries
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(jax_entries),
        jax.tree_util.tree_leaves(nat_entries),
    ):
        assert tuple(a.shape) == tuple(b.shape)
        assert a.dtype == b.dtype


def test_additive_triples_exact(entries):
    a, b, c = entries[0]
    assert np.array_equal(_dec(a) @ _dec(b), _dec(c))
    a, b, c = entries[1]
    assert np.array_equal(_dec(a) * _dec(b), _dec(c))


def test_square_exact(entries):
    r, r2 = entries[2]
    assert np.array_equal(_dec(r) * _dec(r), _dec(r2))


def test_binary_triple_exact(entries):
    a, b, c = entries[3]
    assert np.array_equal(_xdec(a) & _xdec(b), _xdec(c))


def test_wrap_rng_theta(entries):
    from curl_tpu import ring

    r, theta = entries[4]
    planes = np.asarray(r.share)
    ref = np.asarray(ring.count_wraps(planes))
    assert np.array_equal(_dec(theta), ref)


def test_b2a_consistent(entries):
    ra, rb = entries[5]
    bit_a = _dec(ra)
    bit_b = _xdec(rb)
    assert np.array_equal(bit_a, bit_b)
    assert set(np.unique(bit_a)) <= {0, 1}


def test_one_hot_valid(entries):
    r, oh = entries[6]
    rv = _dec(r)
    ohv = _dec(oh)
    assert ohv.shape == rv.shape + (16,)
    assert np.array_equal(ohv.sum(-1), np.ones_like(rv))
    assert np.array_equal(np.argmax(ohv, -1).astype(np.uint64), rv)
    assert (rv < 16).all()


def test_lut_masks_invariants(entries):
    r_plain, r_shares, masks = entries[7]
    # rank 0's plaintext plane matches the shared r
    assert np.array_equal(r_plain[0].astype(np.uint64), _dec(r_shares))
    # masks telescope to zero across parties, per table
    assert np.array_equal(
        np.sum(np.asarray(masks, dtype=np.uint64), axis=0),
        np.zeros(masks.shape[1:], dtype=np.uint64),
    )
    assert masks.shape[0] == 2 and masks.shape[1] == 2


def test_egk_ranges(entries):
    r, r_p, b = entries[8]
    assert (_dec(r) < (1 << 46)).all()  # l - m = 62 - 16
    assert (_dec(r_p) < (1 << 16)).all()
    assert set(np.unique(_dec(b))) <= {0, 1}


def test_rng_streams_independent():
    """Different seeds/streams give different bits; same seed reproduces."""
    reqs = [TupleRequest("square", ((256,),), ())]
    e1 = native_engine.fill_standalone_native(reqs, 2, 1)
    e2 = native_engine.fill_standalone_native(reqs, 2, 1)
    e3 = native_engine.fill_standalone_native(reqs, 2, 2)
    a1 = np.asarray(e1[0][0].share)
    a2 = np.asarray(e2[0][0].share)
    a3 = np.asarray(e3[0][0].share)
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, a3)
    # bit balance sanity on the uniform draws
    bits = np.unpackbits(a1.view(np.uint8))
    assert 0.45 < bits.mean() < 0.55


def test_online_serve_from_native_cache(rng, tmp_path):
    """Decoded online results are correct when tuples come from the native
    engine's cache files (full offline/online split)."""
    from curl_tpu.mpc.provider import dealer

    reinit(world_size=2)
    provider = curl_tpu.get_default_provider()
    provider.requests = []
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))

    curl_tpu.trace(True)
    _ = (curl_tpu.cryptensor(x) * curl_tpu.cryptensor(y)).get_plain_text()
    curl_tpu.trace(False)

    entries = native_engine.fill_standalone_native(provider.requests, 2, 41)
    paths = dealer.save_party_caches(entries, str(tmp_path / "nat"), 2)
    cache = dealer.attach_party_caches(paths)
    got = (curl_tpu.cryptensor(x) * curl_tpu.cryptensor(y)).get_plain_text()
    assert cache.cursor == len(cache.entries)
    np.testing.assert_allclose(got, x * y, atol=0.02)
    provider.attach_cache(None)
    provider.requests = []
