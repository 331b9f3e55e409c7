"""Binary shared tensor + circuits (parity scope: reference
test/test_binary.py)."""

import numpy as np
import pytest

import curl_tpu
from curl_tpu.mpc.ptype import ptype
from conftest import reinit


def encb(x):
    return curl_tpu.cryptensor(
        np.asarray(x, dtype=np.int64).astype(np.float64), precision=0
    ).to_ptype(ptype.binary)


def enc_binary_raw(vals):
    """Encrypt raw uint64 bit patterns as binary shares."""
    import jax.numpy as jnp
    from curl_tpu.mpc.mpc import MPCTensor
    from curl_tpu import _eager_run

    arr = jnp.asarray(np.asarray(vals, dtype=np.uint64))
    return _eager_run(
        lambda: MPCTensor.encrypt(arr, src=0, ptype=ptype.binary)
    )


def test_encrypt_reveal_binary(rng):
    vals = rng.integers(0, 2**63, size=(8,), dtype=np.uint64)
    e = enc_binary_raw(vals)
    np.testing.assert_array_equal(e.get_plain_text(), vals)


def test_xor_and_or_not(rng):
    a = rng.integers(0, 2**63, size=(6,), dtype=np.uint64)
    b = rng.integers(0, 2**63, size=(6,), dtype=np.uint64)
    ea, eb = enc_binary_raw(a), enc_binary_raw(b)

    def run(op, *args):
        return curl_tpu._eager_run(op, *args).get_plain_text()

    np.testing.assert_array_equal(run(lambda x, y: x ^ y, ea, eb), a ^ b)
    np.testing.assert_array_equal(run(lambda x, y: x & y, ea, eb), a & b)
    np.testing.assert_array_equal(run(lambda x, y: x | y, ea, eb), a | b)
    np.testing.assert_array_equal(run(lambda x: ~x, ea), ~a)
    np.testing.assert_array_equal(run(lambda x: x << 3, ea), a << np.uint64(3))


def test_public_xor_and(rng):
    a = rng.integers(0, 2**62, size=(5,), dtype=np.uint64)
    c = np.uint64(0xDEADBEEF)
    ea = enc_binary_raw(a)
    got = curl_tpu._eager_run(lambda x: x ^ int(c), ea).get_plain_text()
    np.testing.assert_array_equal(got, a ^ c)
    got = curl_tpu._eager_run(lambda x: x & int(c), ea).get_plain_text()
    np.testing.assert_array_equal(got, a & c)


def test_binary_add_circuit(rng):
    a = rng.integers(-(2**40), 2**40, size=(6,)).astype(np.int64).view(np.uint64)
    b = rng.integers(-(2**40), 2**40, size=(6,)).astype(np.int64).view(np.uint64)
    ea, eb = enc_binary_raw(a), enc_binary_raw(b)
    from curl_tpu.mpc.mpc import MPCTensor
    from curl_tpu.mpc.ptype import ptype as pt
    got = curl_tpu._eager_run(
        lambda x, y: MPCTensor(x._tensor.add(y._tensor), pt.binary), ea, eb
    ).get_plain_text()
    np.testing.assert_array_equal(got, a + b)


def test_binary_comparison_circuits(rng):
    a = rng.integers(-(2**40), 2**40, size=(10,)).astype(np.int64)
    b = rng.integers(-(2**40), 2**40, size=(10,)).astype(np.int64)
    b[:3] = a[:3]  # force equality cases
    ea, eb = enc_binary_raw(a.view(np.uint64)), enc_binary_raw(b.view(np.uint64))

    cases = {
        "eq": (a == b), "lt": (a < b), "le": (a <= b),
        "gt": (a > b), "ge": (a >= b),
    }
    from curl_tpu.mpc.mpc import MPCTensor
    from curl_tpu.mpc.ptype import ptype as pt
    for name, expected in cases.items():
        got = curl_tpu._eager_run(
            lambda x, y, n=name: MPCTensor(getattr(x._tensor, n)(y._tensor), pt.binary),
            ea, eb,
        ).get_plain_text()
        np.testing.assert_array_equal(got & 1, expected.astype(np.uint64), err_msg=name)


def test_binary_sum_tree(rng):
    a = rng.integers(0, 2**40, size=(5, 4), dtype=np.uint64)
    ea = enc_binary_raw(a)
    from curl_tpu.mpc.mpc import MPCTensor
    from curl_tpu.mpc.ptype import ptype as pt
    got = curl_tpu._eager_run(
        lambda x: MPCTensor(x._tensor.sum(axis=0), pt.binary), ea
    ).get_plain_text()
    np.testing.assert_array_equal(got, a.sum(axis=0, dtype=np.uint64))


def test_a2b_b2a_roundtrip(rng):
    reinit(world_size=2)
    x = rng.normal(size=(7,)) * 20
    e = curl_tpu.cryptensor(x)
    b = e.to_ptype(ptype.binary)
    back = b.to_ptype(ptype.arithmetic)
    np.testing.assert_allclose(back.get_plain_text(), x, atol=1e-3)


@pytest.mark.parametrize("world_size", [3])
def test_a2b_b2a_3pc(world_size, rng):
    reinit(world_size=world_size)
    x = rng.normal(size=(5,)) * 10
    e = curl_tpu.cryptensor(x)
    b = e.to_ptype(ptype.binary)
    back = b.to_ptype(ptype.arithmetic)
    np.testing.assert_allclose(back.get_plain_text(), x, atol=1e-3)
    reinit(world_size=2)


def test_binary_rand_uniformity():
    from curl_tpu.mpc.mpc import MPCTensor
    from curl_tpu.mpc.ptype import ptype as pt
    from curl_tpu.mpc.primitives.binary import BinarySharedTensor

    e = curl_tpu._eager_run(
        lambda: MPCTensor(BinarySharedTensor.rand((2000,), bits=1), pt.binary)
    )
    bits = e.get_plain_text() & 1
    assert 0.4 < bits.mean() < 0.6
