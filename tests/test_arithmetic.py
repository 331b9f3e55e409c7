"""Arithmetic shared tensor correctness vs plaintext numpy
(parity scope: reference test/test_arithmetic.py)."""

import numpy as np
import pytest

import curl_tpu
from conftest import reinit


def enc(x, **kw):
    return curl_tpu.cryptensor(np.asarray(x, dtype=np.float64), **kw)


def check(out, expected, tol=1e-3, msg=""):
    got = out.get_plain_text() if hasattr(out, "get_plain_text") else out
    np.testing.assert_allclose(got, expected, atol=tol, rtol=0, err_msg=msg)


@pytest.mark.parametrize("world_size", [1, 2, 3, 4])
def test_encrypt_decrypt(world_size, rng):
    reinit(world_size=world_size)
    x = rng.normal(size=(5, 7)) * 10
    check(enc(x), x, tol=1e-4)
    reinit(world_size=2)


def test_share_reconstruction_is_additive(rng):
    reinit(world_size=3)
    x = rng.normal(size=(4,))
    ct = enc(x)
    shares = np.asarray(ct.mpc.share)
    assert shares.shape[0] == 3
    total = shares.sum(axis=0, dtype=np.uint64)
    dec = ct.encoder.decode(total)
    np.testing.assert_allclose(dec, x, atol=1e-4)
    # individual shares look nothing like the plaintext
    for i in range(3):
        assert not np.allclose(ct.encoder.decode(shares[i]), x, atol=1.0)
    reinit(world_size=2)


def test_add_sub_public_private(rng):
    x = rng.normal(size=(3, 4)) * 5
    y = rng.normal(size=(3, 4)) * 5
    ex, ey = enc(x), enc(y)
    check(ex + ey, x + y, 1e-4)
    check(ex - ey, x - y, 1e-4)
    check(ex + y, x + y, 1e-4)
    check(ex - y, x - y, 1e-4)
    check(ex + 2.5, x + 2.5, 1e-4)
    check(2.5 - ex, 2.5 - x, 1e-4)
    check(-ex, -x, 1e-4)


def test_mul(rng):
    x = rng.normal(size=(4, 5)) * 3
    y = rng.normal(size=(4, 5)) * 3
    check(enc(x) * enc(y), x * y, 1e-2)
    check(enc(x) * y, x * y, 1e-2)
    check(enc(x) * 3, x * 3, 1e-4)  # integer public mul is exact
    check(enc(x) * 0.5, x * 0.5, 1e-2)


def test_mul_broadcast(rng):
    x = rng.normal(size=(4, 5))
    y = rng.normal(size=(5,))
    check(enc(x) * enc(y), x * y, 1e-2)


@pytest.mark.parametrize("shape", [((3, 4), (4, 5)), ((2, 3, 4), (2, 4, 5))])
def test_matmul_private(shape, rng):
    sa, sb = shape
    x = rng.normal(size=sa) * 2
    y = rng.normal(size=sb) * 2
    check(enc(x).matmul(enc(y)), x @ y, 0.05)


def test_matmul_public(rng):
    x = rng.normal(size=(6, 8)) * 2
    y = rng.normal(size=(8, 3)) * 2
    check(enc(x).matmul(y), x @ y, 0.05)


def test_matmul_large_values_exact_ring(rng):
    """Ring matmul must be bit-exact: big integers, no fixed point."""
    reinit(world_size=2)
    a = rng.integers(-(2**31), 2**31, size=(16, 32))
    b = rng.integers(-(2**31), 2**31, size=(32, 8))
    ea = enc(a.astype(np.float64), precision=0)
    eb = enc(b.astype(np.float64), precision=0)
    out = np.asarray(ea.matmul(eb).reveal())  # raw uint64 ring values
    with np.errstate(over="ignore"):
        expected = (a.astype(np.uint64)[:, :, None] * b.astype(np.uint64)[None]).sum(
            axis=1, dtype=np.uint64
        )
    np.testing.assert_array_equal(out, expected)


def test_square(rng):
    x = rng.normal(size=(5,)) * 4
    check(enc(x).square(), x * x, 0.05)


def test_div_scalar(rng):
    x = rng.normal(size=(6,)) * 8
    check(enc(x).div(4), x / 4, 1e-3)
    check(enc(x) / 2.0, x / 2, 1e-2)


def test_divmod_by_pow2(rng):
    x = np.array([5.0, 9.5, 0.25])
    d, r = enc(x).divmod(2**4)
    # value semantics: x = d * 16 + r in the encoded domain
    check(d * 16 + r, x, 1e-2)


def test_egk_trunc_pr(rng):
    reinit(world_size=2)
    x = np.abs(rng.normal(size=(50,))) * 100
    e = enc(x)
    out = e.egk_trunc_pr(62, 8).get_plain_text()
    np.testing.assert_allclose(out, x / 256, atol=0.02)


def test_conv2d(rng):
    x = rng.normal(size=(2, 3, 8, 8))
    w = rng.normal(size=(4, 3, 3, 3))
    out = enc(x).conv2d(enc(w), padding=1).get_plain_text()
    import torch

    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), padding=1
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_conv1d(rng):
    x = rng.normal(size=(2, 3, 16))
    w = rng.normal(size=(5, 3, 4))
    out = enc(x).conv1d(enc(w), stride=2).get_plain_text()
    import torch

    ref = torch.nn.functional.conv1d(
        torch.tensor(x), torch.tensor(w), stride=2
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_avg_pool2d(rng):
    x = rng.normal(size=(1, 2, 8, 8))
    out = enc(x).avg_pool2d(2).get_plain_text()
    ref = x.reshape(1, 2, 4, 2, 4, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_structure_ops(rng):
    x = rng.normal(size=(3, 4, 5))
    e = enc(x)
    check(e.reshape(12, 5), x.reshape(12, 5), 1e-4)
    check(e.transpose(0, 1), np.swapaxes(x, 0, 1), 1e-4)
    check(e.permute(2, 0, 1), np.transpose(x, (2, 0, 1)), 1e-4)
    check(e.flatten(), x.flatten(), 1e-4)
    check(e.unsqueeze(0), x[None], 1e-4)
    check(e.squeeze(), x, 1e-4)
    check(e.roll(2, dims=1), np.roll(x, 2, axis=1), 1e-4)
    check(e.flip(0), np.flip(x, 0), 1e-4)
    check(e.sum(axis=1), x.sum(axis=1), 1e-3)
    check(e.mean(axis=2), x.mean(axis=2), 1e-3)
    check(e.cumsum(1), np.cumsum(x, axis=1), 1e-3)
    check(e.narrow(1, 1, 2), x[:, 1:3], 1e-4)
    check(e[1], x[1], 1e-4)


def test_var_prod(rng):
    x = rng.normal(size=(4, 6))
    check(enc(x).var(axis=1), x.var(axis=1), 0.05)
    small = rng.uniform(0.5, 1.5, size=(5,))
    check(enc(small).prod(axis=0), small.prod(), 0.05)


def test_stack_cat(rng):
    x = rng.normal(size=(3, 4))
    y = rng.normal(size=(3, 4))
    check(curl_tpu.cat([enc(x), enc(y)], dim=0), np.concatenate([x, y]), 1e-4)
    check(curl_tpu.stack([enc(x), enc(y)]), np.stack([x, y]), 1e-4)


def test_index_padding(rng):
    x = rng.normal(size=(3, 4))
    e = enc(x)
    check(e.pad((1, 1), value=2.0), np.pad(x, ((0, 0), (1, 1)), constant_values=2.0), 1e-4)
    idx = np.array([2, 0])
    check(e.index_select(0, idx), x[idx], 1e-4)


def test_where_public_condition(rng):
    x = rng.normal(size=(5,))
    y = rng.normal(size=(5,))
    cond = np.array([1, 0, 1, 1, 0], dtype=bool)
    check(enc(x).where(cond, enc(y)), np.where(cond, x, y), 1e-2)


@pytest.mark.parametrize("world_size", [3])
def test_three_party_truncation(world_size, rng):
    """>2PC division path: wrap-corrected truncation."""
    reinit(world_size=world_size)
    x = rng.normal(size=(100,)) * 10
    out = (enc(x) * enc(np.full(100, 2.0))).get_plain_text()
    np.testing.assert_allclose(out, 2 * x, atol=0.05)
    reinit(world_size=2)


@pytest.mark.parametrize("world_size", [3])
def test_crypten_truncation_3pc(world_size, rng):
    """The wrap-corrected truncate protocol (>2PC, crypten trunc method)."""
    reinit(world_size=world_size)
    with curl_tpu.cfg.temp_override({"encoder.trunc_method.prod": "crypten"}):
        x = rng.normal(size=(200,)) * 20
        y = rng.normal(size=(200,)) * 20
        out = (enc(x) * enc(y)).get_plain_text()
        # wrap correction fails w.p. ~|x|/2^64 per element; allow no failures
        np.testing.assert_allclose(out, x * y, atol=0.1)
    reinit(world_size=2)
