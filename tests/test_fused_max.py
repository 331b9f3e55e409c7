"""Fused max-step kernel math (ops/pallas_max_step.py, ops/u64pair.py).

The kernel's protocol math is a pure function over u32-pair planes with an
injectable randomness source, so the EXACT code that Mosaic traces is
validated here on CPU against uint64 ground truth; only the hardware-PRNG
wrapper needs a TPU (scripts/validate_fused_max.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu.ops import u64pair as up
from curl_tpu.ops.pallas_max_step import max_step_math


@pytest.fixture()
def rng():
    return np.random.default_rng(20260818)


def _r64(rng, n):
    return rng.integers(0, 1 << 64, size=n, dtype=np.uint64)


def test_u64pair_ops_exact(rng):
    n = 4096
    a = _r64(rng, n)
    b = _r64(rng, n)
    # force carry/borrow/overflow edges
    a[:4] = [0, (1 << 64) - 1, 1 << 63, (1 << 32) - 1]
    b[:4] = [0, 1, 1 << 63, 1]
    ap = up.from_u64(jnp.asarray(a))
    bp = up.from_u64(jnp.asarray(b))

    np.testing.assert_array_equal(np.asarray(up.to_u64(*up.add(ap, bp))), a + b)
    np.testing.assert_array_equal(np.asarray(up.to_u64(*up.sub(ap, bp))), a - b)
    np.testing.assert_array_equal(np.asarray(up.to_u64(*up.mul(ap, bp))), a * b)
    np.testing.assert_array_equal(np.asarray(up.to_u64(*up.neg(ap))), 0 - a)
    np.testing.assert_array_equal(
        np.asarray(up.to_u64(*up.xor(ap, bp))), a ^ b
    )
    np.testing.assert_array_equal(
        np.asarray(up.to_u64(*up.and_(ap, bp))), a & b
    )
    np.testing.assert_array_equal(np.asarray(up.to_u64(*up.not_(ap))), ~a)
    for k in (0, 1, 16, 31, 32, 33, 63):
        np.testing.assert_array_equal(
            np.asarray(up.to_u64(*up.shl(ap, k))), a << np.uint64(k)
        )
        np.testing.assert_array_equal(
            np.asarray(up.to_u64(*up.shr(ap, k))), a >> np.uint64(k)
        )
    c64 = 0x0123456789ABCDEF
    np.testing.assert_array_equal(
        np.asarray(up.to_u64(*up.and_const(ap, c64))), a & np.uint64(c64)
    )
    np.testing.assert_array_equal(
        np.asarray(up.to_u64(*up.xor_const(ap, c64))), a ^ np.uint64(c64)
    )


def _make_rand_source(seed, rows):
    key = [jax.random.PRNGKey(seed)]

    def rbits():
        key[0], k = jax.random.split(key[0])
        return (
            jax.random.bits(k, (rows, 128), dtype=jnp.uint32),
            jax.random.bits(jax.random.fold_in(k, 1), (rows, 128), dtype=jnp.uint32),
        )

    def rbit():
        key[0], k = jax.random.split(key[0])
        return jax.random.bits(k, (2, rows, 128), dtype=jnp.uint32) & jnp.uint32(1)

    return rbits, rbit


def _run_step(rng, a_dec, b_dec, seed=42, rows=8):
    """Share values, run the fused math, return (decoded out, out shares)."""
    n = 2 * rows * 128
    assert a_dec.size == n
    enc = lambda v: np.round(v * 65536).astype(np.int64).astype(np.uint64)  # noqa: E731
    av, bv = enc(a_dec), enc(b_dec)
    c0 = _r64(rng, n)
    c1 = av - c0
    r0 = _r64(rng, n)
    r1 = bv - r0

    def planes(s):
        return up.from_u64(jnp.asarray(s.reshape(2, rows, 128)))

    rbits, rbit = _make_rand_source(seed, rows)
    n0, n1 = max_step_math(
        planes(c0), planes(c1), planes(r0), planes(r1), rbits, rbit
    )
    out0 = np.asarray(up.to_u64(*n0)).reshape(n)
    out1 = np.asarray(up.to_u64(*n1)).reshape(n)
    return out0 + out1, (out0, out1), (av, bv)


def test_max_step_math_exact(rng):
    rows = 8
    n = 2 * rows * 128
    a = rng.normal(size=n) * 1000
    b = rng.normal(size=n) * 1000
    # edges: exact tie, near-tie one quantum apart, envelope extremes, zeros
    a[0] = b[0] = 5.0
    a[1], b[1] = -3000.0, 2999.5
    a[2], b[2] = 1.0 / 65536, 0.0
    a[3], b[3] = 0.0, 0.0
    a[4], b[4] = 16000.0, -16000.0
    a[5], b[5] = -16000.0, 16000.0
    got, shares, (av, bv) = _run_step(rng, a, b)
    want = np.where(av.astype(np.int64) >= bv.astype(np.int64), av, bv)
    np.testing.assert_array_equal(got, want)
    # shares individually reveal nothing trivially (not the plaintext)
    assert not np.array_equal(shares[0], want)


def test_max_step_math_randomized_shares(rng):
    """Same inputs, different protocol randomness -> same value, different
    shares (fresh masking every step)."""
    rows = 8
    n = 2 * rows * 128
    a = rng.normal(size=n) * 10
    b = rng.normal(size=n) * 10
    got1, sh1, _ = _run_step(rng, a, b, seed=1)
    got2, sh2, _ = _run_step(rng, a, b, seed=2)
    np.testing.assert_array_equal(got1, got2)
    assert not np.array_equal(sh1[0], sh2[0])


def test_fused_matches_unfused_protocol(rng):
    """Decoded fused step == the composable MPC path's select on the same
    values (both exact in-envelope, so bit-identical decodes)."""
    import curl_tpu

    curl_tpu.init(world_size=2, seed=3)
    rows = 8
    n = 2 * rows * 128
    a = rng.normal(size=n) * 100
    b = rng.normal(size=n) * 100
    got, _, _ = _run_step(rng, a, b)
    dec = got.astype(np.int64).astype(np.float64) / 65536

    ae = curl_tpu.cryptensor(a)
    be = curl_tpu.cryptensor(b)
    keep = ae.ge(be)
    want = ae.sub(be).mul(keep).add(be).get_plain_text()
    # one fixed-point quantum of slack: this test's encode rounds slightly
    # differently from FixedPointEncoder; the protocols themselves are exact
    np.testing.assert_allclose(dec, want, atol=1.6e-5)


def test_ltz_bit_math_exact(rng):
    """Fused LTZ math: decoded arithmetic bit shares == sign of the
    difference, over random values plus ring-edge cases."""
    from curl_tpu.ops.pallas_max_step import ltz_bit_math

    rows = 8
    n = 2 * rows * 128
    vals = (rng.normal(size=n) * 1000).astype(np.float64)
    vals[0] = 0.0
    vals[1] = -1.0 / 65536          # smallest negative quantum
    vals[2] = 1.0 / 65536
    vals[3] = -16000.0              # packed-32 envelope extremes
    vals[4] = 16000.0
    enc = np.round(vals * 65536).astype(np.int64)
    d = enc.astype(np.uint64)
    d0 = _r64(rng, n)
    d1 = d - d0

    def planes(s):
        return up.from_u64(jnp.asarray(s.reshape(2, rows, 128)))

    rbits, rbit = _make_rand_source(7, rows)
    a0, a1 = ltz_bit_math(planes(d0), planes(d1), rbits, rbit)
    out0 = np.asarray(up.to_u64(*a0)).reshape(n)
    out1 = np.asarray(up.to_u64(*a1)).reshape(n)
    got = out0 + out1  # uint64 wraparound = mod 2^64 reconstruction
    want = (enc < 0).astype(np.uint64)
    np.testing.assert_array_equal(got, want)
    # shares are masked (not the plaintext bit)
    assert not np.array_equal(out0, want)


def test_ltz_bit_math_fresh_shares(rng):
    from curl_tpu.ops.pallas_max_step import ltz_bit_math

    rows = 8
    n = 2 * rows * 128
    d = _r64(rng, n) >> np.uint64(33)  # small positive values
    d0 = _r64(rng, n)
    d1 = d - d0

    def planes(s):
        return up.from_u64(jnp.asarray(s.reshape(2, rows, 128)))

    outs = []
    for seed in (11, 12):
        rbits, rbit = _make_rand_source(seed, rows)
        a0, a1 = ltz_bit_math(planes(d0), planes(d1), rbits, rbit)
        outs.append(
            (np.asarray(up.to_u64(*a0)).reshape(n),
             np.asarray(up.to_u64(*a1)).reshape(n))
        )
    np.testing.assert_array_equal(outs[0][0] + outs[0][1],
                                  outs[1][0] + outs[1][1])
    assert not np.array_equal(outs[0][0], outs[1][0])
