"""Direct unit tests of the ring layer (curl_tpu/ring.py): exact mod-2^64
semantics, limb matmul/conv exactness, signed division helpers."""

import numpy as np
import pytest

import jax.numpy as jnp

from curl_tpu import ring


def ru64(rng, shape, hi=2**63):
    return jnp.asarray(rng.integers(0, hi, size=shape, dtype=np.uint64))


def test_elementwise_wraparound(rng):
    a = jnp.asarray(np.array([2**63, 2**64 - 1, 5], dtype=np.uint64))
    b = jnp.asarray(np.array([2**63, 1, 2**62], dtype=np.uint64))
    np.testing.assert_array_equal(
        np.asarray(ring.add(a, b)),
        (np.asarray(a) + np.asarray(b)),
    )
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(
            np.asarray(ring.mul(a, b)), np.asarray(a) * np.asarray(b)
        )


def test_matmul_exact_random(rng):
    a = ru64(rng, (9, 17))
    b = ru64(rng, (17, 5))
    got = np.asarray(ring.matmul(a, b))
    with np.errstate(over="ignore"):
        ref = (np.asarray(a)[:, :, None] * np.asarray(b)[None]).sum(
            axis=1, dtype=np.uint64
        )
    np.testing.assert_array_equal(got, ref)


def test_matmul_batched_and_vec(rng):
    a = ru64(rng, (2, 4, 8))
    b = ru64(rng, (2, 8, 3))
    got = np.asarray(ring.matmul(a, b))
    with np.errstate(over="ignore"):
        ref = np.stack(
            [
                (np.asarray(a)[i][:, :, None] * np.asarray(b)[i][None]).sum(
                    axis=1, dtype=np.uint64
                )
                for i in range(2)
            ]
        )
    np.testing.assert_array_equal(got, ref)
    # vector forms
    v = ru64(rng, (8,))
    m = ru64(rng, (8, 8))
    with np.errstate(over="ignore"):
        ref_v = (np.asarray(v)[:, None] * np.asarray(m)).sum(0, dtype=np.uint64)
    np.testing.assert_array_equal(np.asarray(ring.matmul(v, m)), ref_v)


def test_trunc_div_signed():
    vals = np.array([-7, 7, -8, 8, -1, 0], dtype=np.int64)
    a = jnp.asarray(vals.view(np.uint64))
    got = np.asarray(ring.trunc_div_pow2_signed(a, 2)).view(np.int64)
    np.testing.assert_array_equal(got, np.trunc(vals / 4).astype(np.int64))
    got3 = np.asarray(ring.trunc_div_signed(a, 3)).view(np.int64)
    np.testing.assert_array_equal(got3, np.trunc(vals / 3).astype(np.int64))


def test_floormod_and_shifts():
    v = np.array([-5, 5, -64], dtype=np.int64)
    a = jnp.asarray(v.view(np.uint64))
    np.testing.assert_array_equal(
        np.asarray(ring.floormod_pow2(a, 4)).view(np.int64), v % 16
    )
    np.testing.assert_array_equal(
        np.asarray(ring.shift_right_arith(a, 2)).view(np.int64), v >> 2
    )


def test_count_wraps():
    big = np.int64(2**62)
    stacked = jnp.asarray(
        np.array([[big, -big], [big, -big], [big, -big]], dtype=np.int64).view(
            np.uint64
        )
    )
    wraps = np.asarray(ring.count_wraps(stacked)).view(np.int64)
    # 3 * 2^62 wraps once positive; negatives wrap once negative
    np.testing.assert_array_equal(wraps, [1, -1])


def test_conv2d_exact_vs_int(rng):
    x = ru64(rng, (1, 2, 6, 6), hi=2**20)
    w = ru64(rng, (3, 2, 3, 3), hi=2**20)
    got = np.asarray(ring.conv2d(x, w, padding=1))
    import torch

    ref = torch.nn.functional.conv2d(
        torch.tensor(np.asarray(x).astype(np.int64)),
        torch.tensor(np.asarray(w).astype(np.int64)),
        padding=1,
    ).numpy().astype(np.uint64)
    np.testing.assert_array_equal(got, ref)


def test_balanced_limb_roundtrip(rng):
    x = ru64(rng, (4, 7))
    limbs = ring._balanced_limbs(x)
    assert limbs.dtype == jnp.int8
    # recombine: sum d_i 2^(8i) mod 2^64
    acc = jnp.zeros(x.shape, jnp.uint64)
    for i in range(8):
        acc = acc + (
            limbs[..., i].astype(jnp.int64).view(jnp.uint64) << jnp.uint64(8 * i)
        )
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(x))
