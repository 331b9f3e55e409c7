"""Fused Pallas ring-matmul: bit-exactness vs the XLA limb path.

The kernel math runs in interpreter mode on CPU, so the exact traced code
is validated off-device against ring.matmul (itself golden-tested for
mod-2^64 exactness in tests/test_ring.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from curl_tpu import ring
from curl_tpu.ops import pallas_ring_mm as pmm


def rand_u64(rng, shape):
    return jnp.asarray(
        rng.integers(0, 1 << 64, size=shape, dtype=np.uint64)
    )


@pytest.mark.parametrize(
    "M,K,N",
    [
        (4, 16, 8),            # tiny: exercises full-tile padding
        (64, 512, 256),        # exactly one tile
        (65, 700, 300),        # ragged in every dim
        (128, 1024, 512),      # multi-tile in m, k, n
    ],
)
def test_matches_xla_ring_matmul(M, K, N):
    rng = np.random.default_rng(42 + M)
    a = rand_u64(rng, (M, K))
    b = rand_u64(rng, (K, N))
    ref = ring.matmul(a, b)
    got = pmm.matmul_3d(a[None], b[None], interpret=True)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_batched_and_vmap():
    import jax

    rng = np.random.default_rng(7)
    a = rand_u64(rng, (3, 8, 96))
    b = rand_u64(rng, (3, 96, 40))
    ref = ring.matmul(a, b)

    # interpret mode for the CPU test environment
    orig = pmm.matmul_3d
    pmm_interp = lambda x, y: orig(x, y, interpret=True)  # noqa: E731
    try:
        pmm.matmul_3d = pmm_interp
        got = pmm.matmul(a, b)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        # party-style vmap over a leading axis folds into the batch grid
        a2 = rand_u64(rng, (2, 8, 64))
        b2 = rand_u64(rng, (2, 64, 24))
        ref2 = ring.matmul(a2, b2)
        got2 = jax.vmap(lambda x, y: pmm.matmul(x, y))(a2, b2)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))

        # vmap with an unbatched (public) right operand
        got3 = jax.vmap(lambda x: pmm.matmul(x, b2[0]))(a2)
        ref3 = ring.matmul(a2, jnp.broadcast_to(b2[0], (2, 64, 24)))
        np.testing.assert_array_equal(np.asarray(got3), np.asarray(ref3))
    finally:
        pmm.matmul_3d = orig


def test_tile_math_standalone():
    """The in-kernel decompose/contract step agrees with the XLA limb path
    on one unpadded tile."""
    rng = np.random.default_rng(3)
    a = rand_u64(rng, (64, 512))
    b = rand_u64(rng, (512, 256))
    from curl_tpu.ops import u64pair as up

    al, ah = up.from_u64(a)
    bl, bh = up.from_u64(b)
    acc = pmm.mm_tile_math(al, ah, bl, bh)
    lo, hi = pmm._combine_planes_pair(acc, 64, 256)
    got = up.to_u64(lo, hi)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(ring.matmul(a, b))
    )


@pytest.mark.parametrize(
    "n_pairs,M,K,N",
    [
        (2, 4, 16, 8),         # tiny, padded
        (3, 64, 512, 256),     # exactly one tile, masked-protocol arity
        (2, 65, 700, 300),     # ragged in every dim
        (3, 32, 96, 520),      # multi-tile in n only
    ],
)
def test_matmul_acc_matches_summed(n_pairs, M, K, N):
    """The multi-pair accumulate kernel == sum of separate ring matmuls."""
    rng = np.random.default_rng(1000 + 7 * n_pairs + M)
    pairs = [
        (rand_u64(rng, (M, K)), rand_u64(rng, (K, N)))
        for _ in range(n_pairs)
    ]
    ref = ring.matmul(*pairs[0])
    for a, b in pairs[1:]:
        ref = ref + ring.matmul(a, b)
    got = pmm.matmul_acc(pairs, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_matmul_acc_vmap_and_broadcast():
    """Party-style vmap folds into the batch grid; unbatched (public)
    operands broadcast — the exact shapes the Beaver protocols feed it."""
    import jax

    rng = np.random.default_rng(77)
    eps = rand_u64(rng, (8, 96))            # public (revealed), unbatched
    delta = rand_u64(rng, (96, 40))         # public (revealed), unbatched
    xs = rand_u64(rng, (2, 8, 96))          # per-party share
    bs = rand_u64(rng, (2, 96, 40))         # per-party mask share

    ref = ring.matmul(jnp.broadcast_to(eps, (2, 8, 96)), bs) + ring.matmul(
        xs, jnp.broadcast_to(delta, (2, 96, 40))
    )
    got = jax.vmap(
        lambda x, b: pmm.matmul_acc([(eps, b), (x, delta)], interpret=True)
    )(xs, bs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ring_matmul_acc_fallback():
    """ring.matmul_acc off-TPU falls back to summed matmuls (and handles
    ragged Ks via the fallback)."""
    rng = np.random.default_rng(5)
    a1, b1 = rand_u64(rng, (6, 32)), rand_u64(rng, (32, 10))
    a2, b2 = rand_u64(rng, (6, 48)), rand_u64(rng, (48, 10))
    ref = ring.matmul(a1, b1) + ring.matmul(a2, b2)
    got = ring.matmul_acc([(a1, b1), (a2, b2)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_shared_operand_paths():
    """2-D operands stay SHARED through the kernel (no broadcast copy):
    host-batched a x 2-D b, vmap over party with in_axes=None weights, and
    the acc kernel with per-pair shared tables."""
    import jax

    rng = np.random.default_rng(31)
    a3 = rand_u64(rng, (3, 8, 96))
    w2 = rand_u64(rng, (96, 40))
    ref = ring._xla_matmul(
        a3, jnp.broadcast_to(w2, (3,) + w2.shape)
    )
    orig = pmm.matmul_3d
    pmm_interp = lambda x, y: orig(x, y, interpret=True)  # noqa: E731
    try:
        pmm.matmul_3d = pmm_interp
        got = pmm.matmul(a3, w2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        # vmap over a party axis with a shared (in_axes=None) weight
        a_p = rand_u64(rng, (2, 8, 96))  # per-party activations
        got_v = jax.vmap(lambda x: pmm.matmul(x, w2))(a_p)
        ref_v = ring._xla_matmul(a_p, jnp.broadcast_to(w2, (2,) + w2.shape))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

        # per-party 2-D activations x host-batched other side (batched 3-D
        # under vmap rule)
        b_h = rand_u64(rng, (3, 96, 24))
        got_m = jax.vmap(lambda x: pmm.matmul(x[0], b_h))(a_p[:, None])
        ref_m = np.stack([
            np.asarray(ring._xla_matmul(
                jnp.broadcast_to(a_p[i], (3,) + a_p[i].shape[-2:]), b_h))
            for i in range(2)
        ])
        np.testing.assert_array_equal(np.asarray(got_m), ref_m)
    finally:
        pmm.matmul_3d = orig

    # acc kernel: batched eps/x lhs against SHARED 2-D tables
    lhs = [rand_u64(rng, (4, 6, 50)) for _ in range(3)]
    tbl = [rand_u64(rng, (50, 12)) for _ in range(3)]
    got = pmm.matmul_acc(list(zip(lhs, tbl)), interpret=True)
    ref = None
    for a, b in zip(lhs, tbl):
        r = ring._xla_matmul(a, jnp.broadcast_to(b, (4,) + b.shape))
        ref = r if ref is None else ref + r
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # acc kernel under party vmap: shared tables + per-party lhs
    import jax

    lhs_p = [rand_u64(rng, (2, 6, 50)) for _ in range(2)]
    tbl_p = [rand_u64(rng, (50, 12)) for _ in range(2)]
    got_v = jax.vmap(
        lambda l0, l1: pmm.matmul_acc(
            [(l0, tbl_p[0]), (l1, tbl_p[1])], interpret=True
        )
    )(lhs_p[0], lhs_p[1])
    ref_v = None
    for lp, b in zip(lhs_p, tbl_p):
        r = ring._xla_matmul(lp, jnp.broadcast_to(b, (2,) + b.shape))
        ref_v = r if ref_v is None else ref_v + r
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
