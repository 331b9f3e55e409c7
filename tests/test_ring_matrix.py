"""Limb-path equivalence matrix (the intent of reference test/test_cuda.py:
CUDALongTensor vs CPU-int64 op equivalence, 616 LoC): every op that routes
through ring.py's balanced-int8-limb decomposition is asserted BIT-EQUAL
between (a) the XLA limb path, (b) the fused Pallas kernel path (interpret
mode on CPU — the exact traced kernel code), and (c) a numpy mod-2^64
oracle, across shapes including non-tile multiples and adversarial values
(0, 2^63, 2^64-1, alternating sign bytes).

Also parametrizes the kernel's _PER_LIMB_DOTS branch (both the per-limb
lane-slice dots and the concatenated single-dot form must be identical
math) and the ring_mm_kernel="auto" gating in ring.matmul/matmul_acc.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from curl_tpu import ring
from curl_tpu.ops import pallas_ring_mm as pmm


def ru64(rng, shape):
    return jnp.asarray(rng.integers(0, 1 << 64, size=shape, dtype=np.uint64))


def np_matmul_mod64(a, b):
    """numpy mod-2^64 oracle via python-int objects (no overflow tricks)."""
    a = np.asarray(a, dtype=np.uint64).astype(object)
    b = np.asarray(b, dtype=np.uint64).astype(object)
    out = (a[..., :, :, None] * b[..., None, :, :]).sum(axis=-2)
    return (out % (1 << 64)).astype(np.uint64)


ADVERSARIAL = np.array(
    [0, 1, (1 << 63), (1 << 64) - 1, 0x8080808080808080, 0x7F7F7F7F7F7F7F7F],
    dtype=np.uint64,
)


# ---------------------------------------------------------------------------
# matmul: XLA limb path vs numpy oracle vs Pallas kernel (interpret)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "M,K,N",
    [
        (1, 1, 1),
        (3, 5, 2),        # tiny ragged
        (8, 130, 16),     # K just over a lane multiple
        (65, 513, 129),   # ragged in every tile dim
    ],
)
def test_matmul_three_way(M, K, N):
    rng = np.random.default_rng(M * 1000 + K + N)
    a = ru64(rng, (M, K))
    b = ru64(rng, (K, N))
    # splice adversarial values into both operands
    a = a.at[0, : min(K, len(ADVERSARIAL))].set(ADVERSARIAL[: min(K, len(ADVERSARIAL))])
    b = b.at[: min(K, len(ADVERSARIAL)), 0].set(ADVERSARIAL[: min(K, len(ADVERSARIAL))])
    oracle = np_matmul_mod64(np.asarray(a), np.asarray(b))
    xla = np.asarray(ring._xla_matmul(a, b))
    np.testing.assert_array_equal(xla, oracle)
    kern = np.asarray(pmm.matmul_3d(a[None], b[None], interpret=True)[0])
    np.testing.assert_array_equal(kern, oracle)


@pytest.mark.parametrize("per_limb", [True, False])
def test_per_limb_dots_branches(monkeypatch, per_limb):
    """ADVICE r3: both _PER_LIMB_DOTS branches are live-tested (the
    concatenated-dot form must stay bit-identical to the lane-slice form)."""
    monkeypatch.setattr(pmm, "_PER_LIMB_DOTS", per_limb)
    jax.clear_caches()  # the flag is read at trace time; drop stale traces
    try:
        rng = np.random.default_rng(11 if per_limb else 13)
        a = ru64(rng, (9, 70))
        b = ru64(rng, (70, 17))
        oracle = np_matmul_mod64(np.asarray(a), np.asarray(b))
        got = np.asarray(pmm.matmul_3d(a[None], b[None], interpret=True)[0])
        np.testing.assert_array_equal(got, oracle)
        # the multi-pair accumulate kernel reads the same flag
        pairs = [(a[None], b[None]), (a[None], b[None])]
        acc = np.asarray(pmm.matmul_acc(pairs, interpret=True)[0])
        two = (oracle.astype(object) * 2 % (1 << 64)).astype(np.uint64)
        np.testing.assert_array_equal(acc, two)
    finally:
        jax.clear_caches()


def test_matmul_acc_three_pairs_vs_oracle():
    rng = np.random.default_rng(21)
    pairs = [(ru64(rng, (4, 33)), ru64(rng, (33, 6))) for _ in range(3)]
    oracle = sum(
        np_matmul_mod64(np.asarray(a), np.asarray(b)).astype(object)
        for a, b in pairs
    )
    oracle = (oracle % (1 << 64)).astype(np.uint64)
    got = np.asarray(
        pmm.matmul_acc([(a[None], b[None]) for a, b in pairs], interpret=True)[0]
    )
    np.testing.assert_array_equal(got, oracle)
    # the XLA fallback in ring.matmul_acc must agree
    fallback = np.asarray(ring.matmul_acc(pairs))
    np.testing.assert_array_equal(fallback, oracle)


def test_ring_mm_auto_gate_dispatches(monkeypatch):
    """ring_mm_kernel='auto' must route big-enough TPU matmuls to the
    kernel and everything on CPU to the XLA path; 'off' must never call
    the kernel. Verified by counting kernel entries via monkeypatch."""
    calls = {"n": 0}
    orig = pmm.matmul

    def counting(a, b):
        calls["n"] += 1
        return orig(a, b)

    monkeypatch.setattr(pmm, "matmul", counting)
    rng = np.random.default_rng(5)
    a, b = ru64(rng, (32, 64)), ru64(rng, (64, 48))
    out = ring.matmul(a, b)  # CPU backend -> XLA path
    assert calls["n"] == 0
    np.testing.assert_array_equal(
        np.asarray(out), np_matmul_mod64(np.asarray(a), np.asarray(b))
    )


# ---------------------------------------------------------------------------
# convolutions: limb path vs torch int64 oracle (exact two's complement)
# ---------------------------------------------------------------------------

def _torch_i64(x):
    import torch

    return torch.tensor(np.asarray(x).view(np.int64))


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 2),
])
def test_conv2d_matrix(stride, padding, dilation, groups):
    import torch

    rng = np.random.default_rng(stride * 7 + padding * 3 + dilation + groups)
    x = ru64(rng, (2, 2 * groups, 7, 6))
    w = ru64(rng, (4, 2, 3, 3))
    got = np.asarray(ring.conv2d(x, w, stride=stride, padding=padding,
                                 dilation=dilation, groups=groups))
    ref = torch.nn.functional.conv2d(
        _torch_i64(x), _torch_i64(w), stride=stride, padding=padding,
        dilation=dilation, groups=groups,
    ).numpy().astype(np.int64).view(np.uint64)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 0, 1), (2, 1, 1), (1, 1, 3)])
def test_conv1d_matrix(stride, padding, dilation):
    import torch

    rng = np.random.default_rng(stride + padding * 11 + dilation)
    x = ru64(rng, (2, 3, 11))
    w = ru64(rng, (5, 3, 4))
    got = np.asarray(ring.conv1d(x, w, stride=stride, padding=padding,
                                 dilation=dilation))
    ref = torch.nn.functional.conv1d(
        _torch_i64(x), _torch_i64(w), stride=stride, padding=padding,
        dilation=dilation,
    ).numpy().astype(np.int64).view(np.uint64)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("stride,padding,output_padding", [
    (1, 0, 0), (2, 1, 1), (3, 2, 0),
])
def test_conv_transpose2d_matrix(stride, padding, output_padding):
    import torch

    if output_padding >= stride:
        pytest.skip("torch requires output_padding < stride")
    rng = np.random.default_rng(stride * 13 + padding + output_padding)
    x = ru64(rng, (1, 3, 5, 4))
    w = ru64(rng, (3, 2, 3, 3))  # IOHW
    got = np.asarray(ring.conv_transpose2d(
        x, w, stride=stride, padding=padding, output_padding=output_padding))
    ref = torch.nn.functional.conv_transpose2d(
        _torch_i64(x), _torch_i64(w), stride=stride, padding=padding,
        output_padding=output_padding,
    ).numpy().astype(np.int64).view(np.uint64)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1)])
def test_conv_transpose1d_matrix(stride, padding):
    import torch

    rng = np.random.default_rng(stride * 3 + padding)
    x = ru64(rng, (2, 2, 9))
    w = ru64(rng, (2, 3, 4))
    got = np.asarray(ring.conv_transpose1d(x, w, stride=stride, padding=padding))
    ref = torch.nn.functional.conv_transpose1d(
        _torch_i64(x), _torch_i64(w), stride=stride, padding=padding,
    ).numpy().astype(np.int64).view(np.uint64)
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# long-tail ring ops over adversarial values (sum/cumsum/shift family are
# plain uint64 XLA ops, pinned here against python-int semantics)
# ---------------------------------------------------------------------------

def test_sum_cumsum_adversarial():
    vals = np.concatenate([ADVERSARIAL, ADVERSARIAL])[None].repeat(3, 0)
    x = jnp.asarray(vals)
    got_sum = np.asarray(x.sum(axis=1))
    oracle = (vals.astype(object).sum(axis=1) % (1 << 64)).astype(np.uint64)
    np.testing.assert_array_equal(got_sum, oracle)
    got_cum = np.asarray(jnp.cumsum(x, axis=1))
    oracle_c = (vals.astype(object).cumsum(axis=1) % (1 << 64)).astype(np.uint64)
    np.testing.assert_array_equal(got_cum, oracle_c)


def test_mul_pow2_and_shift_adversarial():
    x = jnp.asarray(ADVERSARIAL)
    for bits in (0, 1, 7, 63):
        got = np.asarray(ring.mul_pow2(x, bits))
        oracle = ((ADVERSARIAL.astype(object) << bits) % (1 << 64)).astype(np.uint64)
        np.testing.assert_array_equal(got, oracle)
        got_r = np.asarray(ring.shift_right_logical(x, bits))
        np.testing.assert_array_equal(
            got_r, (ADVERSARIAL.astype(object) >> bits).astype(np.uint64)
        )
