"""Beaver masked-operand reuse (beaver.mask_operand / MaskedArithmetic):
mask a reused secret operand once, pay only input-sized randomness and an
eps reveal per product."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import curl_tpu
from curl_tpu import cfg


@pytest.fixture(autouse=True)
def _init():
    curl_tpu.init(world_size=2, seed=13)


def test_masked_matmul_decodes_and_reuses():
    from curl_tpu.mpc.primitives import beaver

    rng = np.random.default_rng(0)
    w = rng.normal(size=(6, 5))
    xs = [rng.normal(size=(4, 6)) for _ in range(3)]

    def fn(wm, *xms):
        masked = beaver.mask_operand(wm._tensor)
        assert type(masked).__name__ == "MaskedArithmetic"
        return [xm._wrap(beaver.matmul(xm._tensor, masked)) for xm in xms]

    we = curl_tpu.cryptensor(w)
    xes = [curl_tpu.cryptensor(x) for x in xs]
    outs = curl_tpu._eager_run(fn, we, *xes)
    for out, x in zip(outs, xs):
        got = np.asarray(out.get_plain_text())
        # product of two scale-2^16 encodings, no rescale applied at the
        # protocol layer: exact up to the inputs' own encoding quantization,
        # which propagates as ~K*(|x|+|w|)/2 ulps of the 2^16 scale
        np.testing.assert_allclose(got, (x @ w) * (1 << 16), rtol=1e-4,
                                   atol=16.0)


def test_masked_share_fallback_roundtrip():
    """MaskedArithmetic.share reconstructs a valid ordinary share, so
    non-product ops (reveal, add) work transparently."""
    from curl_tpu.mpc.primitives import beaver

    rng = np.random.default_rng(1)
    w = rng.normal(size=(8,))

    def fn(wm):
        masked = beaver.mask_operand(wm._tensor)
        return wm._wrap(masked.with_share(masked.share + masked.share))

    we = curl_tpu.cryptensor(w)
    out = curl_tpu._eager_run(fn, we)
    np.testing.assert_allclose(
        np.asarray(out.get_plain_text()), 2 * w, atol=1e-3
    )


def test_mask_declines_under_cache_flows():
    """The gate must agree between cache recording and serving traces."""
    from curl_tpu.encoder import FixedPointEncoder
    from curl_tpu.mpc import get_default_provider
    from curl_tpu.mpc.primitives import beaver
    from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor
    from curl_tpu.mpc.provider.provider import TupleCache

    provider = get_default_provider()

    def declined():
        x = ArithmeticSharedTensor(
            jnp.zeros((3,), jnp.uint64), FixedPointEncoder(0)
        )
        return beaver.mask_operand(x) is x

    provider.trace(True)
    try:
        assert declined()  # recording trace
    finally:
        provider.trace(False)
    provider.attach_serving_cache(TupleCache([]))
    try:
        assert declined()  # serving trace
    finally:
        provider.attach_serving_cache(None)


def test_gpt_batched_head_premask_parity():
    """Batch-2 GPT head chunking (which triggers the premask) decodes
    within envelope of the plain forward."""
    from curl_tpu import models
    from curl_tpu.nn.plain import PlainTensor

    with cfg.temp_override({"models.head_chunk_positions": 8,
                            "functions.max_method": "scan_reduction"}):
        curl_tpu.init(world_size=2, seed=31)
        m = models.GPT(embed_dim=16, num_heads=2, num_blocks=1,
                       vocab_size=40, seq_len=8, full=True)
        x = (np.arange(16, dtype=np.float64).reshape(2, 8) * 3) % 40
        plain = np.asarray(m(PlainTensor(x)).get_plain_text())
        m.encrypt(src=0)
        apply_fn, params = m.functional()
        xe = curl_tpu.cryptensor(x, precision=0)
        step = curl_tpu.compile_parties(apply_fn, world_size=2)
        out = step(jax.random.PRNGKey(5), params, xe.mpc)
        got = np.asarray(curl_tpu.CrypTensor(out).get_plain_text())
    assert got.shape == plain.shape == (2, 8, 40)
    assert np.abs(got - plain).max() < 0.08
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=0.08)


def test_masked_embedding_lookup_parity():
    """evaluate_embed against a Beaver-masked table decodes identically to
    the unmasked protocol path."""
    from curl_tpu.mpc.primitives import beaver

    rng = np.random.default_rng(4)
    table = rng.normal(size=(32, 6))
    ids = np.array([0, 3, 31, 17, 5], dtype=np.float64)

    def fn(masked_mode, wm, xm):
        t = beaver.mask_operand(wm._tensor) if masked_mode else wm._tensor
        return xm._wrap(xm._tensor.evaluate_embed(t))

    we = curl_tpu.cryptensor(table)
    xe = curl_tpu.cryptensor(ids, precision=0)
    plainout = {}
    for mode in (False, True):
        out = curl_tpu._eager_run(lambda w, x: fn(mode, w, x), we, xe)
        plainout[mode] = np.asarray(out.get_plain_text())
        np.testing.assert_allclose(
            plainout[mode], table[ids.astype(int)], atol=2e-4
        )


@pytest.mark.parametrize("masked_mode", [True, False])
def test_matmul_fused_kernel_protocol_parity(masked_mode):
    """The fused multi-pair kernel path (ring.matmul_acc -> pallas,
    interpret mode) decodes IDENTICALLY to the CPU fallback path, for both
    the masked-operand (3-pair) and ordinary Beaver (2-pair) protocols —
    same RNG draw order, so the output shares are bit-equal."""
    import functools

    from curl_tpu import ring
    from curl_tpu.mpc.primitives import beaver
    from curl_tpu.ops import pallas_ring_mm as pmm

    rng = np.random.default_rng(31)
    x = rng.normal(size=(6, 32))
    w = rng.normal(size=(32, 10)) * 0.1

    def fn(xm, wm):
        t = beaver.mask_operand(wm._tensor) if masked_mode else wm._tensor
        return xm._wrap(beaver.matmul(xm._tensor, t))

    xe = curl_tpu.cryptensor(x)
    we = curl_tpu.cryptensor(w)

    plain_out = curl_tpu._eager_run(fn, xe, we)
    plain_val = np.asarray(plain_out.get_plain_text())

    orig_enabled = ring._pallas_mm_enabled
    orig_acc = pmm.matmul_acc
    orig_mm3d = pmm.matmul_3d
    try:
        ring._pallas_mm_enabled = lambda M, K, N: True
        pmm.matmul_acc = functools.partial(orig_acc, interpret=True)
        # plain ring.matmul calls (triple-gen dealer product) also route to
        # pallas under the forced gate: interpret them too on CPU
        pmm.matmul_3d = functools.partial(orig_mm3d, interpret=True)
        fused_out = curl_tpu._eager_run(fn, xe, we)
    finally:
        ring._pallas_mm_enabled = orig_enabled
        pmm.matmul_acc = orig_acc
        pmm.matmul_3d = orig_mm3d

    fused_val = np.asarray(fused_out.get_plain_text())
    np.testing.assert_array_equal(plain_val, fused_val)
    # float-parity with encoding-quantization headroom (~K*(|x|+|w|)/2
    # ulps at 2^16 scale over the K=32 contraction); the strict check is
    # the bit-equality above
    np.testing.assert_allclose(
        fused_val, (x @ w) * (1 << 16), rtol=1e-4, atol=40.0
    )


def test_rotated_onehot_fast_parity():
    """The direct one-hot construction (fused_onehot fast path) decodes
    identically to the tuple-based gather form for the private embedding,
    with the same round/byte profile."""
    from curl_tpu import comm
    from curl_tpu.mpc.primitives import beaver

    rng = np.random.default_rng(3)
    tbl = rng.normal(size=(13, 4))
    ids = rng.integers(0, 13, size=(9,)).astype(np.float64)
    te = curl_tpu.cryptensor(tbl)
    ie = curl_tpu.cryptensor(ids, precision=0)

    def fn(im, tm):
        return im._wrap(im._tensor.evaluate_embed(tm._tensor))

    outs = {}
    stats = {}
    for fast in (True, False):
        with cfg.temp_override({"mpc.fused_onehot": fast}):
            comm.reset_communication_stats()
            out = curl_tpu._eager_run(fn, ie, te)
            outs[fast] = np.asarray(out.get_plain_text())
            st = comm.get_communication_stats()
            stats[fast] = (st["rounds"], st["bytes"])
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-4)
    np.testing.assert_allclose(outs[True], tbl[ids.astype(int)], atol=2e-4)
    assert stats[True][0] == stats[False][0], stats  # same rounds
