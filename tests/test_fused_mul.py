"""Fused elementwise Beaver mul/square kernel math (ops/pallas_mul.py).

The protocol math takes an injectable randomness source, so the exact code
Mosaic traces is validated on CPU against uint64 ground truth (Beaver
reconstruction is exact pre-rescale; EGK truncation is probabilistic with
|error| <= 1 output LSB). On-device validation: scripts/validate_fused_mul.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from curl_tpu.ops import pallas_mul as pm
from curl_tpu.ops import u64pair as up


@pytest.fixture()
def rng():
    return np.random.default_rng(20260819)


def _r64(rng, n):
    return rng.integers(0, 1 << 64, size=n, dtype=np.uint64)


def _mk_r64(rng, n):
    def r64():
        return up.from_u64(jnp.asarray(_r64(rng, n)))

    return r64


def _mk_rk(rng, n):
    def rk(bits):
        vals = rng.integers(0, 1 << min(bits, 63), size=n, dtype=np.uint64)
        if bits == 64:
            vals = _r64(rng, n)
        return up.from_u64(jnp.asarray(vals))

    return rk


def _share(rng, vals):
    s = _r64(rng, vals.shape[0])
    return up.from_u64(jnp.asarray(s)), up.from_u64(jnp.asarray(vals - s))


def test_sar_and_trunc_div(rng):
    n = 2048
    a = _r64(rng, n)
    a[:4] = [0, (1 << 64) - 1, 1 << 63, (1 << 32) - 1]
    ap = up.from_u64(jnp.asarray(a))
    signed = a.view(np.int64)
    for k in (1, 16, 31, 32, 33, 47, 63):
        got = np.asarray(up.to_u64(*pm.sar(ap, k)))
        ref = (signed >> np.int64(k)).view(np.uint64)
        np.testing.assert_array_equal(got, ref)
    for m in (1, 16, 32, 40):
        got = np.asarray(up.to_u64(*pm.trunc_div_pow2(ap, m))).view(np.int64)
        ref = np.asarray(
            [int(v) // (1 << m) + (1 if (v % (1 << m) and v < 0) else 0)
             for v in signed], dtype=np.int64
        )
        np.testing.assert_array_equal(got, ref)


def test_beaver_mul_math_exact(rng):
    n = 4096
    x = _r64(rng, n)
    y = _r64(rng, n)
    x0, x1 = _share(rng, x)
    y0, y1 = _share(rng, y)
    z0, z1 = pm.beaver_mul_math(x0, x1, y0, y1, _mk_r64(rng, n))
    dec = np.asarray(up.to_u64(*up.add(z0, z1)))
    np.testing.assert_array_equal(dec, x * y)


def test_beaver_square_math_exact(rng):
    n = 4096
    x = _r64(rng, n)
    x0, x1 = _share(rng, x)
    z0, z1 = pm.beaver_square_math(x0, x1, _mk_r64(rng, n))
    dec = np.asarray(up.to_u64(*up.add(z0, z1)))
    np.testing.assert_array_equal(dec, x * x)


@pytest.mark.parametrize("m", [8, 16, 24])
def test_egk_trunc_math_probabilistic(rng, m):
    """EGK truncation: result = floor(v / 2^m) with probabilistic +/-1
    (EGK+20 Fig.10; mirrors beaver.egk_trunc_pr)."""
    n = 4096
    # values in the valid EGK domain |v| < 2^(l-1) = 2^61
    v = rng.integers(-(1 << 40), 1 << 40, size=n).astype(np.int64)
    vals = v.view(np.uint64)
    z0, z1 = _share(rng, vals)
    y0, y1 = pm.egk_trunc_math(z0, z1, m, _mk_r64(rng, n), _mk_rk(rng, n))
    dec = np.asarray(up.to_u64(*up.add(y0, y1))).view(np.int64)
    ref = v >> np.int64(m)  # floor division
    err = dec - ref
    assert np.abs(err).max() <= 1, f"EGK error exceeds 1 LSB: {err}"
    # rounding must actually be probabilistic, not systematically off
    assert np.abs(err.mean()) < 0.6


def test_fused_op_math_mul_with_egk(rng):
    """End-to-end fused op: product then EGK rescale decodes to the
    fixed-point product within 1 output LSB."""
    n = 2048
    prec = 16
    scale = 1 << prec
    xf = rng.uniform(-4, 4, size=n)
    yf = rng.uniform(-4, 4, size=n)
    xv = np.round(xf * scale).astype(np.int64)
    yv = np.round(yf * scale).astype(np.int64)
    x0, x1 = _share(rng, xv.view(np.uint64))
    y0, y1 = _share(rng, yv.view(np.uint64))
    z0, z1 = pm.fused_op_math(
        "mul", "egk", prec, x0, x1, y0, y1, _mk_r64(rng, n), _mk_rk(rng, n)
    )
    dec = np.asarray(up.to_u64(*up.add(z0, z1))).view(np.int64)
    ref = (xv * yv) >> np.int64(prec)
    assert np.abs(dec - ref).max() <= 1


def test_fused_op_math_square_crypten(rng):
    n = 2048
    prec = 16
    xv = rng.integers(-(1 << 24), 1 << 24, size=n).astype(np.int64)
    x0, x1 = _share(rng, xv.view(np.uint64))
    z0, z1 = pm.fused_op_math(
        "square", "crypten", prec, x0, x1, None, None,
        _mk_r64(rng, n), _mk_rk(rng, n),
    )
    dec = np.asarray(up.to_u64(*up.add(z0, z1))).view(np.int64)
    # per-share local truncation: each party contributes +/-1 LSB
    ref = (xv * xv) >> np.int64(prec)
    assert np.abs(dec - ref).max() <= 2


def test_randomness_freshness(rng):
    """Different randomness -> different shares, same decode (the PRZS /
    masking structure, like the fused-max tests)."""
    n = 512
    x = _r64(rng, n)
    y = _r64(rng, n)
    x0, x1 = _share(rng, x)
    y0, y1 = _share(rng, y)
    za = pm.beaver_mul_math(x0, x1, y0, y1, _mk_r64(np.random.default_rng(1), n))
    zb = pm.beaver_mul_math(x0, x1, y0, y1, _mk_r64(np.random.default_rng(2), n))
    assert not np.array_equal(
        np.asarray(up.to_u64(*za[0])), np.asarray(up.to_u64(*zb[0]))
    )
    np.testing.assert_array_equal(
        np.asarray(up.to_u64(*up.add(*za))), np.asarray(up.to_u64(*up.add(*zb)))
    )

def test_fused_op_math_standalone_trunc(rng):
    """op='trunc': passthrough + EGK truncation of existing shares (the
    per-LUT-call index truncation, arithmetic.egk_trunc_pr l=62)."""
    n = 2048
    m = 14
    v = rng.integers(-(1 << 44), 1 << 44, size=n).astype(np.int64)
    x0, x1 = _share(rng, v.view(np.uint64))
    z0, z1 = pm.fused_op_math(
        "trunc", "egk", m, x0, x1, None, None, _mk_r64(rng, n), _mk_rk(rng, n)
    )
    dec = np.asarray(up.to_u64(*up.add(z0, z1))).view(np.int64)
    ref = v >> np.int64(m)
    assert np.abs(dec - ref).max() <= 1


def test_fused_trunc_dispatch_end_to_end(rng):
    """arithmetic.egk_trunc_pr routes through the fused kernel when
    mpc.fused_trunc is enabled; interpreter-mode Pallas on CPU decodes to
    the same values as the composable protocol path."""
    import curl_tpu
    from curl_tpu import cfg

    vals = rng.uniform(-30, 30, size=(64, 32))
    curl_tpu.init(world_size=2, seed=3)
    xe = curl_tpu.cryptensor(vals)

    def tr(t):
        return t.egk_trunc_pr(62, 8)

    base = np.asarray(curl_tpu._eager_run(tr, xe).get_plain_text())
    # fused path needs a TPU backend for the real kernel; on CPU we verify
    # the dispatch predicate stays False (scope rule) rather than crashing
    with cfg.temp_override({"mpc.fused_trunc": "pallas_tpu"}):
        fused = np.asarray(curl_tpu._eager_run(tr, xe).get_plain_text())
    np.testing.assert_allclose(base, fused, atol=2 / 256)
    ref = np.asarray(xe.get_plain_text()) / 256.0
    assert np.abs(base - ref).max() < 2 / 256 + 1e-3

def test_fused_gate_ignores_serving_cache(monkeypatch):
    """fused_available must give the SAME answer during the tuple-cache
    recording trace and the serving trace: the kernel makes no provider
    requests, so flipping with _serving_cache desynchronizes the positional
    tuple stream (the r3c cached-bench unpack crash)."""
    import jax
    import curl_tpu
    from curl_tpu import cfg
    from curl_tpu.mpc import get_default_provider
    from curl_tpu.mpc.provider.provider import TupleCache
    from curl_tpu.ops import pallas_mul

    curl_tpu.init(world_size=2, seed=0)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # comm state: pretend the vmap runtime party context
    from curl_tpu import comm
    monkeypatch.setattr(comm, "get_world_size", lambda: 2)
    monkeypatch.setattr(comm, "get_runtime", lambda: "vmap")

    class FakeTensor:
        shape = (64, 64)

    provider = get_default_provider()
    with cfg.temp_override({"mpc.fused_mul": "pallas_tpu",
                            "mpc.fused_trunc": "pallas_tpu"}):
        without_cache = pallas_mul.fused_available(FakeTensor())
        provider.attach_serving_cache(TupleCache([]))
        try:
            with_cache = pallas_mul.fused_available(FakeTensor())
        finally:
            provider.attach_serving_cache(None)
    assert without_cache and with_cache
