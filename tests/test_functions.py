"""Nonlinearity + comparison correctness (parity scope: reference
test/test_mpc.py LUT sections + examples/benches error domains)."""

import math

import numpy as np
import pytest

import curl_tpu
from conftest import reinit


def enc(x, **kw):
    return curl_tpu.cryptensor(np.asarray(x, dtype=np.float64), **kw)


def check(out, expected, tol, msg=""):
    got = out.get_plain_text()
    np.testing.assert_allclose(got, expected, atol=tol, rtol=0, err_msg=msg)


def test_comparisons(rng):
    x = rng.normal(size=(20,)) * 4
    y = rng.normal(size=(20,)) * 4
    ex, ey = enc(x), enc(y)
    check(ex.lt(ey), (x < y).astype(float), 1e-6)
    check(ex.le(ey), (x <= y).astype(float), 1e-6)
    check(ex.gt(ey), (x > y).astype(float), 1e-6)
    check(ex.ge(ey), (x >= y).astype(float), 1e-6)
    check(ex.lt(1.0), (x < 1).astype(float), 1e-6)
    check(ex.sign(), np.where(x >= 0, 1.0, -1.0), 1e-6)
    check(ex.abs(), np.abs(x), 1e-3)
    check(ex.relu(), np.maximum(x, 0), 1e-3)


def test_eq_ne_2pc(rng):
    x = np.array([1.0, 2.0, 3.0, -1.5])
    y = np.array([1.0, 2.5, 3.0, 1.5])
    check(enc(x).eq(enc(y)), (x == y).astype(float), 1e-6)
    check(enc(x).ne(enc(y)), (x != y).astype(float), 1e-6)


def test_eq_ne_3pc(rng):
    reinit(world_size=3)
    x = np.array([1.0, 2.0, 3.0])
    y = np.array([1.0, 2.5, 3.0])
    check(enc(x).eq(enc(y)), (x == y).astype(float), 1e-6)
    check(enc(x).ne(enc(y)), (x != y).astype(float), 1e-6)
    reinit(world_size=2)


def test_hardtanh(rng):
    x = rng.normal(size=(15,)) * 3
    check(enc(x).hardtanh(), np.clip(x, -1, 1), 1e-2)


# -- LUT nonlinearities over the benches.py domains -------------------------

def test_sigmoid_domain():
    x = np.linspace(-12, 12, 49)
    check(enc(x).sigmoid(), 1 / (1 + np.exp(-x)), 0.05)


def test_tanh_domain():
    x = np.linspace(-6, 6, 49)
    check(enc(x).tanh(), np.tanh(x), 0.08)


def test_erf_domain():
    x = np.linspace(-2.5, 2.5, 41)
    check(enc(x).erf(), np.vectorize(math.erf)(x), 0.01)


def test_gelu_domain():
    x = np.linspace(-3, 3, 41)
    ref = x * (1 + np.vectorize(math.erf)(x / math.sqrt(2))) / 2
    # tolerance set by the 16-cell bior table of the default config
    # (gelu_bior_size_bits=4 over [0,4]) + EGK probabilistic rounding
    check(enc(x).gelu(), ref, 0.05)


def test_silu_domain():
    x = np.linspace(-8, 8, 41)
    ref = x / (1 + np.exp(-x))
    check(enc(x).silu(), ref, 0.03)


def test_reciprocal_domain():
    # left edge excluded: haar cell-mean error peaks at x=1 (cell width .25)
    x = np.linspace(2.0, 32, 41)
    check(enc(x).reciprocal(), 1 / x, 0.05)


def test_log_domain():
    x = np.linspace(2.0, 60, 31)
    check(enc(x).log(), np.log(x), 0.05)


def test_sqrt_domain():
    x = np.linspace(4.0, 200, 31)
    check(enc(x).sqrt(), np.sqrt(x), 0.25)


def test_inv_sqrt_domain():
    # default config tailored_haar table 1 has 1.0-wide cells over [1, 256];
    # the cell-mean error at x=2 is ~0.07 (the reference shares this
    # envelope — see test_reference_parity)
    x = np.linspace(2.0, 200, 31)
    check(enc(x).inv_sqrt(), 1 / np.sqrt(x), 0.08)


def test_cossin_domain():
    x = np.linspace(-6, 6, 25)
    c, s = enc(x).cossin()
    np.testing.assert_allclose(c.get_plain_text(), np.cos(x), atol=0.08)
    np.testing.assert_allclose(s.get_plain_text(), np.sin(x), atol=0.08)


def test_exp_limit_method():
    # limit method (1 + x/2^8)^(2^8): relative error ~x^2/2^9
    x = np.linspace(-3, 3, 21)
    got = enc(x).exp().get_plain_text()
    np.testing.assert_allclose(got, np.exp(x), rtol=0.03, atol=0.01)


def test_softmax():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 8)) * 2
    out = enc(x).softmax(-1).get_plain_text()
    e = np.exp(x - x.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    # envelope of the default config's nexp table (32 cells over [0,64] =
    # 2.0-wide cells) — the reference distorts identically; cross-framework
    # agreement is asserted tightly in test_reference_parity
    np.testing.assert_allclose(out, ref, atol=0.2)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=0.2)


def test_softmax_refined_beats_raw_lut():
    """The default Newton-refined denominator (softmax_recip_refine) beats
    the reference's raw haar-LUT reciprocal: on data whose denominators land
    mid-cell (measured 0.12 max error on the ACTUAL reference via shims),
    the refined softmax stays within the exp-table envelope, and refinement
    strictly reduces the error."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(12, 6))
    x = rng.normal(size=(8, 12))
    logits = x @ w
    e = np.exp(logits - logits.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)

    out = enc(logits).softmax(-1).get_plain_text()
    assert np.abs(out - ref).max() < 2.5e-2
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=2.5e-2)

    with curl_tpu.cfg.temp_override({"functions.softmax_recip_refine": 0}):
        raw = enc(logits).softmax(-1).get_plain_text()
    assert np.abs(out - ref).max() < np.abs(raw - ref).max()


def test_log_softmax():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 6)) * 2
    out = enc(x).log_softmax(-1).get_plain_text()
    e = np.exp(x - x.max(-1, keepdims=True))
    ref = np.log(e / e.sum(-1, keepdims=True))
    np.testing.assert_allclose(out, ref, atol=0.15)


# -- max/argmax reductions ---------------------------------------------------

@pytest.mark.parametrize("method", ["pairwise", "log_reduction", "double_log_reduction", "accelerated_cascade", "scan_reduction"])
def test_max_argmax(method):
    rng = np.random.default_rng(9)
    x = rng.normal(size=(4, 7)) * 5
    with curl_tpu.cfg.temp_override({"functions.max_method": method}):
        mx, amx = enc(x).max(dim=1)
        np.testing.assert_allclose(mx.get_plain_text(), x.max(1), atol=0.01)
        oh = amx.get_plain_text()
        np.testing.assert_allclose(oh.argmax(1), x.argmax(1))


def test_scan_reduction_halving_head():
    """Exercise the unrolled halving head + scan tail split explicitly
    (scan_fixed_width smaller than the padded width), including the
    non-power-of-two padding lane and the width==1 all-head path."""
    rng = np.random.default_rng(12)
    x = rng.normal(size=(2, 21)) * 5  # pads to 32
    for handoff in (1, 4, 64):
        with curl_tpu.cfg.temp_override(
            {"functions.max_method": "scan_reduction",
             "functions.scan_fixed_width": handoff}
        ):
            mx, amx = enc(x).max(dim=1)
            np.testing.assert_allclose(mx.get_plain_text(), x.max(1), atol=0.01)
            np.testing.assert_allclose(
                amx.get_plain_text().argmax(1), x.argmax(1))


def test_max_flat():
    rng = np.random.default_rng(10)
    x = rng.normal(size=(12,)) * 5
    np.testing.assert_allclose(enc(x).max().get_plain_text(), x.max(), atol=0.01)
    np.testing.assert_allclose(enc(x).min().get_plain_text(), x.min(), atol=0.01)


def test_argmax_onehot_to_index():
    rng = np.random.default_rng(11)
    x = rng.normal(size=(3, 5)) * 5
    idx = enc(x).argmax(dim=1, one_hot=False).get_plain_text()
    np.testing.assert_allclose(idx, x.argmax(1), atol=0.01)


def test_pow_polynomial():
    x = np.array([0.5, 1.5, -2.0])
    check(enc(x).pow(3), x ** 3, 0.1)
    check(enc(x).pow(2), x ** 2, 0.05)
    coeffs = [1.0, 0.5, 0.25]
    ref = x + 0.5 * x ** 2 + 0.25 * x ** 3
    check(enc(x).polynomial(coeffs), ref, 0.1)


def test_max_pool2d():
    rng = np.random.default_rng(12)
    x = rng.normal(size=(1, 2, 4, 4)) * 3
    out = enc(x).max_pool2d(2).get_plain_text()
    ref = x.reshape(1, 2, 2, 2, 2, 2).max(axis=(3, 5))
    ref = x.reshape(1, 2, 2, 2, 2, 2).transpose(0, 1, 2, 4, 3, 5).max(axis=(4, 5))
    np.testing.assert_allclose(out, ref, atol=0.01)


def test_dropout():
    x = np.ones((200,))
    out = enc(x).dropout(p=0.3).get_plain_text()
    kept = out > 0.5
    assert abs(kept.mean() - 0.7) < 0.15
    np.testing.assert_allclose(out[kept], 1 / 0.7, atol=0.01)


def test_rand_uniform():
    u = curl_tpu.rand(500).get_plain_text()
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.06


def test_bernoulli():
    p = np.full(400, 0.3)
    b = curl_tpu.bernoulli(p).get_plain_text()
    assert set(np.unique(b)) <= {0.0, 1.0}
    assert abs(b.mean() - 0.3) < 0.08


def test_randn():
    # Box-Muller uses log(100*u), which exceeds the LUT log domain [0, 64]
    # for u > 0.64 (the reference's LUT configs share this bias); use the
    # iterative profile for distributional correctness.
    reinit(world_size=2, seed=77, config="approximations.yaml")
    z = curl_tpu.randn(400).get_plain_text()
    assert abs(z.mean()) < 0.25
    assert abs(z.std() - 1.0) < 0.25
    reinit(world_size=2, config="default.yaml")


def test_lut_fastpath_matches_onehot(rng):
    """Gather-form LUT tuples (mpc.lut_fastpath) decode identically to the
    reference one-hot-dot form: the protocol output is deterministic in the
    plaintext, so both paths must agree bit-exactly after decode."""
    from curl_tpu.mpc.primitives import beaver
    from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor

    x = rng.normal(size=(33,)) * 2

    # sigmoid's cell index goes through EGK probabilistic truncation, so
    # outputs are seed-dependent by up to ~one interpolation cell (the
    # one-hot path shows the same spread across seeds); check both paths
    # against the plaintext envelope rather than each other.
    truth = 1.0 / (1.0 + np.exp(-x))
    for fast in (True, False):
        with curl_tpu.cfg.temp_override({"mpc.lut_fastpath": fast}):
            got = enc(x).sigmoid().get_plain_text()
        np.testing.assert_allclose(got, truth, atol=0.12, rtol=0)

    # raw single-table eval: same index math on an injective table
    lut = np.arange(64, dtype=np.int64) * 3 + 1

    def run_lut(fast):
        with curl_tpu.cfg.temp_override({"mpc.lut_fastpath": fast}):
            ids = curl_tpu.cryptensor(
                np.arange(64, dtype=np.float64), precision=0
            )
            out = curl_tpu._eager_run(
                lambda a: curl_tpu.mpc.mpc.MPCTensor(
                    beaver.evaluate_lut(a._tensor, lut)
                ),
                ids,
            )
            return out.get_plain_text()

    np.testing.assert_array_equal(run_lut(True), run_lut(False))
    np.testing.assert_array_equal(run_lut(True), lut.astype(np.float64))
