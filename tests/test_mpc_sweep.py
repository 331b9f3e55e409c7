"""Parametrized MPCTensor op-surface sweep over the provider/protocol matrix.

Mirrors the reference's test/test_mpc.py sweep (reference
test_mpc.py:2280-2328 reruns the whole TestMPC class as TestTFP / TestTTP /
Test3PC / TestRSS subclasses). Here the matrix is a module-scoped pytest
fixture param: every test in this file runs under

    (TFP, beaver, 2PC), (TFP, beaver, 3PC), (TTP, beaver, 2PC),
    (TTP, beaver, 3PC), (TFP, replicated, 3PC RSS)

Tolerances: exact ops (linear arithmetic, indexing, comparisons on
well-separated inputs) use the fixed-point quantum; LUT-backed
approximations use the measured cell-error envelopes from
tests/test_reference_parity.py (the reference shows the same error floor
on its own golden outputs).
"""

import math

import numpy as np
import pytest

import curl_tpu
from conftest import reinit

# one fixed-point quantum at the default 16-bit precision, with headroom
# for EGK probabilistic-truncation jitter after one rescale
Q = 2 ** -16
LIN_TOL = 0.003        # linear ops / products of O(1) values
CMP_MARGIN = 0.01      # min |a-b| for comparison inputs (ties break randomly)
LUT_TOL = 0.12         # LUT approximations (haar/bior cell error envelope)

CONFIGS = [
    ("TFP", "beaver", 2),
    ("TFP", "beaver", 3),
    # ws=4: where wrap-corrected truncation and the O(log P) SPK A2B tree
    # actually scale past the 2PC/3PC fast paths (reference pattern:
    # test_mpc.py Test3PC subclassing scales to arbitrary world sizes)
    ("TFP", "beaver", 4),
    ("TTP", "beaver", 2),
    ("TTP", "beaver", 3),
    ("TFP", "replicated", 3),
]

# Structure/indexing and LUT-approximation ops sit on top of the primitive
# layer (their protocol sensitivity is the share *layout*, not the tuple
# source), so they sweep the two layouts — additive 2PC and replicated RSS
# 3PC — instead of the full 5-config matrix. Core arithmetic, comparisons,
# conversions, and convolution run under all five.
CONFIGS_LITE = [CONFIGS[0], CONFIGS[4]]


def _setup(provider, protocol, world_size):
    curl_tpu.mpc.set_default_provider(provider)
    curl_tpu.cfg.set("mpc.provider", provider)
    curl_tpu.cfg.set("mpc.protocol", protocol)
    reinit(world_size=world_size, seed=777)


def _teardown():
    curl_tpu.mpc.set_default_provider("TFP")
    curl_tpu.cfg.set("mpc.provider", "TFP")
    curl_tpu.cfg.set("mpc.protocol", "beaver")
    reinit(world_size=2, seed=1234)


@pytest.fixture(scope="module", params=CONFIGS, ids=lambda c: f"{c[0]}-{c[1]}-{c[2]}pc")
def mpc_config(request):
    _setup(*request.param)
    yield request.param
    _teardown()


@pytest.fixture(
    scope="module", params=CONFIGS_LITE, ids=lambda c: f"{c[0]}-{c[1]}-{c[2]}pc"
)
def mpc_config_lite(request):
    _setup(*request.param)
    yield request.param
    _teardown()


@pytest.fixture
def rng():
    return np.random.default_rng(4096)


def enc(x, **kw):
    return curl_tpu.cryptensor(np.asarray(x, dtype=np.float64), **kw)


def _sep(rng, shape, scale=3.0):
    """Values on a grid with guaranteed pairwise separation > CMP_MARGIN so
    comparison outcomes are decodable deterministically."""
    vals = rng.permutation(np.arange(-50, 50))[: int(np.prod(shape))]
    return (vals.reshape(shape) * 0.11 * scale).astype(np.float64)


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------

def test_add_sub_neg(mpc_config, rng):
    x = rng.normal(size=(3, 4)) * 2
    y = rng.normal(size=(3, 4)) * 2
    np.testing.assert_allclose((enc(x) + enc(y)).get_plain_text(), x + y, atol=LIN_TOL)
    np.testing.assert_allclose((enc(x) - enc(y)).get_plain_text(), x - y, atol=LIN_TOL)
    np.testing.assert_allclose((enc(x) + y).get_plain_text(), x + y, atol=LIN_TOL)
    np.testing.assert_allclose((enc(x) - 1.5).get_plain_text(), x - 1.5, atol=LIN_TOL)
    np.testing.assert_allclose((-enc(x)).get_plain_text(), -x, atol=LIN_TOL)
    np.testing.assert_allclose((1.5 - enc(x)).get_plain_text(), 1.5 - x, atol=LIN_TOL)


def test_mul_private_public_scalar(mpc_config, rng):
    x = rng.normal(size=(3, 4)) * 2
    y = rng.normal(size=(3, 4)) * 2
    np.testing.assert_allclose((enc(x) * enc(y)).get_plain_text(), x * y, atol=0.02)
    np.testing.assert_allclose((enc(x) * y).get_plain_text(), x * y, atol=0.02)
    np.testing.assert_allclose((enc(x) * 2.5).get_plain_text(), x * 2.5, atol=0.01)
    np.testing.assert_allclose((enc(x) * (-3)).get_plain_text(), x * -3, atol=0.01)


def test_div(mpc_config, rng):
    x = rng.normal(size=(8,)) * 2
    d = np.abs(rng.normal(size=(8,))) + 1.0
    np.testing.assert_allclose((enc(x) / 4.0).get_plain_text(), x / 4.0, atol=0.01)
    # private/private division envelope: the reciprocal LUT cell error
    # near d ~ 1 reaches ~0.2 regardless of provider/protocol (measured
    # across TFP/TTP x beaver/replicated x 5 seeds — deterministic,
    # input-position-dependent)
    np.testing.assert_allclose(
        (enc(x) / enc(d)).get_plain_text(), x / d, atol=0.25
    )


def test_matmul_dot_ger(mpc_config, rng):
    a = rng.normal(size=(3, 4))
    b = rng.normal(size=(4, 2))
    np.testing.assert_allclose(
        enc(a).matmul(enc(b)).get_plain_text(), a @ b, atol=0.05
    )
    np.testing.assert_allclose(
        enc(a).matmul(b).get_plain_text(), a @ b, atol=0.05
    )
    v = rng.normal(size=(5,))
    w = rng.normal(size=(5,))
    np.testing.assert_allclose(
        enc(v).dot(enc(w)).get_plain_text(), v @ w, atol=0.05
    )
    np.testing.assert_allclose(
        enc(v).ger(enc(w)).get_plain_text(), np.outer(v, w), atol=0.05
    )


def test_square_and_pow(mpc_config_lite, rng):
    x = rng.normal(size=(6,)) * 1.5
    np.testing.assert_allclose(enc(x).square().get_plain_text(), x * x, atol=0.02)
    np.testing.assert_allclose(enc(x).pow(2).get_plain_text(), x ** 2, atol=0.05)
    np.testing.assert_allclose(enc(x).pow(3).get_plain_text(), x ** 3, atol=0.12)
    np.testing.assert_allclose(enc(x).pow(0).get_plain_text(), np.ones_like(x), atol=0.01)
    np.testing.assert_allclose(enc(x).pow(1).get_plain_text(), x, atol=0.01)


def test_polynomial(mpc_config_lite, rng):
    x = rng.normal(size=(5,))
    coeffs = [0.5, -1.0, 0.25]
    ref = 0.5 * x - 1.0 * x ** 2 + 0.25 * x ** 3
    np.testing.assert_allclose(
        enc(x).polynomial(coeffs).get_plain_text(), ref, atol=0.1
    )


def test_broadcasting_binary_ops(mpc_config, rng):
    a = rng.normal(size=(3, 1, 4))
    b = rng.normal(size=(1, 2, 4))
    for op in ("add", "sub", "mul"):
        got = getattr(enc(a), op)(enc(b)).get_plain_text()
        ref = getattr(np, {"add": "add", "sub": "subtract", "mul": "multiply"}[op])(a, b)
        np.testing.assert_allclose(got, ref, atol=0.02, err_msg=op)
    row = rng.normal(size=(4,))
    np.testing.assert_allclose(
        (enc(a) * enc(row)).get_plain_text(), a * row, atol=0.02
    )


def test_inplace_variants(mpc_config, rng):
    x = rng.normal(size=(4,))
    y = rng.normal(size=(4,))
    t = enc(x)
    t += enc(y)
    np.testing.assert_allclose(t.get_plain_text(), x + y, atol=LIN_TOL)
    t -= y
    np.testing.assert_allclose(t.get_plain_text(), x, atol=LIN_TOL)
    t *= 2.0
    np.testing.assert_allclose(t.get_plain_text(), 2 * x, atol=0.01)


# ---------------------------------------------------------------------------
# comparisons / sign-structured ops
# ---------------------------------------------------------------------------

def test_comparisons_private_private(mpc_config, rng):
    x = _sep(rng, (4, 5))
    y = np.where(rng.random((4, 5)) < 0.3, x, _sep(rng, (4, 5), scale=2.9))
    ex, ey = enc(x), enc(y)
    np.testing.assert_array_equal(ex.lt(ey).get_plain_text(), (x < y).astype(float))
    np.testing.assert_array_equal(ex.le(ey).get_plain_text(), (x <= y).astype(float))
    np.testing.assert_array_equal(ex.gt(ey).get_plain_text(), (x > y).astype(float))
    np.testing.assert_array_equal(ex.ge(ey).get_plain_text(), (x >= y).astype(float))
    np.testing.assert_array_equal(ex.eq(ey).get_plain_text(), (x == y).astype(float))
    np.testing.assert_array_equal(ex.ne(ey).get_plain_text(), (x != y).astype(float))


def test_comparisons_private_public(mpc_config, rng):
    x = _sep(rng, (8,))
    np.testing.assert_array_equal(
        enc(x).lt(0.0).get_plain_text(), (x < 0).astype(float)
    )
    np.testing.assert_array_equal(
        enc(x).ge(x).get_plain_text(), np.ones_like(x)
    )


def test_sign_abs_relu(mpc_config, rng):
    x = _sep(rng, (9,))
    np.testing.assert_array_equal(enc(x).sign().get_plain_text(), np.sign(x))
    np.testing.assert_allclose(enc(x).abs().get_plain_text(), np.abs(x), atol=0.01)
    np.testing.assert_allclose(
        enc(x).relu().get_plain_text(), np.maximum(x, 0), atol=0.01
    )
    np.testing.assert_array_equal(
        enc(x).drelu().get_plain_text(), (x > 0).astype(float)
    )


def test_hardtanh_clamp(mpc_config_lite, rng):
    x = np.linspace(-3, 3, 13)
    np.testing.assert_allclose(
        enc(x).hardtanh(-1, 1).get_plain_text(), np.clip(x, -1, 1), atol=0.01
    )
    np.testing.assert_allclose(
        enc(x).hardtanh(-2.5, 0.5).get_plain_text(), np.clip(x, -2.5, 0.5), atol=0.01
    )


def test_where_select(mpc_config, rng):
    x = rng.normal(size=(6,))
    y = rng.normal(size=(6,))
    cond = (rng.random(6) < 0.5).astype(np.float64)
    got = enc(x).where(enc(cond), enc(y)).get_plain_text()
    np.testing.assert_allclose(got, np.where(cond > 0.5, x, y), atol=0.02)
    # public condition
    got2 = enc(x).where(cond, enc(y)).get_plain_text()
    np.testing.assert_allclose(got2, np.where(cond > 0.5, x, y), atol=0.02)


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------

def test_sum_mean_prod(mpc_config, rng):
    x = rng.normal(size=(3, 4)) * 1.5
    np.testing.assert_allclose(enc(x).sum().get_plain_text(), x.sum(), atol=0.01)
    np.testing.assert_allclose(
        enc(x).sum(axis=0).get_plain_text(), x.sum(0), atol=0.01
    )
    np.testing.assert_allclose(
        enc(x).sum(axis=1, keepdim=True).get_plain_text(),
        x.sum(1, keepdims=True), atol=0.01,
    )
    np.testing.assert_allclose(enc(x).mean().get_plain_text(), x.mean(), atol=0.01)
    np.testing.assert_allclose(
        enc(x).mean(axis=1).get_plain_text(), x.mean(1), atol=0.01
    )
    p = rng.uniform(0.5, 1.5, size=(2, 3))
    np.testing.assert_allclose(
        enc(p).prod(axis=1).get_plain_text(), p.prod(1), atol=0.05
    )


def test_var_norm(mpc_config_lite, rng):
    x = rng.normal(size=(4, 5)) * 2
    np.testing.assert_allclose(enc(x).var().get_plain_text(), x.var(), atol=0.05)
    np.testing.assert_allclose(
        enc(x).var(axis=1).get_plain_text(), x.var(1), atol=0.05
    )
    v = rng.normal(size=(6,))
    np.testing.assert_allclose(
        enc(v).norm().get_plain_text(), np.linalg.norm(v), atol=0.1
    )


def test_cumsum_trace(mpc_config_lite, rng):
    x = rng.normal(size=(3, 4))
    np.testing.assert_allclose(
        enc(x).cumsum(1).get_plain_text(), np.cumsum(x, 1), atol=0.01
    )
    s = rng.normal(size=(4, 4))
    np.testing.assert_allclose(
        enc(s).trace().get_plain_text(), np.trace(s), atol=0.01
    )


def test_max_min_argmax_argmin(mpc_config, rng):
    x = _sep(rng, (3, 6))
    mx, amx = enc(x).max(dim=1)
    np.testing.assert_allclose(mx.get_plain_text(), x.max(1), atol=0.01)
    np.testing.assert_array_equal(
        amx.get_plain_text().argmax(1), x.argmax(1)
    )
    mn, amn = enc(x).min(dim=1)
    np.testing.assert_allclose(mn.get_plain_text(), x.min(1), atol=0.01)
    np.testing.assert_allclose(enc(x).max().get_plain_text(), x.max(), atol=0.01)
    np.testing.assert_allclose(enc(x).min().get_plain_text(), x.min(), atol=0.01)
    idx = enc(x).argmax(dim=1, one_hot=False).get_plain_text()
    np.testing.assert_array_equal(idx, x.argmax(1))


# ---------------------------------------------------------------------------
# approximations (LUT / iterative)
# ---------------------------------------------------------------------------

def test_exp_log(mpc_config_lite, rng):
    x = rng.uniform(-3, 2, size=(7,))
    np.testing.assert_allclose(
        enc(x).exp().get_plain_text(), np.exp(x), atol=LUT_TOL, rtol=0.05
    )
    p = rng.uniform(0.2, 8.0, size=(7,))
    np.testing.assert_allclose(
        enc(p).log().get_plain_text(), np.log(p), atol=0.25
    )


def test_reciprocal_sqrt_inv_sqrt(mpc_config_lite, rng):
    p = rng.uniform(0.3, 8.0, size=(7,))
    np.testing.assert_allclose(
        enc(p).reciprocal().get_plain_text(), 1 / p, atol=0.15, rtol=0.05
    )
    np.testing.assert_allclose(
        enc(p).sqrt().get_plain_text(), np.sqrt(p), atol=0.2, rtol=0.05
    )
    # inv_sqrt LUT cell error grows toward the domain's small end (~0.17 at
    # p≈0.7, same floor as the reference's golden outputs)
    np.testing.assert_allclose(
        enc(p).inv_sqrt().get_plain_text(), 1 / np.sqrt(p), atol=0.25, rtol=0.1
    )


def test_sigmoid_tanh(mpc_config_lite, rng):
    x = rng.uniform(-4, 4, size=(9,))
    np.testing.assert_allclose(
        enc(x).sigmoid().get_plain_text(), 1 / (1 + np.exp(-x)), atol=LUT_TOL
    )
    np.testing.assert_allclose(
        enc(x).tanh().get_plain_text(), np.tanh(x), atol=LUT_TOL
    )


def test_gelu_silu_erf(mpc_config_lite, rng):
    x = rng.uniform(-3, 3, size=(9,))
    ref_gelu = x * (1 + np.vectorize(math.erf)(x / math.sqrt(2))) / 2
    np.testing.assert_allclose(
        enc(x).gelu().get_plain_text(), ref_gelu, atol=LUT_TOL
    )
    np.testing.assert_allclose(
        enc(x).silu().get_plain_text(), x / (1 + np.exp(-x)), atol=LUT_TOL
    )
    np.testing.assert_allclose(
        enc(x).erf().get_plain_text(), np.vectorize(math.erf)(x), atol=LUT_TOL
    )


def test_cos_sin(mpc_config_lite, rng):
    x = rng.uniform(-math.pi, math.pi, size=(9,))
    np.testing.assert_allclose(enc(x).cos().get_plain_text(), np.cos(x), atol=LUT_TOL)
    np.testing.assert_allclose(enc(x).sin().get_plain_text(), np.sin(x), atol=LUT_TOL)


def test_softmax_log_softmax(mpc_config_lite, rng):
    # scale keeps max-shifted logits inside the nexp LUT domain; the main
    # softmax envelope is documented in tests/test_functions.py
    x = _sep(rng, (2, 5), scale=0.45)
    e = np.exp(x - x.max(-1, keepdims=True))
    ref = e / e.sum(-1, keepdims=True)
    # softmax compounds exp + reciprocal LUT cell errors; the measured
    # envelope across protocols is ~0.15 on a cell-edge element
    np.testing.assert_allclose(
        enc(x).softmax(-1).get_plain_text(), ref, atol=0.18
    )
    np.testing.assert_allclose(
        enc(x).log_softmax(-1).get_plain_text(), np.log(ref), atol=0.2
    )


# ---------------------------------------------------------------------------
# structure / indexing
# ---------------------------------------------------------------------------

def test_view_reshape_flatten(mpc_config_lite, rng):
    x = rng.normal(size=(2, 3, 4))
    np.testing.assert_allclose(
        enc(x).view(6, 4).get_plain_text(), x.reshape(6, 4), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).reshape(4, 6).get_plain_text(), x.reshape(4, 6), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).flatten().get_plain_text(), x.reshape(-1), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).flatten(start_dim=1).get_plain_text(), x.reshape(2, 12), atol=Q
    )


def test_transpose_permute_t(mpc_config_lite, rng):
    x = rng.normal(size=(2, 3, 4))
    np.testing.assert_allclose(
        enc(x).transpose(0, 2).get_plain_text(), np.swapaxes(x, 0, 2), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).permute(2, 0, 1).get_plain_text(), x.transpose(2, 0, 1), atol=Q
    )
    m = rng.normal(size=(3, 5))
    np.testing.assert_allclose(enc(m).t().get_plain_text(), m.T, atol=Q)


def test_squeeze_unsqueeze(mpc_config_lite, rng):
    x = rng.normal(size=(1, 3, 1, 4))
    np.testing.assert_allclose(
        enc(x).squeeze().get_plain_text(), x.squeeze(), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).squeeze(axis=0).get_plain_text(), x.squeeze(0), atol=Q
    )
    y = rng.normal(size=(3, 4))
    np.testing.assert_allclose(
        enc(y).unsqueeze(1).get_plain_text(), y[:, None, :], atol=Q
    )


def test_roll_flip_narrow(mpc_config_lite, rng):
    x = rng.normal(size=(3, 5))
    np.testing.assert_allclose(
        enc(x).roll(2, dims=1).get_plain_text(), np.roll(x, 2, 1), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).flip([1]).get_plain_text(), np.flip(x, 1), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).narrow(1, 1, 3).get_plain_text(), x[:, 1:4], atol=Q
    )


def test_index_select_gather_take(mpc_config_lite, rng):
    x = rng.normal(size=(4, 5))
    idx = np.array([3, 0, 2])
    np.testing.assert_allclose(
        enc(x).index_select(0, idx).get_plain_text(), x[idx], atol=Q
    )
    gidx = np.array([[0, 2, 1, 4, 3]])
    np.testing.assert_allclose(
        enc(x).gather(1, np.broadcast_to(gidx, (4, 5)).copy()).get_plain_text(),
        np.take_along_axis(x, np.broadcast_to(gidx, (4, 5)), 1),
        atol=Q,
    )
    np.testing.assert_allclose(
        enc(x).take(np.array([0, 7, 13])).get_plain_text(),
        x.reshape(-1)[[0, 7, 13]],
        atol=Q,
    )


def test_cat_stack_split_chunk_unbind(mpc_config_lite, rng):
    a = rng.normal(size=(2, 3))
    b = rng.normal(size=(2, 3))
    np.testing.assert_allclose(
        curl_tpu.cat([enc(a), enc(b)], dim=0).get_plain_text(),
        np.concatenate([a, b], 0), atol=Q,
    )
    np.testing.assert_allclose(
        curl_tpu.stack([enc(a), enc(b)], dim=1).get_plain_text(),
        np.stack([a, b], 1), atol=Q,
    )
    x = rng.normal(size=(6, 2))
    parts = enc(x).split(2, dim=0)
    assert len(parts) == 3
    np.testing.assert_allclose(parts[1].get_plain_text(), x[2:4], atol=Q)
    chunks = enc(x).chunk(3, dim=0)
    np.testing.assert_allclose(chunks[2].get_plain_text(), x[4:6], atol=Q)
    rows = enc(a).unbind(0)
    np.testing.assert_allclose(rows[1].get_plain_text(), a[1], atol=Q)


def test_expand_repeat_pad(mpc_config_lite, rng):
    x = rng.normal(size=(1, 4))
    np.testing.assert_allclose(
        enc(x).expand(3, 4).get_plain_text(), np.broadcast_to(x, (3, 4)), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).repeat(2, 3).get_plain_text(), np.tile(x, (2, 3)), atol=Q
    )
    np.testing.assert_allclose(
        enc(x).pad((1, 2), value=0.5).get_plain_text(),
        np.pad(x, ((0, 0), (1, 2)), constant_values=0.5),
        atol=Q,
    )


def test_getitem_setitem(mpc_config_lite, rng):
    x = rng.normal(size=(4, 5))
    e = enc(x)
    np.testing.assert_allclose(e[1].get_plain_text(), x[1], atol=Q)
    np.testing.assert_allclose(e[1:3].get_plain_text(), x[1:3], atol=Q)
    np.testing.assert_allclose(e[:, 2].get_plain_text(), x[:, 2], atol=Q)


def test_cumulative_unfold(mpc_config_lite, rng):
    x = rng.normal(size=(1, 6))
    got = enc(x).unfold(1, 3, 1).get_plain_text()
    ref = np.stack([x[0, i:i + 3] for i in range(4)], 0)[None]
    np.testing.assert_allclose(got, ref, atol=Q)


# ---------------------------------------------------------------------------
# convolution / pooling
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,padding", [(1, 0), (2, 1)])
def test_conv2d_grid(mpc_config, rng, stride, padding):
    import torch

    x = rng.normal(size=(1, 2, 6, 6))
    w = rng.normal(size=(3, 2, 3, 3)) * 0.5
    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), stride=stride, padding=padding
    ).numpy()
    got = enc(x).conv2d(enc(w), stride=stride, padding=padding).get_plain_text()
    np.testing.assert_allclose(got, ref, atol=0.05)


def test_conv1d_and_transpose(mpc_config, rng):
    import torch

    x = rng.normal(size=(1, 2, 8))
    w = rng.normal(size=(3, 2, 3)) * 0.5
    ref = torch.nn.functional.conv1d(torch.tensor(x), torch.tensor(w)).numpy()
    got = enc(x).conv1d(enc(w)).get_plain_text()
    np.testing.assert_allclose(got, ref, atol=0.05)

    wt = rng.normal(size=(2, 3, 3)) * 0.5
    reft = torch.nn.functional.conv_transpose2d(
        torch.tensor(rng.normal(size=(1, 2, 4, 4))), torch.tensor(
            rng.normal(size=(2, 3, 3, 3)) * 0.5), stride=2
    )
    # deterministic inputs for the 2d transpose check
    x2 = rng.normal(size=(1, 2, 4, 4))
    w2 = rng.normal(size=(2, 3, 3, 3)) * 0.5
    reft = torch.nn.functional.conv_transpose2d(
        torch.tensor(x2), torch.tensor(w2), stride=2
    ).numpy()
    gott = enc(x2).conv_transpose2d(enc(w2), stride=2).get_plain_text()
    np.testing.assert_allclose(gott, reft, atol=0.05)


def test_pooling(mpc_config, rng):
    import torch

    x = rng.normal(size=(1, 2, 6, 6)) * 2
    ref_avg = torch.nn.functional.avg_pool2d(torch.tensor(x), 2).numpy()
    np.testing.assert_allclose(
        enc(x).avg_pool2d(2).get_plain_text(), ref_avg, atol=0.01
    )
    xs = _sep(rng, (1, 1, 4, 4))
    ref_max = torch.nn.functional.max_pool2d(torch.tensor(xs), 2).numpy()
    np.testing.assert_allclose(
        enc(xs).max_pool2d(2).get_plain_text(), ref_max, atol=0.01
    )


# ---------------------------------------------------------------------------
# dropout / sampling
# ---------------------------------------------------------------------------

def test_dropout(mpc_config_lite, rng):
    x = np.ones((40,))
    out = enc(x).dropout(p=0.5).get_plain_text()
    kept = out > 0.5
    # scaled by 1/(1-p); all surviving entries must equal 2.0
    np.testing.assert_allclose(out[kept], 2.0, atol=0.02)
    assert 4 <= kept.sum() <= 36  # p=0.5 on 40 elements, loose envelope
    # eval mode: identity
    np.testing.assert_allclose(
        enc(x).dropout(p=0.5, training=False).get_plain_text(), x, atol=Q
    )


def test_bernoulli_and_randn(mpc_config_lite):
    p = np.full((60,), 0.3)
    s = enc(p).bernoulli().get_plain_text()
    assert set(np.round(s).tolist()) <= {0.0, 1.0}
    assert 3 <= s.sum() <= 40
    z = curl_tpu.randn(300).get_plain_text()
    assert abs(z.mean()) < 0.3
    assert abs(z.std() - 1.0) < 0.3


# ---------------------------------------------------------------------------
# binary shares / conversions
# ---------------------------------------------------------------------------

def test_binary_xor_and_or(mpc_config, rng):
    from curl_tpu.mpc.ptype import ptype

    a = rng.integers(0, 2 ** 30, size=(6,))
    b = rng.integers(0, 2 ** 30, size=(6,))
    ea = curl_tpu.cryptensor(a, precision=0, ptype_=ptype.binary)
    eb = curl_tpu.cryptensor(b, precision=0, ptype_=ptype.binary)
    np.testing.assert_array_equal(
        (ea ^ eb).get_plain_text(), (a ^ b).astype(np.float64)
    )
    np.testing.assert_array_equal(
        (ea & eb).get_plain_text(), (a & b).astype(np.float64)
    )
    np.testing.assert_array_equal(
        (ea | eb).get_plain_text(), (a | b).astype(np.float64)
    )


def test_a2b_b2a_roundtrip(mpc_config, rng):
    from curl_tpu.mpc.ptype import ptype

    x = rng.integers(-2 ** 20, 2 ** 20, size=(5,)).astype(np.float64)
    e = curl_tpu.cryptensor(x, precision=0)
    b = e.to(ptype.binary)
    back = b.to(ptype.arithmetic)
    np.testing.assert_array_equal(back.get_plain_text(), x)


# ---------------------------------------------------------------------------
# encoder / precision edges
# ---------------------------------------------------------------------------

def test_precision_roundtrip_extremes(mpc_config_lite):
    vals = np.array([0.0, -0.0, 1e-4, -1e-4, 1000.0, -1000.0, 0.5, -0.5])
    np.testing.assert_allclose(
        enc(vals).get_plain_text(), vals, atol=2 * Q
    )
    ints = np.array([-(2 ** 30), 2 ** 30, 7.0, -7.0])
    np.testing.assert_array_equal(
        curl_tpu.cryptensor(ints, precision=0).get_plain_text(), ints
    )


def test_scalar_and_zero_dim(mpc_config_lite):
    s = enc(3.25)
    np.testing.assert_allclose(s.get_plain_text(), 3.25, atol=Q)
    np.testing.assert_allclose((s * s).get_plain_text(), 3.25 ** 2, atol=0.01)


def test_source_party_encoding(mpc_config, rng):
    # encrypting from each party's plaintext must decode identically
    x = rng.normal(size=(4,))
    for src in range(mpc_config[2]):
        np.testing.assert_allclose(
            curl_tpu.cryptensor(x, src=src).get_plain_text(), x, atol=Q
        )


# ---------------------------------------------------------------------------
# max/argmax across every method (reference test_mpc.py runs a test per
# method: pairwise / log_reduction / double_log_reduction /
# accelerated_cascade; scan_reduction is the TPU-first addition)
# ---------------------------------------------------------------------------

MAX_METHODS = [
    "pairwise",
    "log_reduction",
    "double_log_reduction",
    "accelerated_cascade",
    "scan_reduction",
]


@pytest.mark.parametrize("method", MAX_METHODS)
def test_max_methods(mpc_config_lite, rng, method):
    x = _sep(rng, (3, 8))
    with curl_tpu.cfg.temp_override({"functions.max_method": method}):
        got, _ = enc(x).max(dim=1)
        np.testing.assert_allclose(
            got.get_plain_text(), x.max(1), atol=LIN_TOL
        )
        got_flat = enc(x).max()
        np.testing.assert_allclose(
            got_flat.get_plain_text(), x.max(), atol=LIN_TOL
        )


@pytest.mark.parametrize("method", MAX_METHODS)
def test_argmax_methods(mpc_config_lite, rng, method):
    x = _sep(rng, (2, 7))
    with curl_tpu.cfg.temp_override({"functions.max_method": method}):
        got = enc(x).argmax(dim=1, one_hot=False)
        np.testing.assert_allclose(
            got.get_plain_text(), x.argmax(1), atol=LIN_TOL
        )
        oh = enc(x).argmax(dim=1)
        np.testing.assert_allclose(
            oh.get_plain_text(),
            (x == x.max(1, keepdims=True)).astype(float),
            atol=LIN_TOL,
        )


@pytest.mark.parametrize("method", MAX_METHODS)
def test_min_methods(mpc_config_lite, rng, method):
    x = _sep(rng, (11,))
    with curl_tpu.cfg.temp_override({"functions.max_method": method}):
        got = enc(x).min()
        np.testing.assert_allclose(got.get_plain_text(), x.min(), atol=LIN_TOL)


# ---------------------------------------------------------------------------
# scatter / index_add (reference test_mpc.py test_index_add, test_scatter)
# ---------------------------------------------------------------------------

def test_index_add(mpc_config_lite, rng):
    x = rng.normal(size=(5, 3))
    upd = rng.normal(size=(2, 3))
    idx = np.array([1, 3])
    ref = x.copy()
    np.add.at(ref, idx, upd)
    got = enc(x).index_add(0, idx, enc(upd)).get_plain_text()
    np.testing.assert_allclose(got, ref, atol=LIN_TOL)
    # public update onto an encrypted base
    got2 = enc(x).index_add(0, idx, upd).get_plain_text()
    np.testing.assert_allclose(got2, ref, atol=LIN_TOL)


def test_scatter_and_scatter_add(mpc_config_lite, rng):
    x = rng.normal(size=(4, 4))
    src = rng.normal(size=(4, 4))
    idx = np.stack([rng.permutation(4) for _ in range(4)])
    ref_scatter = x.copy()
    ref_add = x.copy()
    for i in range(4):
        for j in range(4):
            ref_scatter[i, idx[i, j]] = src[i, j]
            ref_add[i, idx[i, j]] += src[i, j]
    got = enc(x).scatter(1, idx, enc(src)).get_plain_text()
    np.testing.assert_allclose(got, ref_scatter, atol=LIN_TOL)
    got_add = enc(x).scatter_add(1, idx, enc(src)).get_plain_text()
    np.testing.assert_allclose(got_add, ref_add, atol=LIN_TOL)


# ---------------------------------------------------------------------------
# adaptive pooling (reference test_mpc.py test_adaptive_pooling)
# ---------------------------------------------------------------------------

def test_adaptive_pooling(mpc_config_lite, rng):
    x = rng.normal(size=(1, 2, 8, 8))
    got = enc(x).adaptive_avg_pool2d((4, 4)).get_plain_text()
    ref = x.reshape(1, 2, 4, 2, 4, 2).mean(axis=(3, 5))
    np.testing.assert_allclose(got, ref, atol=LIN_TOL)

    xs = _sep(rng, (1, 1, 4, 4))
    got_max = enc(xs).adaptive_max_pool2d((2, 2)).get_plain_text()
    ref_max = xs.reshape(1, 1, 2, 2, 2, 2).max(axis=(3, 5))
    np.testing.assert_allclose(got_max, ref_max, atol=LIN_TOL)


# ---------------------------------------------------------------------------
# clone/copy semantics + encrypt with src != 0
# (reference test_mpc.py test_copy_clone, test_encrypt_decrypt src sweep)
# ---------------------------------------------------------------------------

def test_clone_independent(mpc_config_lite, rng):
    x = rng.normal(size=(3,))
    a = enc(x)
    b = a.clone()
    b += 1.0
    np.testing.assert_allclose(a.get_plain_text(), x, atol=LIN_TOL)
    np.testing.assert_allclose(b.get_plain_text(), x + 1.0, atol=LIN_TOL)


def test_encrypt_src_nonzero(mpc_config, rng):
    _, _, ws = mpc_config
    x = rng.normal(size=(4,))
    for src in range(ws):
        got = curl_tpu.cryptensor(x, src=src).get_plain_text()
        np.testing.assert_allclose(got, x, atol=LIN_TOL)


# ---------------------------------------------------------------------------
# ptype conversions through the public .to() surface
# (reference test_mpc.py test_to / test_ptype)
# ---------------------------------------------------------------------------

def test_ptype_roundtrip(mpc_config, rng):
    from curl_tpu.mpc import ptype as Ptype

    x = np.array([1.0, -2.0, 0.5, 3.25])
    a = enc(x)
    assert a.ptype == Ptype.arithmetic
    b = a.to(Ptype.binary)
    assert b.ptype == Ptype.binary
    back = b.to(Ptype.arithmetic)
    np.testing.assert_allclose(back.get_plain_text(), x, atol=LIN_TOL)
