"""Registry-driven gradient sweep: every function in FUNCTION_REGISTRY must
have a gradcheck-style case here, or the sweep fails (VERDICT round-1 item 5;
reference coverage model: test/test_gradients.py's get_random_test_tensor
sweep over registered ops).

Each case runs the encrypted forward + backward and compares input gradients
against torch.autograd on the plaintext, with tolerances scaled to the
fixed-point/LUT noise floor of the ops involved.
"""

import numpy as np
import pytest

import curl_tpu
from curl_tpu.autograd import FUNCTION_REGISTRY, apply_function


def enc(x, requires_grad=False):
    t = curl_tpu.cryptensor(np.asarray(x, dtype=np.float64))
    t.requires_grad = requires_grad
    return t


def torch_grads(fn, *arrays):
    import torch

    ts = [torch.tensor(a, requires_grad=True, dtype=torch.float64) for a in arrays]
    out = fn(*ts)
    out.sum().backward()
    return [t.grad.numpy() for t in ts]


def _run(enc_fn, plain_fn, arrays, tol=0.02, grad_tol=None):
    """Encrypted forward/backward vs torch double-precision autograd."""
    grad_tol = tol if grad_tol is None else grad_tol
    encs = [enc(a, True) for a in arrays]
    out = enc_fn(*encs)
    import torch

    ts = [torch.tensor(a, requires_grad=True, dtype=torch.float64) for a in arrays]
    expected = plain_fn(*ts)
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=tol, rtol=0
    )
    out.sum().backward()
    expected.sum().backward()
    for e, t in zip(encs, ts):
        assert e.grad is not None, "missing gradient"
        np.testing.assert_allclose(
            e.grad.get_plain_text(), t.grad.numpy(), atol=grad_tol, rtol=0
        )


_R = np.random.default_rng(7)

# ---------------------------------------------------------------------------
# one case per registered function name
# ---------------------------------------------------------------------------

def case_add():
    _run(lambda a, b: a.add(b), lambda a, b: a + b,
         [_R.normal(size=(3, 4)), _R.normal(size=(3, 4))])


def case_sub():
    _run(lambda a, b: a.sub(b), lambda a, b: a - b,
         [_R.normal(size=(3, 4)), _R.normal(size=(4,))])


def case_neg():
    _run(lambda a: a.neg(), lambda a: -a, [_R.normal(size=(5,))])


def case_mul():
    _run(lambda a, b: a.mul(b), lambda a, b: a * b,
         [_R.normal(size=(3, 4)), _R.normal(size=(3, 4))])


def case_div():
    _run(lambda a: a.div(4.0), lambda a: a / 4.0, [_R.normal(size=(6,))])


def case_square():
    _run(lambda a: a.square(), lambda a: a * a, [_R.normal(size=(5,))])


def case_matmul():
    _run(lambda a, b: a.matmul(b), lambda a, b: a @ b,
         [_R.normal(size=(4, 3)), _R.normal(size=(3, 2))], tol=0.05)


def case_dot():
    _run(lambda a, b: a.dot(b), lambda a, b: (a * b).sum(),
         [_R.normal(size=(6,)), _R.normal(size=(6,))], tol=0.05)


def case_ger():
    _run(lambda a, b: a.ger(b), lambda a, b: torch_outer(a, b),
         [_R.normal(size=(4,)), _R.normal(size=(3,))], tol=0.05)


def torch_outer(a, b):
    import torch

    return torch.outer(a, b)


def case_pow():
    _run(lambda a: a.pow(3), lambda a: a ** 3,
         [_R.normal(size=(5,)) * 0.8], tol=0.1)


def case_pos_pow():
    # fractional exponents go through exp(p*log(x)); the LUT log is only
    # accurate for x >= 1 (reference golden domain also starts at 1.0 —
    # tests/golden/reference_outputs.npz)
    a = np.abs(_R.normal(size=(5,))) + 1.0
    _run(lambda x: x.pos_pow(2), lambda x: x ** 2, [a], tol=0.1)
    # tight grad_tol: d/dx x^1.5 = 1.5*sqrt(x) in [1.5, 2.2] on this domain;
    # the pre-fix formula x^(p(p-1)) was off by up to ~0.45 here
    _run(lambda x: x.pos_pow(1.5), lambda x: x ** 1.5, [a], tol=0.3, grad_tol=0.25)
    _run(lambda x: x.pos_pow(2.5), lambda x: x ** 2.5, [np.array([1.3, 1.6])],
         tol=0.4, grad_tol=0.5)


def case_polynomial():
    _run(lambda x: x.polynomial([1.0, 0.5, 0.25]),
         lambda x: x + 0.5 * x ** 2 + 0.25 * x ** 3,
         [_R.normal(size=(5,)) * 0.5], tol=0.1)


def case_exp():
    _run(lambda a: a.exp(), lambda a: a.exp(),
         [_R.normal(size=(5,))], tol=0.3, grad_tol=0.3)


def case_log():
    # LUT log domain starts at 1 (reference golden domain is [1, 60])
    a = np.abs(_R.normal(size=(5,))) * 2 + 1.0
    _run(lambda x: x.log(), lambda x: x.log(), [a], tol=0.1, grad_tol=0.3)


def case_reciprocal():
    # haar LUT cell width 0.25: reciprocal's slope at x=1 makes the
    # intrinsic step error ~0.11 (the reference's own golden value for
    # reciprocal(1.0) is 0.893)
    a = np.abs(_R.normal(size=(5,))) + 1.0
    _run(lambda x: x.reciprocal(), lambda x: 1.0 / x, [a], tol=0.2, grad_tol=0.3)


def case_sqrt():
    # coarse sqrt cells: parity tolerance 0.3 (test_reference_parity TOLS);
    # domain >= 1 — the first LUT cells below 1 are edge artifacts in both
    # frameworks (bior roll, same as log)
    a = np.abs(_R.normal(size=(5,))) * 3 + 1.0
    _run(lambda x: x.sqrt(), lambda x: x.sqrt(), [a], tol=0.3, grad_tol=0.3)


def case_sigmoid():
    # haar cell noise floor ~0.08 (matches TOLS in test_reference_parity)
    _run(lambda a: a.sigmoid(), lambda a: a.sigmoid(),
         [_R.normal(size=(6,)) * 2], tol=0.08, grad_tol=0.1)


def case_tanh():
    # haar-LUT noise floor near 0 is ~0.09 in the reference itself
    # (golden tanh(0.33) = 0.302) plus EGK cell-boundary jitter;
    # parity tolerance 0.15 (test_reference_parity TOLS)
    _run(lambda a: a.tanh(), lambda a: a.tanh(),
         [_R.normal(size=(6,)) * 2], tol=0.15, grad_tol=0.2)


def case_erf():
    _run(lambda a: a.erf(), lambda a: a.erf(),
         [_R.normal(size=(6,))], tol=0.05, grad_tol=0.2)


def case_gelu():
    import torch.nn.functional as F

    _run(lambda a: a.gelu(), lambda a: F_gelu(a),
         [_R.normal(size=(6,)) * 2], tol=0.05, grad_tol=0.2)


def F_gelu(a):
    import torch.nn.functional as F

    return F.gelu(a)


def case_silu():
    _run(lambda a: a.silu(), lambda a: F_silu(a),
         [_R.normal(size=(6,)) * 2], tol=0.05, grad_tol=0.2)


def F_silu(a):
    import torch.nn.functional as F

    return F.silu(a)


def case_relu():
    _run(lambda a: a.relu(), lambda a: a.relu(), [_R.normal(size=(8,))])


def case_relu6():
    _run(lambda a: apply_function("relu6", a), lambda a: F_relu6(a),
         [np.array([-2.0, 0.5, 3.0, 5.5, 7.0, 9.0])], tol=0.05)


def F_relu6(a):
    import torch.nn.functional as F

    return F.relu6(a)


def case_hardtanh():
    _run(lambda a: a.hardtanh(-1.0, 1.0), lambda a: F_hardtanh(a),
         [_R.normal(size=(8,)) * 2], tol=0.05)


def F_hardtanh(a):
    import torch.nn.functional as F

    return F.hardtanh(a, -1.0, 1.0)


def case_abs():
    _run(lambda a: a.abs(), lambda a: a.abs(), [_R.normal(size=(8,))])


def case_sign():
    a = _R.normal(size=(6,))
    ea = enc(a, True)
    out = ea.sign()
    np.testing.assert_allclose(out.get_plain_text(), np.sign(a), atol=0.02)
    out.sum().backward()
    np.testing.assert_allclose(ea.grad.get_plain_text(), np.zeros_like(a), atol=0.02)


def case_sin():
    _run(lambda a: a.sin(), lambda a: a.sin(),
         [_R.uniform(-3, 3, size=(6,))], tol=0.05, grad_tol=0.1)


def case_cos():
    _run(lambda a: a.cos(), lambda a: a.cos(),
         [_R.uniform(-3, 3, size=(6,))], tol=0.05, grad_tol=0.1)


def case_cosine_similarity():
    _run(lambda a, b: apply_function("cosine_similarity", a, b, 1),
         lambda a, b: F_cossim(a, b),
         [_R.normal(size=(2, 4)) * 2, _R.normal(size=(2, 4)) * 2],
         tol=0.15, grad_tol=0.3)


def F_cossim(a, b):
    import torch.nn.functional as F

    return F.cosine_similarity(a, b, dim=1)


def case_norm():
    a = _R.normal(size=(5,)) * 2
    _run(lambda x: x.norm(), lambda x: x.norm(), [a], tol=0.15, grad_tol=0.3)
    # reduced-dim norm on a NON-square shape: backward must unsqueeze the
    # saved norm alongside grad (misaligned broadcast pre-fix)
    b = _R.normal(size=(3, 4)) + np.sign(_R.normal(size=(3, 4))) * 0.8
    _run(lambda x: x.norm(p=2, dim=1), lambda x: x.norm(p=2, dim=1), [b],
         tol=0.2, grad_tol=0.3)


def case_dropout():
    a = np.abs(_R.normal(size=(64,))) + 1.0
    ea = enc(a, True)
    out = ea.dropout(p=0.3)
    out.sum().backward()
    pt = out.get_plain_text()
    mask = (np.abs(pt) > 1e-6).astype(float)
    np.testing.assert_allclose(pt, a * mask / 0.7, atol=0.05)
    np.testing.assert_allclose(ea.grad.get_plain_text(), mask / 0.7, atol=0.05)


def case__feature_dropout():
    a = np.abs(_R.normal(size=(4, 3, 5))) + 1.0
    ea = enc(a, True)
    out = apply_function("_feature_dropout", ea, 0.4)
    out.sum().backward()
    pt = out.get_plain_text()
    # whole channels are zeroed: each (i, j) slice is all-zero or all-kept
    chan = np.abs(pt).sum(axis=-1)
    mask = (chan > 1e-6).astype(float)
    np.testing.assert_allclose(
        pt, a * mask[..., None] / 0.6, atol=0.05
    )
    np.testing.assert_allclose(
        ea.grad.get_plain_text(), np.broadcast_to(mask[..., None] / 0.6, a.shape),
        atol=0.05,
    )


# -- structure ops -----------------------------------------------------------

def case_view():
    _run(lambda a: a.view(6), lambda a: a.reshape(6), [_R.normal(size=(2, 3))])


def case_reshape():
    _run(lambda a: a.reshape(3, 2), lambda a: a.reshape(3, 2),
         [_R.normal(size=(2, 3))])


def case_flatten():
    _run(lambda a: a.flatten(), lambda a: a.flatten(), [_R.normal(size=(2, 3))])


def case_squeeze():
    _run(lambda a: a.squeeze(1), lambda a: a.squeeze(1),
         [_R.normal(size=(3, 1, 2))])


def case_unsqueeze():
    _run(lambda a: a.unsqueeze(1), lambda a: a.unsqueeze(1),
         [_R.normal(size=(3, 2))])


def case_t():
    _run(lambda a: a.t(), lambda a: a.t(), [_R.normal(size=(3, 2))])


def case_transpose():
    _run(lambda a: a.transpose(0, 2), lambda a: a.transpose(0, 2),
         [_R.normal(size=(2, 3, 4))])


def case_permute():
    _run(lambda a: a.permute(2, 0, 1), lambda a: a.permute(2, 0, 1),
         [_R.normal(size=(2, 3, 4))])


def case_roll():
    _run(lambda a: a.roll(2, 0), lambda a: a.roll(2, 0), [_R.normal(size=(5,))])


def case_flip():
    _run(lambda a: a.flip(0), lambda a: a.flip(0), [_R.normal(size=(5,))])


def case_narrow():
    _run(lambda a: a.narrow(0, 1, 2), lambda a: a.narrow(0, 1, 2),
         [_R.normal(size=(4, 3))])


def case_clone():
    _run(lambda a: a.clone(), lambda a: a.clone(), [_R.normal(size=(4,))])


def case_cat():
    _run(lambda a, b: curl_tpu.cat([a, b], 0), lambda a, b: torch_cat(a, b),
         [_R.normal(size=(2, 3)), _R.normal(size=(4, 3))])


def torch_cat(a, b):
    import torch

    return torch.cat([a, b], dim=0)


def case_stack():
    _run(lambda a, b: curl_tpu.stack([a, b], 0), lambda a, b: torch_stack(a, b),
         [_R.normal(size=(2, 3)), _R.normal(size=(2, 3))])


def torch_stack(a, b):
    import torch

    return torch.stack([a, b], dim=0)


def case_getitem():
    _run(lambda a: a[1], lambda a: a[1], [_R.normal(size=(4, 3))])


def case___getitem__():
    _run(lambda a: a[1:3], lambda a: a[1:3], [_R.normal(size=(5,))])


def case___rsub__():
    _run(lambda a: 2.0 - a, lambda a: 2.0 - a, [_R.normal(size=(5,))])


def case___rtruediv__():
    a = np.abs(_R.normal(size=(5,))) + 1.0
    _run(lambda x: 2.0 / x, lambda x: 2.0 / x, [a], tol=0.3, grad_tol=0.5)


def case_index_select():
    idx = np.array([0, 2])
    _run(lambda a: a.index_select(0, idx), lambda a: torch_index_select(a, idx),
         [_R.normal(size=(4, 3))])


def torch_index_select(a, idx):
    import torch

    return a.index_select(0, torch.tensor(idx))


def case_gather():
    idx = np.array([[0, 1], [1, 0]])
    _run(lambda a: a.gather(1, idx), lambda a: torch_gather(a, idx),
         [_R.normal(size=(2, 3))])


def torch_gather(a, idx):
    import torch

    return a.gather(1, torch.tensor(idx))


def case_scatter():
    idx = np.array([[0], [1]])
    _run(lambda a, s: a.scatter(1, idx, s), lambda a, s: torch_scatter(a, idx, s),
         [_R.normal(size=(2, 3)), _R.normal(size=(2, 1))])


def torch_scatter(a, idx, s):
    import torch

    return a.scatter(1, torch.tensor(idx), s)


def case_take():
    idx = np.array([0, 3, 5])
    _run(lambda a: a.take(idx), lambda a: torch_take(a, idx),
         [_R.normal(size=(2, 3))])


def torch_take(a, idx):
    import torch

    return a.take(torch.tensor(idx))


def case_trace():
    _run(lambda a: a.trace(), lambda a: a.trace(), [_R.normal(size=(3, 3))])


def case_cumsum():
    _run(lambda a: a.cumsum(0), lambda a: a.cumsum(0), [_R.normal(size=(5,))])


def case_pad():
    _run(lambda a: a.pad((1, 2)), lambda a: torch_pad(a), [_R.normal(size=(4,))])


def torch_pad(a):
    import torch.nn.functional as F

    return F.pad(a, (1, 2))


def case_sum():
    _run(lambda a: a.sum(0), lambda a: a.sum(0), [_R.normal(size=(3, 4))])


def case_mean():
    _run(lambda a: a.mean(0), lambda a: a.mean(0), [_R.normal(size=(3, 4))])


def case_var():
    _run(lambda a: a.var(0), lambda a: a.var(0, unbiased=False),
         [_R.normal(size=(4, 3))], tol=0.05, grad_tol=0.1)


def case_min():
    a = _R.normal(size=(6,))
    ea = enc(a, True)
    out = ea.min()
    np.testing.assert_allclose(out.get_plain_text(), a.min(), atol=0.05)
    out.backward()
    expected = (a == a.min()).astype(float)
    np.testing.assert_allclose(ea.grad.get_plain_text(), expected, atol=0.05)


def case_max():
    a = _R.normal(size=(6,))
    ea = enc(a, True)
    out = ea.max()
    np.testing.assert_allclose(out.get_plain_text(), a.max(), atol=0.05)
    out.backward()
    expected = (a == a.max()).astype(float)
    np.testing.assert_allclose(ea.grad.get_plain_text(), expected, atol=0.05)


def case_softmax():
    _run(lambda a: a.softmax(-1), lambda a: a.softmax(-1),
         [_R.normal(size=(2, 4))], tol=0.08, grad_tol=0.1)


def case_log_softmax():
    _run(lambda a: a.log_softmax(-1), lambda a: a.log_softmax(-1),
         [_R.normal(size=(2, 4))], tol=0.15, grad_tol=0.2)


def case_conv1d():
    _run(lambda a, w: a.conv1d(w), lambda a, w: torch_conv1d(a, w),
         [_R.normal(size=(1, 2, 8)), _R.normal(size=(3, 2, 3))], tol=0.05,
         grad_tol=0.1)


def torch_conv1d(a, w):
    import torch.nn.functional as F

    return F.conv1d(a, w)


def case_conv2d():
    _run(lambda a, w: a.conv2d(w), lambda a, w: torch_conv2d(a, w),
         [_R.normal(size=(1, 2, 5, 5)), _R.normal(size=(3, 2, 3, 3))],
         tol=0.05, grad_tol=0.1)


def torch_conv2d(a, w):
    import torch.nn.functional as F

    return F.conv2d(a, w)


def case_avg_pool2d():
    _run(lambda a: a.avg_pool2d(2), lambda a: torch_avg_pool(a),
         [_R.normal(size=(1, 2, 4, 4))], tol=0.05)


def torch_avg_pool(a):
    import torch.nn.functional as F

    return F.avg_pool2d(a, 2)


def case_max_pool2d():
    a = _R.normal(size=(1, 1, 4, 4))
    ea = enc(a, True)
    out = ea.max_pool2d(2)
    import torch
    import torch.nn.functional as F

    t = torch.tensor(a, requires_grad=True)
    expected = F.max_pool2d(t, 2)
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=0.05
    )
    out.sum().backward()
    expected.sum().backward()
    np.testing.assert_allclose(
        ea.grad.get_plain_text(), t.grad.numpy(), atol=0.05
    )


def case_layernorm():
    a = _R.normal(size=(2, 6))
    w = np.ones(6)
    b = np.zeros(6)
    ea = enc(a, True)
    out = apply_function("layernorm", ea, enc(w), enc(b), (1,))
    out.sum().backward()
    assert ea.grad is not None


def case_batchnorm():
    a = _R.normal(size=(4, 3))
    w = np.abs(_R.normal(size=(3,))) + 0.5
    b = _R.normal(size=(3,))
    ea, ew, eb = enc(a, True), enc(w, True), enc(b, True)
    out = apply_function("batchnorm", ea, ew, eb, training=True)
    import torch
    import torch.nn.functional as F

    ta = torch.tensor(a, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    tb = torch.tensor(b, requires_grad=True)
    # the reference normalizes by the UNBIASED variance (reference
    # gradients.py:1859 var(unbiased=True)), unlike torch's F.batch_norm
    # (biased); at N=4 that's a sqrt(4/3) scale difference, so compare
    # against the reference convention
    mean = ta.mean(0, keepdim=True)
    var = ta.var(0, unbiased=True, keepdim=True)
    expected = (ta - mean) / (var + 1e-5).sqrt() * tw + tb
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=0.25
    )
    out.sum().backward()
    expected.sum().backward()
    np.testing.assert_allclose(
        eb.grad.get_plain_text(), tb.grad.numpy(), atol=0.1
    )
    np.testing.assert_allclose(
        ew.grad.get_plain_text(), tw.grad.numpy(), atol=0.3
    )


def case_attention():
    q = _R.normal(size=(1, 3, 4)) * 0.5
    k = _R.normal(size=(1, 3, 4)) * 0.5
    v = _R.normal(size=(1, 3, 4)) * 0.5
    eq, ek, ev = enc(q, True), enc(k, True), enc(v, True)
    out = apply_function("attention", eq, ek, ev)
    import torch

    tq = torch.tensor(q, requires_grad=True)
    tk = torch.tensor(k, requires_grad=True)
    tv = torch.tensor(v, requires_grad=True)
    scores = tq @ tk.transpose(-2, -1) / np.sqrt(4)
    expected = scores.softmax(-1) @ tv
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=0.1
    )
    out.sum().backward()
    expected.sum().backward()
    for e, t in ((eq, tq), (ek, tk), (ev, tv)):
        np.testing.assert_allclose(
            e.grad.get_plain_text(), t.grad.numpy(), atol=0.15
        )


# -- losses ------------------------------------------------------------------

def case_binary_cross_entropy():
    p = _R.uniform(0.15, 0.85, size=(6,))
    y = (_R.uniform(size=(6,)) > 0.5).astype(np.float64)
    ep = enc(p, True)
    out = apply_function("binary_cross_entropy", ep, y)
    import torch
    import torch.nn.functional as F

    tp = torch.tensor(p, requires_grad=True)
    expected = F.binary_cross_entropy(tp, torch.tensor(y))
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=0.15
    )
    out.backward()
    expected.backward()
    np.testing.assert_allclose(
        ep.grad.get_plain_text(), tp.grad.numpy(), atol=0.5
    )


def case_binary_cross_entropy_with_logits():
    x = _R.normal(size=(6,))
    y = (_R.uniform(size=(6,)) > 0.5).astype(np.float64)
    ex = enc(x, True)
    out = apply_function("binary_cross_entropy_with_logits", ex, y)
    import torch
    import torch.nn.functional as F

    tx = torch.tensor(x, requires_grad=True)
    expected = F.binary_cross_entropy_with_logits(tx, torch.tensor(y))
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=0.15
    )
    out.backward()
    expected.backward()
    np.testing.assert_allclose(
        ex.grad.get_plain_text(), tx.grad.numpy(), atol=0.1
    )


def case_rappor_loss():
    x = _R.normal(size=(6,))
    y = (_R.uniform(size=(6,)) > 0.5).astype(np.float64)
    ex = enc(x, True)
    out = apply_function("rappor_loss", ex, y, 0.0)
    out.backward()
    assert ex.grad is not None
    # alpha=0 reduces to BCE-with-logits
    import torch
    import torch.nn.functional as F

    tx = torch.tensor(x, requires_grad=True)
    expected = F.binary_cross_entropy_with_logits(tx, torch.tensor(y))
    expected.backward()
    np.testing.assert_allclose(
        ex.grad.get_plain_text(), tx.grad.numpy(), atol=0.1
    )


def case_cross_entropy():
    x = _R.normal(size=(4, 5))
    labels = _R.integers(0, 5, size=(4,))
    y = np.eye(5)[labels]
    ex = enc(x, True)
    out = apply_function("cross_entropy", ex, y)
    import torch
    import torch.nn.functional as F

    tx = torch.tensor(x, requires_grad=True)
    expected = F.cross_entropy(tx, torch.tensor(labels))
    np.testing.assert_allclose(
        out.get_plain_text(), expected.detach().numpy(), atol=0.25
    )
    out.backward()
    expected.backward()
    np.testing.assert_allclose(
        ex.grad.get_plain_text(), tx.grad.numpy(), atol=0.1
    )


# ---------------------------------------------------------------------------
# the sweep
# ---------------------------------------------------------------------------

_CASES = {
    name[len("case_"):]: fn
    for name, fn in sorted(globals().items())
    if name.startswith("case_")
}


def test_every_registered_function_has_a_case():
    """Fails when a new @register_function lands without a gradcheck case."""
    missing = sorted(set(FUNCTION_REGISTRY) - set(_CASES))
    assert not missing, f"registered ops without a sweep case: {missing}"


@pytest.mark.parametrize("name", sorted(_CASES))
def test_gradcheck(name):
    # reseed per case (stable hash) so draws don't depend on which subset
    # of cases runs in the session — including the PROTOCOL randomness:
    # the eager session counter advances with every prior op in the whole
    # pytest run, so without re-init a borderline LUT cell can flip only
    # in full-suite order (the silu flake)
    import zlib

    import curl_tpu

    seed = zlib.crc32(name.encode())
    curl_tpu.init(world_size=2, seed=seed)
    global _R
    _R = np.random.default_rng(seed)
    _CASES[name]()
