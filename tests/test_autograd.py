"""Autograd correctness vs numpy/torch gradients (parity scope: reference
test/test_autograd.py + test_gradients.py)."""

import numpy as np
import pytest

import curl_tpu


def enc(x, requires_grad=False):
    t = curl_tpu.cryptensor(np.asarray(x, dtype=np.float64))
    t.requires_grad = requires_grad
    return t


def torch_grad(fn, *arrays):
    import torch

    ts = [torch.tensor(a, requires_grad=True, dtype=torch.float64) for a in arrays]
    out = fn(*ts)
    out.sum().backward()
    return [t.grad.numpy() for t in ts]


def check_grads(got, expected, tol=1e-2):
    np.testing.assert_allclose(got.get_plain_text(), expected, atol=tol, rtol=0)


def test_add_mul_chain(rng):
    a = rng.normal(size=(4, 3))
    b = rng.normal(size=(4, 3))
    ea, eb = enc(a, True), enc(b, True)
    out = ea.mul(eb).add(ea).sum()
    out.backward()
    check_grads(ea.grad, b + 1)
    check_grads(eb.grad, a)


def test_matmul_grad(rng):
    a = rng.normal(size=(5, 4))
    b = rng.normal(size=(4, 3))
    ea, eb = enc(a, True), enc(b, True)
    out = ea.matmul(eb).sum()
    out.backward()
    ga, gb = torch_grad(lambda x, y: x @ y, a, b)
    check_grads(ea.grad, ga)
    check_grads(eb.grad, gb)


def test_square_exp_grads(rng):
    a = np.abs(rng.normal(size=(6,))) + 1.0
    ea = enc(a, True)
    ea.square().sum().backward()
    np.testing.assert_allclose(ea.grad.get_plain_text(), 2 * a, atol=0.05)

    ea = enc(a, True)
    ea.exp().sum().backward()
    np.testing.assert_allclose(ea.grad.get_plain_text(), np.exp(a), atol=0.3)


def test_relu_grad(rng):
    a = rng.normal(size=(10,))
    ea = enc(a, True)
    ea.relu().sum().backward()
    check_grads(ea.grad, (a > 0).astype(float))


def test_sigmoid_tanh_grads(rng):
    a = rng.normal(size=(8,)) * 2
    ea = enc(a, True)
    ea.sigmoid().sum().backward()
    s = 1 / (1 + np.exp(-a))
    np.testing.assert_allclose(ea.grad.get_plain_text(), s * (1 - s), atol=0.08)

    ea = enc(a, True)
    ea.tanh().sum().backward()
    np.testing.assert_allclose(
        ea.grad.get_plain_text(), 1 - np.tanh(a) ** 2, atol=0.15
    )


def test_softmax_grad(rng):
    a = rng.normal(size=(3, 5))
    w = rng.normal(size=(3, 5))
    ea = enc(a, True)
    out = ea.softmax(-1).mul(w).sum()
    out.backward()
    import torch

    (g,) = torch_grad(
        lambda x: (torch.softmax(x, -1) * torch.tensor(w)).sum(), a
    )
    # headroom for EGK probabilistic-truncation jitter in the LUT softmax
    np.testing.assert_allclose(ea.grad.get_plain_text(), g, atol=0.09)


def test_mean_var_grads(rng):
    a = rng.normal(size=(4, 6))
    ea = enc(a, True)
    ea.mean(axis=1).sum().backward()
    check_grads(ea.grad, np.full_like(a, 1 / 6))

    ea = enc(a, True)
    ea.var(axis=1).sum().backward()
    m = a.mean(1, keepdims=True)
    check_grads(ea.grad, 2 * (a - m) / 6, tol=0.02)


def test_view_transpose_grads(rng):
    a = rng.normal(size=(3, 4))
    ea = enc(a, True)
    w = rng.normal(size=(4, 3))
    ea.t().mul(w).sum().backward()
    check_grads(ea.grad, w.T)

    ea = enc(a, True)
    ea.view(12).mul(np.arange(12.0)).sum().backward()
    check_grads(ea.grad, np.arange(12.0).reshape(3, 4))


def test_conv2d_grad(rng):
    x = rng.normal(size=(1, 2, 6, 6))
    w = rng.normal(size=(3, 2, 3, 3))
    ex, ew = enc(x, True), enc(w, True)
    ex.conv2d(ew, padding=1).sum().backward()
    import torch

    tx = torch.tensor(x, requires_grad=True)
    tw = torch.tensor(w, requires_grad=True)
    torch.nn.functional.conv2d(tx, tw, padding=1).sum().backward()
    np.testing.assert_allclose(ex.grad.get_plain_text(), tx.grad.numpy(), atol=0.05)
    np.testing.assert_allclose(ew.grad.get_plain_text(), tw.grad.numpy(), atol=0.05)


def test_layernorm_grad(rng):
    x = rng.normal(size=(2, 5))
    w = np.ones(5)
    b = np.zeros(5)
    ex = enc(x, True)
    from curl_tpu.autograd import apply_function

    out = apply_function("layernorm", ex, w, b)
    out.sum().backward()
    import torch

    tx = torch.tensor(x, requires_grad=True)
    torch.nn.functional.layer_norm(tx, (5,)).sum().backward()
    np.testing.assert_allclose(ex.grad.get_plain_text(), tx.grad.numpy(), atol=0.05)


def test_max_pool_grad(rng):
    x = rng.normal(size=(1, 1, 4, 4)) * 3
    ex = enc(x, True)
    ex.max_pool2d(2).sum().backward()
    import torch

    tx = torch.tensor(x, requires_grad=True)
    torch.nn.functional.max_pool2d(tx, 2).sum().backward()
    np.testing.assert_allclose(ex.grad.get_plain_text(), tx.grad.numpy(), atol=0.01)


def test_no_grad_context(rng):
    a = enc(rng.normal(size=(3,)), True)
    with curl_tpu.no_grad():
        out = a.mul(a)
    assert getattr(out, "grad_fn", None) is None


def test_cross_entropy_training_convergence(rng):
    """Tiny logistic regression must converge under encrypted SGD."""
    from curl_tpu import nn, optim

    X = rng.normal(size=(20, 2))
    y = (X[:, 0] + X[:, 1] > 0).astype(np.float64)
    y_onehot = np.stack([1 - y, y], axis=1)

    model = nn.Linear(2, 2)
    model.encrypt(src=0)
    params = list(model._parameters.values())
    for p in params:
        p.requires_grad = True
    opt = optim.SGD(params, lr=0.5)
    criterion = nn.CrossEntropyLoss()

    losses = []
    for _ in range(4):
        opt.zero_grad()
        out = model(curl_tpu.cryptensor(X))
        loss = criterion(out, y_onehot)
        losses.append(float(loss.get_plain_text()))
        loss.backward()
        opt.step()
    assert losses[-1] < losses[0], losses
