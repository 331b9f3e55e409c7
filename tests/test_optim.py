"""Optimizer tests (parity scope: reference test/test_optim.py).

Encrypted SGD trajectories are compared step-for-step against
``torch.optim.SGD`` on identical plaintext parameters/gradients across the
momentum / nesterov / dampening / weight-decay grid — the encrypted update
must track the torch update within fixed-point tolerance at every step.
"""

import numpy as np
import pytest
import torch

import curl_tpu
from curl_tpu import nn, optim
from curl_tpu.autograd import no_grad


def _torch_trajectory(p0, grads, steps, **kw):
    tp = torch.nn.Parameter(torch.tensor(p0))
    opt = torch.optim.SGD([tp], **kw)
    out = []
    for s in range(steps):
        opt.zero_grad()
        tp.grad = torch.tensor(grads[s])
        opt.step()
        out.append(tp.detach().numpy().copy())
    return out


class _Param:
    """Minimal CrypTensor parameter holder with a .grad slot."""

    def __init__(self, value):
        self.t = curl_tpu.cryptensor(value)
        self.grad = None

    # Optimizer touches these on the parameter object
    def __getattr__(self, name):
        return getattr(self.t, name)


@pytest.mark.parametrize(
    "kw",
    [
        {"lr": 0.1},
        {"lr": 0.1, "momentum": 0.9},
        {"lr": 0.1, "momentum": 0.9, "nesterov": True},
        {"lr": 0.1, "momentum": 0.5, "dampening": 0.3},
        {"lr": 0.05, "weight_decay": 0.1},
        {"lr": 0.1, "momentum": 0.9, "weight_decay": 0.05},
    ],
    ids=["plain", "momentum", "nesterov", "dampening", "wd", "momentum+wd"],
)
def test_sgd_matches_torch(kw):
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(4, 3))
    grads = [rng.normal(size=(4, 3)) * 0.5 for _ in range(4)]
    ref = _torch_trajectory(p0, grads, 4, **kw)

    p = curl_tpu.cryptensor(p0, requires_grad=True)
    opt = optim.SGD([p], **kw)
    with no_grad():
        for s in range(4):
            p.grad = curl_tpu.cryptensor(grads[s])
            opt.step()
            np.testing.assert_allclose(
                p.get_plain_text(), ref[s], atol=0.02,
                err_msg=f"diverged from torch at step {s}",
            )


def test_sgd_rejects_bad_hyperparams():
    p = curl_tpu.cryptensor(np.zeros(2), requires_grad=True)
    with pytest.raises(ValueError):
        optim.SGD([p], lr=-1.0)
    with pytest.raises(ValueError):
        optim.SGD([p], lr=0.1, momentum=-0.5)
    with pytest.raises(ValueError):
        optim.SGD([p], lr=0.1, weight_decay=-0.1)
    with pytest.raises(ValueError):
        optim.SGD([p], lr=0.1, nesterov=True)  # needs momentum
    with pytest.raises(ValueError):
        optim.SGD([p], lr=0.1, momentum=0.9, dampening=0.1, nesterov=True)


def test_grad_threshold_zeroes_exploding_entries():
    p0 = np.zeros((4,))
    g = np.array([0.1, -0.2, 5.0, -7.0])  # last two exceed threshold 1.0
    p = curl_tpu.cryptensor(p0, requires_grad=True)
    opt = optim.SGD([p], lr=1.0, grad_threshold=1.0)
    with no_grad():
        p.grad = curl_tpu.cryptensor(g)
        opt.step()
    out = p.get_plain_text()
    np.testing.assert_allclose(out[:2], -g[:2], atol=0.02)
    np.testing.assert_allclose(out[2:], 0.0, atol=0.02)


def test_zero_grad_and_param_groups():
    p1 = curl_tpu.cryptensor(np.ones(3), requires_grad=True)
    p2 = curl_tpu.cryptensor(np.zeros(3), requires_grad=True)
    opt = optim.SGD([p1, p2], lr=0.1)
    p1.grad = curl_tpu.cryptensor(np.ones(3))
    p2.grad = curl_tpu.cryptensor(np.ones(3))
    opt.zero_grad()
    assert p1.grad is None and p2.grad is None
    assert len(opt.param_groups) == 1
    assert len(opt.param_groups[0]["params"]) == 2


def test_module_training_with_optimizer_converges():
    """Linear regression trained with the encrypted SGD reaches the least-
    squares solution (mirrors the reference's end-to-end optimizer check)."""
    rng = np.random.default_rng(5)
    w_true = np.array([[1.5, -2.0]])
    x = rng.normal(size=(32, 2))
    y = x @ w_true.T

    model = nn.Linear(2, 1)
    model.encrypt(src=0)
    opt = optim.SGD(model.parameters(), lr=0.2, momentum=0.5)
    loss_fn = nn.MSELoss()
    for _ in range(30):
        xe = curl_tpu.cryptensor(x)
        ye = curl_tpu.cryptensor(y)
        out = model(xe)
        loss = loss_fn(out, ye)
        model.zero_grad()
        loss.backward()
        opt.step()
    model.decrypt()
    w = np.asarray(model._parameters["weight"])
    np.testing.assert_allclose(w, w_true, atol=0.15)
