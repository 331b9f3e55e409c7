"""nn module system tests (parity scope: reference test/test_nn.py)."""

import numpy as np
import pytest

import curl_tpu
from curl_tpu import nn


def test_linear_matches_plaintext(rng):
    m = nn.Linear(4, 3)
    x = rng.normal(size=(5, 4))
    w = np.asarray(m._parameters["weight"])
    b = np.asarray(m._parameters["bias"])
    m.encrypt(src=0)
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    np.testing.assert_allclose(out, x @ w.T + b, atol=0.01)


def test_encrypt_decrypt_roundtrip(rng):
    m = nn.Linear(3, 2)
    w_before = np.asarray(m._parameters["weight"]).copy()
    m.encrypt(src=0)
    assert curl_tpu.is_encrypted_tensor(m._parameters["weight"])
    m.decrypt()
    np.testing.assert_allclose(
        np.asarray(m._parameters["weight"]), w_before, atol=1e-4
    )


def test_sequential_and_activations(rng):
    m = nn.Sequential(nn.Linear(4, 8), nn.ReLU(), nn.Linear(8, 2), nn.Sigmoid())
    x = rng.normal(size=(3, 4))
    # plaintext forward
    w0 = np.asarray(m[0]._parameters["weight"]); b0 = np.asarray(m[0]._parameters["bias"])
    w1 = np.asarray(m[2]._parameters["weight"]); b1 = np.asarray(m[2]._parameters["bias"])
    h = np.maximum(x @ w0.T + b0, 0)
    ref = 1 / (1 + np.exp(-(h @ w1.T + b1)))
    m.encrypt(src=0)
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    # haar sigmoid cell error (~0.03) stacked on linear fixed-point error
    np.testing.assert_allclose(out, ref, atol=0.09)


def test_layernorm_module(rng):
    m = nn.LayerNorm(6)
    x = rng.normal(size=(2, 6)) * 3
    m.encrypt(src=0)
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    ref = (x - mean) / np.sqrt(var + 1e-5)
    # bounded by the inv_sqrt tailored_haar cell-mean error at small var
    np.testing.assert_allclose(out, ref, atol=0.12)


def test_conv2d_module(rng):
    m = nn.Conv2d(2, 3, 3, padding=1)
    x = rng.normal(size=(1, 2, 5, 5))
    w = np.asarray(m._parameters["weight"]); b = np.asarray(m._parameters["bias"])
    import torch

    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=1
    ).numpy()
    m.encrypt(src=0)
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_conv_transpose_modules(rng):
    import torch

    m2 = nn.ConvTranspose2d(3, 2, 3, stride=2, padding=1, output_padding=1)
    x2 = rng.normal(size=(1, 3, 4, 4))
    w2 = np.asarray(m2._parameters["weight"]); b2 = np.asarray(m2._parameters["bias"])
    ref2 = torch.nn.functional.conv_transpose2d(
        torch.tensor(x2), torch.tensor(w2), torch.tensor(b2),
        stride=2, padding=1, output_padding=1,
    ).numpy()
    m2.encrypt(src=0)
    out2 = m2(curl_tpu.cryptensor(x2)).get_plain_text()
    np.testing.assert_allclose(out2, ref2, atol=0.05)

    m1 = nn.ConvTranspose1d(2, 3, 3, stride=2)
    x1 = rng.normal(size=(1, 2, 5))
    w1 = np.asarray(m1._parameters["weight"]); b1 = np.asarray(m1._parameters["bias"])
    ref1 = torch.nn.functional.conv_transpose1d(
        torch.tensor(x1), torch.tensor(w1), torch.tensor(b1), stride=2
    ).numpy()
    m1.encrypt(src=0)
    out1 = m1(curl_tpu.cryptensor(x1)).get_plain_text()
    np.testing.assert_allclose(out1, ref1, atol=0.05)


def test_embedding_module(rng):
    m = nn.Embedding(11, 4)
    w = np.asarray(m._parameters["weight"])
    m.encrypt(src=0)
    idx = np.array([0.0, 3.0, 10.0, 7.0])
    out = m(curl_tpu.cryptensor(idx, precision=0)).get_plain_text()
    np.testing.assert_allclose(out, w[idx.astype(int)], atol=0.01)


def test_attention_module(rng):
    m = nn.Attention(8, 2)
    x = rng.normal(size=(1, 4, 8)) * 0.5

    # plaintext reference
    Ws = np.asarray(m.search._parameters["weight"]); bs = np.asarray(m.search._parameters["bias"])
    Wp = np.asarray(m.proj._parameters["weight"]); bp = np.asarray(m.proj._parameters["bias"])
    qkv = x @ Ws.T + bs
    q, k, v = np.split(qkv, 3, axis=2)
    B, T, E = x.shape; H, D = 2, 4
    q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, H, D).transpose(0, 2, 3, 1)
    v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    a = q @ k / np.sqrt(D)
    a = np.exp(a - a.max(-1, keepdims=True)); a /= a.sum(-1, keepdims=True)
    y = (a @ v).transpose(0, 2, 1, 3).reshape(B, T, E)
    ref = y @ Wp.T + bp

    m.encrypt(src=0)
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_state_dict_roundtrip(rng):
    m = nn.Sequential(nn.Linear(3, 4), nn.ReLU(), nn.Linear(4, 2))
    sd = m.state_dict()
    assert "0.weight" in sd and "2.bias" in sd
    m2 = nn.Sequential(nn.Linear(3, 4), nn.ReLU(), nn.Linear(4, 2))
    m2.load_state_dict(sd)
    np.testing.assert_array_equal(
        np.asarray(m2._parameters_of("0.weight")), np.asarray(sd["0.weight"])
    ) if hasattr(m2, "_parameters_of") else None
    np.testing.assert_array_equal(
        np.asarray(m2[0]._parameters["weight"]), np.asarray(sd["0.weight"])
    )


def test_load_torch_state_dict():
    import torch

    tm = torch.nn.Linear(4, 3)
    m = nn.Linear(4, 3)
    m.load_state_dict(tm.state_dict())
    np.testing.assert_allclose(
        np.asarray(m._parameters["weight"]), tm.weight.detach().numpy(), atol=1e-6
    )


def test_losses(rng):
    x = rng.uniform(0.1, 0.9, size=(6,))
    y = rng.uniform(0.1, 0.9, size=(6,))
    ex, ey = curl_tpu.cryptensor(x), curl_tpu.cryptensor(y)
    mse = nn.MSELoss()(ex, ey).get_plain_text()
    np.testing.assert_allclose(mse, ((x - y) ** 2).mean(), atol=0.01)
    l1 = nn.L1Loss()(ex, ey).get_plain_text()
    np.testing.assert_allclose(l1, np.abs(x - y).mean(), atol=0.01)
    bce = nn.BCELoss()(ex, ey).get_plain_text()
    ref = -(y * np.log(x) + (1 - y) * np.log(1 - x)).mean()
    np.testing.assert_allclose(bce, ref, atol=0.25)


def test_cross_entropy_loss(rng):
    logits = rng.normal(size=(4, 3))
    labels = np.eye(3)[[0, 2, 1, 1]]
    loss = nn.CrossEntropyLoss()(
        curl_tpu.cryptensor(logits), labels
    ).get_plain_text()
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    ref = -(labels * np.log(p)).sum() / 4
    np.testing.assert_allclose(loss, ref, atol=0.1)


def test_dropout_module_training_flag(rng):
    m = nn.Dropout(0.5)
    x = np.ones((50,))
    m.train()
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    assert (out == 0).any()
    m.eval()
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    np.testing.assert_allclose(out, x, atol=0.01)


def test_batchnorm_eval(rng):
    m = nn.BatchNorm1d(4)
    m._buffers["running_mean"] = np.array([1.0, 2.0, 0.0, -1.0])
    m._buffers["running_var"] = np.array([1.0, 4.0, 0.25, 1.0])
    x = rng.normal(size=(3, 4))
    m.eval()
    m.encrypt(src=0)
    out = m(curl_tpu.cryptensor(x)).get_plain_text()
    ref = (x - np.array([1.0, 2.0, 0.0, -1.0])) / np.sqrt(
        np.array([1.0, 4.0, 0.25, 1.0]) + 1e-5
    )
    np.testing.assert_allclose(out, ref, atol=0.05)


def test_gpt_block_forward(rng):
    from curl_tpu.models import GPT

    model = GPT(embed_dim=8, num_heads=2, num_blocks=1, vocab_size=50,
                seq_len=4, full=False)
    model.encrypt(src=0)
    x = rng.normal(size=(1, 4, 8)) * 0.5
    out = model(curl_tpu.cryptensor(x))
    assert out.shape == (1, 4, 8)


def test_full_tiny_gpt_with_embedding(rng):
    from curl_tpu.models import GPT

    model = GPT(embed_dim=8, num_heads=2, num_blocks=1, vocab_size=16,
                seq_len=4, full=True)
    model.encrypt(src=0)
    tokens = np.array([[1.0, 5.0, 3.0, 15.0]])
    out = model(curl_tpu.cryptensor(tokens, precision=0))
    probs = out.get_plain_text()
    assert probs.shape == (1, 4, 16)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=0.2)
