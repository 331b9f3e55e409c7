"""Whole-program compilation tests: protocols, models, and full training
steps must trace into single XLA programs via compile_parties."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import curl_tpu
from curl_tpu import nn
from curl_tpu.parallel import compile_parties, compile_parties_cached


def test_compiled_matches_eager(rng):
    curl_tpu.init(world_size=2, seed=201)
    x = curl_tpu.cryptensor(rng.normal(size=(8, 8)))
    y = curl_tpu.cryptensor(rng.normal(size=(8, 8)))

    step = compile_parties(lambda a, b: a.mul(b).relu(), world_size=2)
    out = step(jax.random.PRNGKey(0), x.mpc, y.mpc)
    ref = np.maximum(
        np.asarray(x.get_plain_text()) * np.asarray(y.get_plain_text()), 0
    )
    np.testing.assert_allclose(
        curl_tpu.CrypTensor(out).get_plain_text(), ref, atol=0.02
    )


def test_compiled_training_step(rng):
    """forward + autograd backward + SGD update as ONE traced program."""
    curl_tpu.init(world_size=2, seed=202)
    model = nn.Linear(4, 2)
    model.encrypt(src=0)
    apply_fn, params = model.functional()

    X = rng.normal(size=(16, 4))
    Y = X @ rng.normal(size=(4, 2))
    xe = curl_tpu.cryptensor(X)
    ye = curl_tpu.cryptensor(Y)

    def train_step(p, xm, ym):
        model.bind_params(p)
        w = model._parameters["weight"]
        b = model._parameters["bias"]
        w.requires_grad = True
        b.requires_grad = True
        w.grad = None
        b.grad = None
        out = model.forward(xm)
        loss = out.sub(ym).square().mean()
        loss.backward()
        new_w = w.sub(w.grad.mul(0.1))
        new_b = b.sub(b.grad.mul(0.1))
        return {"__params__": {"weight": new_w, "bias": new_b}}, loss

    step = compile_parties(train_step, world_size=2)
    p = params
    losses = []
    for i in range(3):
        p, loss = step(jax.random.PRNGKey(300 + i), p, xe.mpc, ye.mpc)
        losses.append(float(curl_tpu.CrypTensor(loss).get_plain_text()))
    assert losses[-1] < losses[0], losses


def test_compiled_cached_pipeline(rng):
    curl_tpu.init(world_size=2, seed=203)
    x = curl_tpu.cryptensor(rng.normal(size=(4, 4)))
    y = curl_tpu.cryptensor(rng.normal(size=(4, 4)))

    online, fill = compile_parties_cached(
        lambda a, b: a.matmul(b), 2, 5, x.mpc, y.mpc
    )
    cache = fill(jax.random.PRNGKey(11))
    out = online(jax.random.PRNGKey(11), cache, x.mpc, y.mpc)
    ref = np.asarray(x.get_plain_text()) @ np.asarray(y.get_plain_text())
    np.testing.assert_allclose(
        curl_tpu.CrypTensor(out).get_plain_text(), ref, atol=0.05
    )


def test_scan_blocks_compiled(rng):
    """Multi-block model runs under lax.scan with per-block PRNG forking."""
    from curl_tpu.models import GPT

    curl_tpu.init(world_size=2, seed=204)
    model = GPT(embed_dim=8, num_heads=2, num_blocks=3, vocab_size=16,
                seq_len=4, full=False)
    model.encrypt(src=0)
    apply_fn, params = model.functional()
    x = curl_tpu.cryptensor(rng.normal(size=(1, 4, 8)) * 0.3)

    step = compile_parties(apply_fn, world_size=2)
    out = step(jax.random.PRNGKey(0), params, x.mpc)
    dec = curl_tpu.CrypTensor(out).get_plain_text()
    assert dec.shape == (1, 4, 8)
    assert np.isfinite(dec).all()
    # sanity: output in a sane activation range
    assert np.abs(dec).max() < 50
