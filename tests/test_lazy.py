"""curl_tpu.lazy — batched eager execution (no reference counterpart; the
TPU answer to per-op eager dispatch, see curl_tpu/lazy.py docstring)."""

import numpy as np
import pytest

import curl_tpu


@pytest.fixture(autouse=True)
def _init():
    curl_tpu.init(world_size=2, seed=9)
    yield


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def test_lazy_exact_linear_ops(rng):
    x = rng.normal(size=(3, 4))
    xe = curl_tpu.cryptensor(x)
    with curl_tpu.lazy():
        a = xe + 1.5
        b = a - 0.25
        c = b * 2.0  # public mul: exact
        d = c.sum(axis=1)
    np.testing.assert_allclose(d.get_plain_text(), ((x + 1.25) * 2).sum(1), atol=2e-4)
    # intermediate tensors were filled by the same flush
    assert a._mpc is not None and b._mpc is not None and c._mpc is not None
    np.testing.assert_allclose(a.get_plain_text(), x + 1.5, atol=2e-4)


def test_lazy_matches_plaintext_nonlinear(rng):
    x = rng.normal(size=(4, 8))
    w = rng.normal(size=(8, 8))
    xe, we = curl_tpu.cryptensor(x), curl_tpu.cryptensor(w)
    with curl_tpu.lazy():
        p = xe.matmul(we).gelu().softmax(-1)
    z = x @ w
    g = 0.5 * z * (1 + np.tanh(np.sqrt(2 / np.pi) * (z + 0.044715 * z**3)))
    sm = np.exp(g - g.max(-1, keepdims=True))
    sm /= sm.sum(-1, keepdims=True)
    # LUT approximation envelope (same as the eager path's)
    assert np.abs(p.get_plain_text() - sm).max() < 0.15


def test_pending_metadata_without_flush(rng):
    x = rng.normal(size=(2, 5))
    xe = curl_tpu.cryptensor(x)
    with curl_tpu.lazy() as tape:
        y = xe.matmul(curl_tpu.cryptensor(rng.normal(size=(5, 3))))
        assert y.shape == (2, 3)
        assert y.ndim == 2
        assert y.size(1) == 3
        assert "pending" in repr(y)
        assert len(tape.nodes) >= 1  # nothing flushed by metadata queries
    assert y._mpc is not None  # scope exit flushed


def test_midscope_flush_then_continue(rng):
    x = rng.normal(size=(4,))
    xe = curl_tpu.cryptensor(x)
    with curl_tpu.lazy():
        a = xe + 1.0
        np.testing.assert_allclose(a.get_plain_text(), x + 1.0, atol=2e-4)
        b = a * 3.0  # recording continues after the mid-scope flush
    np.testing.assert_allclose(b.get_plain_text(), (x + 1.0) * 3.0, atol=6e-4)


def test_lazy_comparisons_and_max(rng):
    x = rng.normal(size=(3, 9)) * 10
    xe = curl_tpu.cryptensor(x)
    with curl_tpu.lazy():
        m = xe.max(-1)[0]
        s = xe.relu()
    np.testing.assert_allclose(m.get_plain_text(), x.max(-1), atol=2e-4)
    np.testing.assert_allclose(s.get_plain_text(), np.maximum(x, 0), atol=2e-4)


def test_nested_scopes(rng):
    x = rng.normal(size=(4,))
    xe = curl_tpu.cryptensor(x)
    with curl_tpu.lazy():
        a = xe + 1.0
        with curl_tpu.lazy():
            inner = xe * 2.0
        # inner scope flushed its own tape on exit
        assert inner._mpc is not None
        b = a + inner
    np.testing.assert_allclose(b.get_plain_text(), x * 3.0 + 1.0, atol=4e-4)


def test_single_program_dispatch(rng, monkeypatch):
    """The whole lazy scope must execute as exactly ONE _eager_run dispatch."""
    calls = []
    real = curl_tpu._eager_run

    def counting(fn, *args, **kw):
        calls.append(kw.get("_jit", False))
        return real(fn, *args, **kw)

    monkeypatch.setattr(curl_tpu, "_eager_run", counting)
    x = rng.normal(size=(3,))
    xe = curl_tpu.cryptensor(x)
    with curl_tpu.lazy():
        y = ((xe + 1.0) * 2.0 - 0.5).square()
    got = y.get_plain_text()
    np.testing.assert_allclose(got, ((x + 1) * 2 - 0.5) ** 2, atol=1e-3)
    # recording ops call the patched _eager_run but return before dispatch;
    # the only real device dispatch is the single jitted flush
    assert calls.count(True) == 1
