"""Cascaded fold-scan max (functions/maximum.py), max-value-only reduction,
and position-chunked model stages (nn.module.scan_chunked).

These are the round-3 vocab-softmax/work-scaling levers: the cascade keeps
total tournament comparisons O(n) (vs W*log2(W) in a full-width butterfly
tail), max_value skips the argmax one-hot the reference's max(dim) derives
just to discard (reference maximum.py:39-54), and scan_chunked caps the
compiler/HBM footprint of position-independent stages (embedding, LM head,
vocab softmax) at a fixed chunk size.
"""

import numpy as np
import pytest

import curl_tpu
from curl_tpu import cfg


@pytest.fixture(autouse=True)
def _scan_cfg():
    with cfg.temp_override(
        {
            "functions.max_method": "scan_reduction",
            "functions.scan_fixed_width": 64,
            "functions.scan_cascade_factor": 4,
            "functions.scan_cascade_min": 8,
        }
    ):
        yield


@pytest.mark.parametrize(
    "shape,dim",
    [((300,), None), ((5, 130), 1), ((5, 130), 0), ((2, 3, 257), -1),
     ((77,), 0), ((8,), 0)],
)
def test_cascade_max_matches_plaintext(rng, shape, dim):
    x = rng.normal(size=shape) * 4
    xe = curl_tpu.cryptensor(x)
    got = np.asarray(xe.max_value(dim).get_plain_text())
    want = x.max() if dim is None else x.max(axis=dim)
    assert np.allclose(got, want, atol=2e-3)


def test_cascade_full_max_argmax(rng):
    x = rng.normal(size=(4, 130)) * 4
    xe = curl_tpu.cryptensor(x)
    v, a = xe.max(1)
    assert np.allclose(np.asarray(v.get_plain_text()), x.max(1), atol=2e-3)
    onehot = np.asarray(a.get_plain_text())
    assert np.allclose(onehot.sum(1), 1.0, atol=1e-3)
    assert (onehot.argmax(1) == x.argmax(1)).all()


def test_cascade_min_wider_than_padded(rng):
    # padded axis smaller than cascade_min: butterfly only, no folds
    with cfg.temp_override({"functions.scan_cascade_min": 4096}):
        x = rng.normal(size=(33,)) * 4
        xe = curl_tpu.cryptensor(x)
        got = float(xe.max_value(0).get_plain_text())
        assert abs(got - x.max()) < 2e-3


@pytest.mark.parametrize(
    "method", ["log_reduction", "pairwise", "double_log_reduction",
               "accelerated_cascade"]
)
def test_max_value_other_methods(rng, method):
    with cfg.temp_override({"functions.max_method": method}):
        x = rng.normal(size=(4, 33)) * 4
        xe = curl_tpu.cryptensor(x)
        assert np.allclose(
            np.asarray(xe.max_value(1).get_plain_text()), x.max(1), atol=2e-3
        )
        assert abs(float(xe.max_value().get_plain_text()) - x.max()) < 2e-3


def test_softmax_uses_max_value_and_matches(rng):
    x = rng.normal(size=(3, 70)) * 3
    xe = curl_tpu.cryptensor(x)
    sm = np.asarray(xe.softmax(-1).get_plain_text())
    ref = np.exp(x - x.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    # nexp-LUT relative error is ~1-3% per entry and the egk truncation can
    # shift an input one LUT cell, so a peaked probability can wobble a few
    # percent (position in the session key stream dependent)
    assert np.abs(sm - ref).max() < 5e-2
    np.testing.assert_allclose(sm.sum(-1), 1.0, atol=5e-2)


def test_scan_chunked_matches_unchunked(rng):
    """Chunked vs direct application of a private linear+softmax head."""
    from curl_tpu.nn.module import scan_chunked

    w = rng.normal(size=(12, 6))
    we = curl_tpu.cryptensor(w)
    x = rng.normal(size=(8, 12))

    def head(rows):
        return rows.matmul(we).softmax(-1)

    def run(chunk):
        def fn(xm):
            return scan_chunked(head, xm, chunk)

        xe = curl_tpu.cryptensor(x)
        return np.asarray(curl_tpu._eager_run(fn, xe).get_plain_text())

    direct = run(0)
    chunked = run(2)
    assert np.abs(direct - chunked).max() < 2e-2
    ref = x @ w
    ref = np.exp(ref - ref.max(-1, keepdims=True))
    ref /= ref.sum(-1, keepdims=True)
    assert np.abs(chunked - ref).max() < 2e-2


def test_gpt_head_chunking_token_parity(rng):
    """Tiny full GPT forward: the chunked head/embedding path and the
    unchunked path must BOTH decode within the protocol-noise envelope of
    the plaintext forward of the same weights.

    (The two encrypted runs consume different protocol-randomness streams,
    and a random-weight 16-dim GPT amplifies per-op LUT jitter through two
    LayerNorms, so enc-vs-enc diffs of ~0.06 are in-envelope — anchoring
    against the plain forward is what actually detects chunk-wiring bugs,
    which scramble positions and blow past the envelope by an order of
    magnitude. Elementwise chunk parity is asserted tightly in
    test_scan_chunked_matches_unchunked.)"""
    from curl_tpu import models
    from curl_tpu.nn.plain import PlainTensor

    plain = {}

    def run(chunk):
        with cfg.temp_override(
            {"models.head_chunk_positions": chunk,
             "functions.max_method": "scan_reduction"}
        ):
            curl_tpu.init(world_size=2, seed=77)
            m = models.GPT(embed_dim=16, num_heads=2, num_blocks=2,
                           vocab_size=50, seq_len=8, full=True)
            x = np.arange(8, dtype=np.float64).reshape(1, 8) % 50
            if "probs" not in plain:
                plain["probs"] = np.asarray(
                    m(PlainTensor(x)).get_plain_text()
                )
            m.encrypt(src=0)
            apply_fn, params = m.functional()
            xe = curl_tpu.cryptensor(x, precision=0)
            step = curl_tpu.compile_parties(apply_fn, world_size=2)
            import jax

            out = step(jax.random.PRNGKey(5), params, xe.mpc)
            return np.asarray(curl_tpu.CrypTensor(out).get_plain_text())

    full = run(0)
    chunked = run(4)
    ref = plain["probs"]
    assert full.shape == chunked.shape == ref.shape == (1, 8, 50)
    envelope = 0.08
    assert np.abs(full - ref).max() < envelope
    assert np.abs(chunked - ref).max() < envelope
    np.testing.assert_allclose(chunked.sum(-1), 1.0, atol=envelope)
