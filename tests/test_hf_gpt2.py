"""HF GPT-2 checkpoint loading: encrypted forward vs transformers.

The reference's gpt.py runs random weights only; loading a real HuggingFace
``GPT2LMHeadModel`` checkpoint is the path an HF user needs. This builds a
tiny-config HF model locally (no downloads), maps its state_dict via
``GPT.load_hf_state_dict``, and checks the encrypted 2-party forward
against the torch forward.
"""

import numpy as np
import pytest

import curl_tpu
from curl_tpu.models import GPT

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(7)
    cfg = GPT2Config(
        vocab_size=64,
        n_positions=16,
        n_embd=32,
        n_layer=2,
        n_head=2,
        # large enough init that logits carry real structure (the default
        # 0.02 leaves probs ~uniform and would hide weight-mapping bugs)
        initializer_range=0.25,
        resid_pdrop=0.0,
        embd_pdrop=0.0,
        attn_pdrop=0.0,
        # exact-erf gelu matches our LUT target (gelu_new is a tanh approx)
        activation_function="gelu",
    )
    hf = GPT2LMHeadModel(cfg).eval()
    ours = GPT(
        embed_dim=32, num_heads=2, num_blocks=2, vocab_size=64, seq_len=8,
        full=True, causal=True,
    )
    ours.load_hf_state_dict(hf.state_dict())
    return hf, ours


def test_hf_weights_roundtrip_plaintext_shapes(tiny_pair):
    hf, ours = tiny_pair
    wte = hf.state_dict()["transformer.wte.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(ours.tok_embed._parameters["weight"]), wte, atol=1e-6
    )
    # c_attn transposed into Linear layout
    c_attn = hf.state_dict()["transformer.h.0.attn.c_attn.weight"].numpy()
    np.testing.assert_allclose(
        np.asarray(ours.blocks[0].attn.search._parameters["weight"]),
        c_attn.T,
        atol=1e-6,
    )
    assert np.asarray(ours._parameters["pos_embed"]).shape == (1, 8, 32)


def test_encrypted_forward_matches_hf(tiny_pair):
    hf, ours = tiny_pair
    tokens = np.array([[5, 17, 42, 3, 60, 11, 29, 8]])
    with torch.no_grad():
        logits = hf(torch.tensor(tokens)).logits
        ref_probs = torch.softmax(logits, -1).numpy()

    ours.encrypt(src=0)
    xe = curl_tpu.cryptensor(tokens.astype(np.float64), precision=0)
    probs = ours(xe).get_plain_text()

    assert probs.shape == ref_probs.shape
    # fixed-point + LUT noise stacks over 2 blocks: tail probabilities match
    # to ~1e-4, the peaked entries wobble by up to ~0.06 (softmax amplifies
    # logit noise at the mode), and ranking must be preserved
    np.testing.assert_allclose(probs, ref_probs, atol=0.1)
    tv = 0.5 * np.abs(probs - ref_probs).sum(-1)
    assert tv.max() < 0.15, f"total-variation distance {tv}"
    agree = (probs.argmax(-1) == ref_probs.argmax(-1)).mean()
    assert agree >= 0.75, f"argmax agreement {agree}"
