#!/usr/bin/env python3
"""Fully-private autoregressive generation — the whole decode loop is ONE
fused XLA program.

No reference counterpart (curl's LLM examples are single-forward latency
benches, examples/llms/llm.py); this is the TPU-first additive piece. The
design departs from token-id feedback loops entirely:

  * tokens stay ENCRYPTED end to end: the prompt enters as an encrypted
    one-hot buffer, each generated token is a private argmax one-hot that is
    written back into the buffer with a public position mask (local op), and
    its embedding on the next step is a private one-hot @ W_embed Beaver
    matmul. Nothing is revealed until the final buffer reveal (and a real
    deployment could keep even that secret-shared);
  * the decode loop is jax.lax.scan over public position masks: fixed
    shapes, one traced step body, so the G-token generation compiles to a
    single program — no per-step dispatch, retrace, or host round-trip;
  * causal attention via the public-mask softmax (zero protocol cost;
    curl_tpu/functions/approximations.py softmax, nn.Attention(causal=True)).

Run (CPU, tiny model):   python examples/generate.py
Env: GEN_TOKENS (4), PROMPT_LEN (4), SEQ (8), VOCAB (97), DIM (32).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_generator(model, steps):
    """Return forward(buf, sel_masks, write_masks, step_ids) scanning the
    private decode step; buf is the (B, T, V) encrypted one-hot buffer."""
    import jax.numpy as jnp
    from jax import lax

    from curl_tpu import nn
    from curl_tpu import random as crng

    T = model.seq_len

    def forward(buf, sel_masks, write_masks, step_ids):
        # every weight is reused at every decode step: Beaver-mask them all
        # ONCE at trace top (models/gpt.py premask_for_reuse) — per-step
        # products then draw only input-sized randomness
        if hasattr(model, "premask_for_reuse"):
            model.premask_for_reuse()
        emb_w = model.tok_embed._parameters["weight"]
        pos = model._parameters["pos_embed"]

        def step(carry, xs):
            sel, wr, idx = xs
            with crng.fork(idx + (1 << 22)):
                x = carry.matmul(emb_w) + pos
                x = nn.module.scan_identical_blocks(model.blocks, x)
                x = model.ln(x)
                logits = model.fc(x)  # (B, T, V)
                last = logits.mul(sel.reshape(1, T, 1)).sum(axis=1)  # (B, V)
                nxt = last.argmax(dim=-1, one_hot=True)  # private (B, V)
                carry = carry.add(nxt.unsqueeze(1).mul(wr.reshape(1, T, 1)))
            return carry, None

        buf, _ = lax.scan(step, buf, (sel_masks, write_masks, step_ids))
        return buf

    return forward


def make_masks(prompt_len, steps, seq_len):
    import jax.numpy as jnp

    sel = np.zeros((steps, seq_len))
    wr = np.zeros((steps, seq_len))
    for g in range(steps):
        sel[g, prompt_len + g - 1] = 1.0
        wr[g, prompt_len + g] = 1.0
    return jnp.asarray(sel), jnp.asarray(wr), jnp.arange(steps)


def plaintext_replica(weights, buf, prompt_len, steps, num_heads):
    """Same computation in float64 numpy (greedy argmax), for verification."""
    D = weights["emb"].shape[1]
    hd = D // num_heads
    T = buf.shape[1]
    causal = np.tril(np.ones((T, T)))

    def ln(x, w, b):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5) * w + b

    def gelu_t(x):
        return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi) * (x + 0.044715 * x**3)))

    def fwd(buf):
        x = buf @ weights["emb"] + weights["pos"]
        for blk in weights["blocks"]:
            h = ln(x, blk["ln1_w"], blk["ln1_b"])
            qkv = h @ blk["qkv_w"].T + blk["qkv_b"]
            q, k, v = np.split(qkv, 3, axis=-1)
            B, T_, _ = q.shape
            q = q.reshape(B, T_, num_heads, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, T_, num_heads, hd).transpose(0, 2, 3, 1)
            v = v.reshape(B, T_, num_heads, hd).transpose(0, 2, 1, 3)
            a = q @ k / np.sqrt(hd)
            a = np.exp(a - a.max(-1, keepdims=True)) * causal
            a = a / np.maximum(a.sum(-1, keepdims=True), 1e-12)
            y = (a @ v).transpose(0, 2, 1, 3).reshape(B, T_, D)
            x = x + y @ blk["proj_w"].T + blk["proj_b"]
            h = ln(x, blk["ln2_w"], blk["ln2_b"])
            h = gelu_t(h @ blk["fc1_w"].T + blk["fc1_b"]) @ blk["fc2_w"].T + blk["fc2_b"]
            x = x + h
        x = ln(x, weights["lnf_w"], weights["lnf_b"])
        return x @ weights["head_w"].T + weights["head_b"]

    buf = buf.copy()
    toks = []
    for g in range(steps):
        logits = fwd(buf)
        last = logits[:, prompt_len + g - 1, :]
        tok = int(last.argmax(-1)[0])
        toks.append(tok)
        buf[0, prompt_len + g, tok] = 1.0
    return toks, fwd


def extract_plain_weights(model):
    """Snapshot plaintext params (call BEFORE encrypt)."""
    import numpy as np

    def g(mod, name):
        return np.asarray(mod._parameters[name])

    blocks = []
    for blk in model.blocks._modules.values():
        ff = list(blk.ff._modules.values())
        blocks.append(
            {
                "ln1_w": g(blk.ln1, "weight"), "ln1_b": g(blk.ln1, "bias"),
                "ln2_w": g(blk.ln2, "weight"), "ln2_b": g(blk.ln2, "bias"),
                "qkv_w": g(blk.attn.search, "weight"), "qkv_b": g(blk.attn.search, "bias"),
                "proj_w": g(blk.attn.proj, "weight"), "proj_b": g(blk.attn.proj, "bias"),
                "fc1_w": g(ff[0], "weight"), "fc1_b": g(ff[0], "bias"),
                "fc2_w": g(ff[2], "weight"), "fc2_b": g(ff[2], "bias"),
            }
        )
    return {
        "emb": g(model.tok_embed, "weight"),
        "pos": g(model, "pos_embed"),
        "blocks": blocks,
        "lnf_w": g(model.ln, "weight"), "lnf_b": g(model.ln, "bias"),
        "head_w": g(model.fc, "weight"), "head_b": g(model.fc, "bias"),
    }


def run(seq_len=8, vocab=97, dim=32, heads=2, blocks=2, prompt_len=4,
        gen_tokens=4, seed=0, verbose=True):
    import jax
    import jax.numpy as jnp

    import curl_tpu
    from curl_tpu import models

    assert prompt_len + gen_tokens <= seq_len
    curl_tpu.init(world_size=2, seed=seed)

    model = models.GPT(embed_dim=dim, num_heads=heads, num_blocks=blocks,
                       vocab_size=vocab, seq_len=seq_len, full=True,
                       causal=True)
    # domain hygiene: scale weights so activations stay inside the LUT
    # envelopes (random-init kaiming weights at depth produce out-of-domain
    # logits; a trained checkpoint does this naturally)
    rng = np.random.default_rng(seed)
    for mod in model.modules():
        for name, p in list(mod._parameters.items()):
            arr = np.asarray(p)
            mod._parameters[name] = jnp.asarray(arr * 0.25)
    model.tok_embed._parameters["weight"] = jnp.asarray(
        rng.normal(size=(vocab, dim)) * 0.5
    )
    model._parameters["pos_embed"] = jnp.asarray(
        rng.normal(size=(1, seq_len, dim)) * 0.1
    )

    plain = extract_plain_weights(model)
    model.encrypt(src=0)

    prompt = rng.integers(0, vocab, size=(prompt_len,))
    buf0 = np.zeros((1, seq_len, vocab))
    buf0[0, np.arange(prompt_len), prompt] = 1.0

    sel, wr, ids = make_masks(prompt_len, gen_tokens, seq_len)
    gen_forward = build_generator(model, gen_tokens)

    def apply_fn(p, buf):
        model.bind_params(p)
        return gen_forward(buf, sel, wr, ids)

    params = model.functional()[1]
    step = curl_tpu.compile_parties(apply_fn, world_size=2)
    buf_enc = curl_tpu.cryptensor(buf0)

    import time

    t0 = time.time()
    out = step(jax.random.PRNGKey(seed + 1), params, buf_enc.mpc)
    # out is party-stacked: CrypTensor sums shares across the party axis
    # before decoding (MPCTensor.get_plain_text alone would decode each
    # party's share separately — garbage)
    final = np.asarray(curl_tpu.CrypTensor(out).get_plain_text())  # (B, T, V)
    wall = time.time() - t0

    got_tokens = [int(final[0, prompt_len + g].argmax()) for g in range(gen_tokens)]
    want_tokens, fwd = plaintext_replica(plain, buf0, prompt_len, gen_tokens,
                                         heads)

    # encrypted choice must be a near-argmax under plaintext semantics
    # (LUT noise can flip exact ties; a large logit gap must not flip)
    margins = []
    buf_chk = buf0.copy()
    for g, tok in enumerate(got_tokens):
        logits = fwd(buf_chk)[0, prompt_len + g - 1]
        margins.append(float(logits.max() - logits[tok]))
        buf_chk[0, prompt_len + g, tok] = 1.0

    if verbose:
        print(f"prompt ids:    {list(map(int, prompt))}")
        print(f"generated ids: {got_tokens}  (encrypted, one fused program, "
              f"{wall:.1f}s incl. compile)")
        print(f"plaintext ids: {want_tokens}")
        print(f"agreement: {sum(a == b for a, b in zip(got_tokens, want_tokens))}"
              f"/{gen_tokens}; worst plaintext margin of encrypted choice: "
              f"{max(margins):.4f}")
    return got_tokens, want_tokens, margins


if __name__ == "__main__":
    run(
        seq_len=int(os.environ.get("SEQ", "8")),
        vocab=int(os.environ.get("VOCAB", "97")),
        prompt_len=int(os.environ.get("PROMPT_LEN", "4")),
        gen_tokens=int(os.environ.get("GEN_TOKENS", "4")),
        dim=int(os.environ.get("DIM", "32")),
    )
