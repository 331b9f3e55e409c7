"""GPT family for private inference (parity scope: examples/llms/gpt.py).

Hand-built from curl_tpu.nn modules exactly as the reference builds its LLM
path (no ONNX, no autograd): pre-LN transformer blocks with the fused
Attention module, GELU FFN, private embedding lookup, final LM head +
softmax.
"""

from __future__ import annotations

import curl_tpu
import jax.numpy as jnp

from .. import nn


class GPT(nn.Module):
    class Block(nn.Module):
        def __init__(self, embed_dim, num_heads, causal=False):
            super().__init__()
            self.ln1 = nn.LayerNorm(embed_dim)
            self.ln2 = nn.LayerNorm(embed_dim)
            self.attn = nn.Attention(embed_dim, num_heads, causal=causal)
            self.ff = nn.Sequential(
                nn.Linear(embed_dim, embed_dim * 4),
                nn.GELU(),
                nn.Linear(embed_dim * 4, embed_dim),
            )

        def forward(self, x):
            x = x + self.attn(self.ln1(x))
            x = x + self.ff(self.ln2(x))
            return x

    def __init__(self, embed_dim, num_heads, num_blocks, vocab_size, seq_len,
                 full=True, causal=False):
        super().__init__()
        self.full = full
        self.embed_dim = embed_dim
        self.seq_len = seq_len
        self.num_blocks = num_blocks
        self.vocab_size = vocab_size

        if full:
            self.tok_embed = nn.Embedding(vocab_size, embed_dim)
            self.register_parameter(
                "pos_embed", jnp.zeros((1, seq_len, embed_dim), jnp.float64)
            )
        self.blocks = nn.Sequential(
            *[GPT.Block(embed_dim, num_heads, causal=causal)
              for _ in range(num_blocks)]
        )
        if full:
            self.ln = nn.LayerNorm(embed_dim)
            self.fc = nn.Linear(embed_dim, vocab_size)
            self.softmax = nn.Softmax(-1)

    def forward_macs(self, batch, seq):
        """Plain multiply-accumulate count of one forward (for the bench's
        arithmetic-intensity floor; excludes nonlinearity LUT work)."""
        d = self.embed_dim
        per_block = (
            seq * d * 3 * d          # qkv projection
            + 2 * seq * seq * d      # scores + weighted values
            + seq * d * d            # attn out projection
            + 2 * seq * d * 4 * d    # ffn up + down
        )
        macs = self.num_blocks * per_block
        if self.full:
            macs += 2 * seq * self.vocab_size * d  # embedding one-hot + lm head
        return batch * macs

    @staticmethod
    def _head_chunk():
        """cfg.models.head_chunk_positions: positions per traced chunk for
        the embedding / LM-head / vocab-softmax stages (0 = off). These
        stages are position-independent, so chunking them under one scan
        body (nn.module.scan_chunked) caps compiler + HBM footprint at the
        chunk size — the enabler for batch >= 8 and the GPT-Neo widths on
        the remote TPU compiler."""
        try:
            return int(curl_tpu.cfg.models.head_chunk_positions)
        except AttributeError:
            return 0

    def forward(self, x):
        chunk = self._head_chunk() if self.full else 0
        if self.full:
            if x.dim() == 2:
                b, t = x.shape
                tok = nn.module.scan_chunked(
                    self.tok_embed, x.reshape(b * t), chunk, salt=9 << 20
                ).reshape(b, t, self.embed_dim)
            else:
                tok = self.tok_embed(x)
            pos = self._parameters["pos_embed"]
            pos = pos[:, : x.shape[1], :] if hasattr(pos, "__getitem__") else pos
            x = tok + pos
        x = nn.module.scan_identical_blocks(self.blocks, x)
        if self.full:
            b, t, d = x.shape

            def head(rows):
                return self.softmax(self.fc(self.ln(rows)))

            x = nn.module.scan_chunked(
                head, x.reshape(b * t, d), chunk, salt=10 << 20
            ).reshape(b, t, self.vocab_size)
        return x

    # -- HF weight mapping ----------------------------------------------
    def load_hf_state_dict(self, sd):
        """Map a HuggingFace ``GPT2LMHeadModel`` (or bare ``GPT2Model``)
        state_dict onto this model.

        HF's Conv1D layers store weights input-major ``(in, out)``; our
        Linear stores ``(out, in)``, so c_attn/c_proj/c_fc weights are
        transposed. The LM head is weight-tied to ``wte`` and bias-free.
        The reference has no GPT checkpoint loader (its gpt.py runs random
        weights); this is the path a reference user coming from HF needs.
        """

        def g(key):
            t = sd[key]
            return jnp.asarray(
                t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                jnp.float64,
            )

        pfx = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
        assert self.full, "load_hf_state_dict needs the full model (full=True)"
        self.tok_embed._parameters["weight"] = g(pfx + "wte.weight")
        self._parameters["pos_embed"] = g(pfx + "wpe.weight")[None, : self.seq_len]
        for i, blk in enumerate(self.blocks._modules.values()):
            p = f"{pfx}h.{i}."
            blk.ln1._parameters["weight"] = g(p + "ln_1.weight")
            blk.ln1._parameters["bias"] = g(p + "ln_1.bias")
            blk.ln2._parameters["weight"] = g(p + "ln_2.weight")
            blk.ln2._parameters["bias"] = g(p + "ln_2.bias")
            blk.attn.search._parameters["weight"] = g(p + "attn.c_attn.weight").T
            blk.attn.search._parameters["bias"] = g(p + "attn.c_attn.bias")
            blk.attn.proj._parameters["weight"] = g(p + "attn.c_proj.weight").T
            blk.attn.proj._parameters["bias"] = g(p + "attn.c_proj.bias")
            blk.ff[0]._parameters["weight"] = g(p + "mlp.c_fc.weight").T
            blk.ff[0]._parameters["bias"] = g(p + "mlp.c_fc.bias")
            blk.ff[2]._parameters["weight"] = g(p + "mlp.c_proj.weight").T
            blk.ff[2]._parameters["bias"] = g(p + "mlp.c_proj.bias")
        self.ln._parameters["weight"] = g(pfx + "ln_f.weight")
        self.ln._parameters["bias"] = g(pfx + "ln_f.bias")
        # LM head: weight-tied to wte, no bias in HF
        head_key = "lm_head.weight" if "lm_head.weight" in sd else pfx + "wte.weight"
        self.fc._parameters["weight"] = g(head_key)
        self.fc._parameters["bias"] = jnp.zeros((self.vocab_size,), jnp.float64)
        return self


class GPT2(GPT):
    def __init__(self, seq_len, full=True, causal=False):
        super().__init__(embed_dim=768, num_heads=12, num_blocks=12,
                         vocab_size=50257, seq_len=seq_len, full=full,
                         causal=causal)


class GPTNeo(GPT):
    def __init__(self, seq_len, full=True, causal=False):
        super().__init__(embed_dim=2048, num_heads=16, num_blocks=24,
                         vocab_size=50257, seq_len=seq_len, full=full,
                         causal=causal)


class GPTNeoLarge(GPT):
    def __init__(self, seq_len, full=True, causal=False):
        super().__init__(embed_dim=2560, num_heads=20, num_blocks=32,
                         vocab_size=50257, seq_len=seq_len, full=full,
                         causal=causal)
