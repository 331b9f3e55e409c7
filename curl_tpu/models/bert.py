"""BERT family for private inference (parity scope: examples/llms/bert.py).

Post-LN transformer blocks (LN after the residual add, unlike GPT's
pre-LN), private embedding lookup, LM head + softmax.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import nn


class Bert(nn.Module):
    class Block(nn.Module):
        def __init__(self, embed_dim, num_heads):
            super().__init__()
            self.ln1 = nn.LayerNorm(embed_dim)
            self.ln2 = nn.LayerNorm(embed_dim)
            self.attn = nn.Attention(embed_dim, num_heads)
            self.ff = nn.Sequential(
                nn.Linear(embed_dim, embed_dim * 4),
                nn.GELU(),
                nn.Linear(embed_dim * 4, embed_dim),
            )

        def forward(self, x):
            x = self.ln1(x + self.attn(x))
            x = self.ln2(x + self.ff(x))
            return x

    def __init__(self, embed_dim, num_heads, num_blocks, vocab_size, seq_len,
                 full=True):
        super().__init__()
        self.full = full
        self.embed_dim = embed_dim
        self.seq_len = seq_len

        if full:
            self.tok_embed = nn.Embedding(vocab_size, embed_dim)
            self.register_parameter(
                "pos_embed", jnp.zeros((1, seq_len, embed_dim), jnp.float64)
            )
        self.blocks = nn.Sequential(
            *[Bert.Block(embed_dim, num_heads) for _ in range(num_blocks)]
        )
        self.ln = nn.LayerNorm(embed_dim)
        if full:
            self.fc = nn.Linear(embed_dim, vocab_size)
            self.softmax = nn.Softmax(-1)

    def forward(self, x):
        if self.full:
            tok = self.tok_embed(x)
            pos = self._parameters["pos_embed"]
            pos = pos[:, : x.shape[1], :] if hasattr(pos, "__getitem__") else pos
            x = tok + pos
        x = self.ln(x)
        x = nn.module.scan_identical_blocks(self.blocks, x)
        if self.full:
            x = self.fc(x)
            x = self.softmax(x)
        return x


class BertTiny(Bert):
    def __init__(self, seq_len, full=True):
        super().__init__(embed_dim=128, num_heads=2, num_blocks=2,
                         vocab_size=30522, seq_len=seq_len, full=full)


class BertBase(Bert):
    def __init__(self, seq_len, full=True):
        super().__init__(embed_dim=768, num_heads=12, num_blocks=12,
                         vocab_size=30522, seq_len=seq_len, full=full)


class BertLarge(Bert):
    def __init__(self, seq_len, full=True):
        super().__init__(embed_dim=1024, num_heads=16, num_blocks=24,
                         vocab_size=30522, seq_len=seq_len, full=full)
