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


class GPT2(GPT):
    def __init__(self, seq_len, full=True):
        super().__init__(embed_dim=768, num_heads=12, num_blocks=12,
                         vocab_size=50257, seq_len=seq_len, full=full)


class GPTNeo(GPT):
    def __init__(self, seq_len, full=True):
        super().__init__(embed_dim=2048, num_heads=16, num_blocks=24,
                         vocab_size=50257, seq_len=seq_len, full=full)


class GPTNeoLarge(GPT):
    def __init__(self, seq_len, full=True):
        super().__init__(embed_dim=2560, num_heads=20, num_blocks=32,
                         vocab_size=50257, seq_len=seq_len, full=full)
