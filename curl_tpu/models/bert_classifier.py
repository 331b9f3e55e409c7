"""BERT for sequence classification under encryption, HF-weight compatible.

Parity scope: reference examples/llms/bert_for_sequence_classification.py —
full BERT encoder (word/position/token-type embeddings, post-LN blocks),
[CLS] pooler and classification head, loadable from a HuggingFace
BertForSequenceClassification state_dict via load_hf_state_dict.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .. import nn


class BertClassifierConfig:
    def __init__(self, vocab_size=30522, hidden=128, heads=2, layers=2,
                 intermediate=512, max_pos=512, type_vocab=2, num_labels=2,
                 seq_len=128):
        self.vocab_size = vocab_size
        self.hidden = hidden
        self.heads = heads
        self.layers = layers
        self.intermediate = intermediate
        self.max_pos = max_pos
        self.type_vocab = type_vocab
        self.num_labels = num_labels
        self.seq_len = seq_len


class BertForSequenceClassification(nn.Module):
    class Block(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.attn = nn.Attention(cfg.hidden, cfg.heads)
            self.ln1 = nn.LayerNorm(cfg.hidden)
            self.ff = nn.Sequential(
                nn.Linear(cfg.hidden, cfg.intermediate),
                nn.GELU(),
                nn.Linear(cfg.intermediate, cfg.hidden),
            )
            self.ln2 = nn.LayerNorm(cfg.hidden)

        def forward(self, x):
            x = self.ln1(x + self.attn(x))
            x = self.ln2(x + self.ff(x))
            return x

    def __init__(self, cfg: BertClassifierConfig):
        super().__init__()
        self.cfg = cfg
        # vocab padded to the next power of two: evaluate_embed's one-hot
        # index is taken mod table size (reference qnli.py:43-47)
        self.padded_vocab = 1 << math.ceil(math.log2(cfg.vocab_size))
        self.word_embeddings = nn.Embedding(self.padded_vocab, cfg.hidden)
        self.register_parameter(
            "position_embeddings", jnp.zeros((1, cfg.seq_len, cfg.hidden))
        )
        self.token_type_embeddings = nn.Embedding(
            max(cfg.type_vocab, 2), cfg.hidden
        )
        self.embed_ln = nn.LayerNorm(cfg.hidden)
        self.blocks = nn.Sequential(
            *[BertForSequenceClassification.Block(cfg) for _ in range(cfg.layers)]
        )
        self.pooler = nn.Linear(cfg.hidden, cfg.hidden)
        self.classifier = nn.Linear(cfg.hidden, cfg.num_labels)

    def forward(self, input_ids, token_type_ids=None):
        x = self.word_embeddings(input_ids)
        pos = self._parameters["position_embeddings"]
        pos = pos[:, : input_ids.shape[1], :] if hasattr(pos, "__getitem__") else pos
        x = x + pos
        if token_type_ids is not None:
            x = x + self.token_type_embeddings(token_type_ids)
        x = self.embed_ln(x)
        x = nn.module.scan_identical_blocks(self.blocks, x)
        cls = x[:, 0, :]
        pooled = self.pooler(cls).tanh()
        return self.classifier(pooled)

    # -- HF weight mapping --------------------------------------------------
    def load_hf_state_dict(self, sd):
        """Map a HuggingFace BertForSequenceClassification state_dict."""

        def g(key):
            t = sd[key]
            return jnp.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

        w = g("bert.embeddings.word_embeddings.weight")
        pad = self.padded_vocab - w.shape[0]
        if pad > 0:
            w = jnp.concatenate([w, jnp.zeros((pad, w.shape[1]))])
        self.word_embeddings._parameters["weight"] = w
        pos = g("bert.embeddings.position_embeddings.weight")
        self._parameters["position_embeddings"] = pos[None, : self.cfg.seq_len]
        self.token_type_embeddings._parameters["weight"] = g(
            "bert.embeddings.token_type_embeddings.weight"
        )
        self.embed_ln._parameters["weight"] = g("bert.embeddings.LayerNorm.weight")
        self.embed_ln._parameters["bias"] = g("bert.embeddings.LayerNorm.bias")

        for i, block in enumerate(self.blocks._modules.values()):
            p = f"bert.encoder.layer.{i}."
            q = g(p + "attention.self.query.weight")
            k = g(p + "attention.self.key.weight")
            v = g(p + "attention.self.value.weight")
            qb = g(p + "attention.self.query.bias")
            kb = g(p + "attention.self.key.bias")
            vb = g(p + "attention.self.value.bias")
            block.attn.search._parameters["weight"] = jnp.concatenate([q, k, v], 0)
            block.attn.search._parameters["bias"] = jnp.concatenate([qb, kb, vb], 0)
            block.attn.proj._parameters["weight"] = g(
                p + "attention.output.dense.weight"
            )
            block.attn.proj._parameters["bias"] = g(p + "attention.output.dense.bias")
            block.ln1._parameters["weight"] = g(
                p + "attention.output.LayerNorm.weight"
            )
            block.ln1._parameters["bias"] = g(p + "attention.output.LayerNorm.bias")
            block.ff[0]._parameters["weight"] = g(p + "intermediate.dense.weight")
            block.ff[0]._parameters["bias"] = g(p + "intermediate.dense.bias")
            block.ff[2]._parameters["weight"] = g(p + "output.dense.weight")
            block.ff[2]._parameters["bias"] = g(p + "output.dense.bias")
            block.ln2._parameters["weight"] = g(p + "output.LayerNorm.weight")
            block.ln2._parameters["bias"] = g(p + "output.LayerNorm.bias")

        self.pooler._parameters["weight"] = g("bert.pooler.dense.weight")
        self.pooler._parameters["bias"] = g("bert.pooler.dense.bias")
        self.classifier._parameters["weight"] = g("classifier.weight")
        self.classifier._parameters["bias"] = g("classifier.bias")
        return self


def BertTinyForSequenceClassification(seq_len=128, num_labels=2):
    return BertForSequenceClassification(
        BertClassifierConfig(hidden=128, heads=2, layers=2, intermediate=512,
                             num_labels=num_labels, seq_len=seq_len)
    )


def BertBaseForSequenceClassification(seq_len=128, num_labels=2):
    return BertForSequenceClassification(
        BertClassifierConfig(hidden=768, heads=12, layers=12,
                             intermediate=3072, num_labels=num_labels,
                             seq_len=seq_len)
    )
