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


class ChunkedLMHead(nn.Module):
    """LM-head Linear over a vocab-sliced seed-compressed weight.

    The (V, d) weight is padded to a chunk multiple, split into
    ``n_chunks`` row slices, each slice seed-compressed with its own key,
    and the slices stacked into one (n, V/n, d) share0 buffer via donated
    writes (same streaming pattern as PrestackedBlocks). forward() scans
    the slices — per-iteration live set (expanded weight slice + its
    Beaver-triple masks) is 1/n of the full head's, which is what keeps
    the GPT-Neo head inside HBM. Logits concatenate chunk-major and the
    vocab padding is sliced off before the softmax.
    """

    def __init__(self, weight, bias, n_chunks, write_fn):
        super().__init__()
        import jax

        from ..nn.module import _init_key, stack_compressed_chunks

        V, d = weight.shape
        self.vocab = V
        self.n_chunks = n_chunks
        master = jax.random.fold_in(_init_key(), 0x10EAD)
        tree, _vc, self.v_pad = stack_compressed_chunks(
            weight, n_chunks, 0, write_fn, master
        )
        self._parameters["wchunks"] = tree
        if bias is not None:
            self.register_parameter("bias", bias)

    def forward(self, x):
        from jax import lax

        from .. import random as _rng

        w = self._parameters["wchunks"]

        def body(carry, inp):
            w_i, idx = inp
            with _rng.fork(idx + (11 << 20)):
                logits_i = x.matmul(w_i.t())
            return carry, logits_i

        _, pieces = lax.scan(
            body, 0, (w, jnp.arange(self.n_chunks))
        )
        # (n, rows, vc) -> (rows, n * vc) chunk-major, then drop pad lanes
        n, r, vc = pieces.shape
        out = pieces.transpose(1, 0).reshape(r, n * vc)
        if self.v_pad != self.vocab:
            out = out[:, : self.vocab]
        if "bias" in self._parameters:
            out = out + self._parameters["bias"]
        return out


class ChunkedEmbedding(nn.Module):
    """Embedding over a vocab-sliced seed-compressed table (the embedding
    counterpart of ChunkedLMHead — see beaver.evaluate_embed_chunked for
    why the unsliced lookup cannot fit GPT-Neo in HBM). Chunk slicing,
    compression, and stacked storage mirror ChunkedLMHead exactly."""

    def __init__(self, weight, n_chunks, write_fn):
        super().__init__()
        import jax

        from ..encoder import FixedPointEncoder
        from ..nn.module import _init_key, stack_compressed_chunks

        V, d = weight.shape
        self.vocab = V
        self.embed_dim = d
        self.n_chunks = n_chunks
        self._encoder_bits = FixedPointEncoder(None).precision_bits
        master = jax.random.fold_in(_init_key(), 0xE4BED)
        tree, _vc, self.v_pad = stack_compressed_chunks(
            weight, n_chunks, 0, write_fn, master
        )
        self._parameters["tchunks"] = tree

    def forward(self, x):
        from ..encoder import FixedPointEncoder
        from ..mpc.mpc import MPCTensor
        from ..mpc.primitives import beaver
        from ..mpc.primitives.arithmetic import ArithmeticSharedTensor

        out = beaver.evaluate_embed_chunked(
            x._tensor, self._parameters["tchunks"], self.vocab,
            self.embed_dim,
        )
        return MPCTensor(
            ArithmeticSharedTensor(
                out.share, FixedPointEncoder(self._encoder_bits)
            )
        )


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
                if chunk > 0 and b * t > chunk and (b * t) % chunk == 0:
                    # embedding table reused across the chunk scan: mask once
                    self._premask_linear(self.tok_embed)
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

            if chunk > 0 and b * t > chunk and (b * t) % chunk == 0:
                # the head scan reuses the SAME fc weight across b*t/chunk
                # iterations: pre-mask it once (beaver.mask_operand) so each
                # chunk draws only input-sized Beaver randomness instead of a
                # fresh (d, V)-sized mask + (d, V)-sized delta reveal
                self._premask_linear(self.fc)

            def head(rows):
                return self.softmax(self.fc(self.ln(rows)))

            x = nn.module.scan_chunked(
                head, x.reshape(b * t, d), chunk, salt=10 << 20
            ).reshape(b, t, self.vocab_size)
        return x

    @staticmethod
    def _premask_linear(lin):
        """Replace a Linear's encrypted weight with its Beaver-masked form
        (no-op for plain, compressed, or already-masked weights, and under
        provider/cache configs where mask_operand declines)."""
        from ..mpc.mpc import MPCTensor
        from ..mpc.primitives import beaver
        from ..mpc.primitives.arithmetic import ArithmeticSharedTensor

        w = lin._parameters.get("weight") if hasattr(lin, "_parameters") else None
        if not isinstance(w, MPCTensor):
            return
        if type(w._tensor) is not ArithmeticSharedTensor:
            return  # compressed / masked / binary: leave as-is
        masked = beaver.mask_operand(w._tensor)
        if masked is not w._tensor:
            lin._parameters["weight"] = MPCTensor(masked)

    def premask_for_reuse(self):
        """Beaver-mask every weight that a multi-forward trace (a decode
        loop, a multi-step training unroll) will reuse: embedding table,
        LM head, and each block's Linears. Masks are drawn ONCE at trace
        top; the block scan stacks the masked pytrees so every later
        product pays only input-sized randomness (beaver.mask_operand).
        No-op where masking doesn't apply (plain/compressed weights,
        non-TFP providers, cache flows)."""
        if self.full:
            self._premask_linear(self.tok_embed)
            self._premask_linear(self.fc)
        blocks = self.blocks
        if isinstance(blocks, nn.Sequential):
            for blk in blocks:
                self._premask_linear(blk.attn.search)
                self._premask_linear(blk.attn.proj)
                self._premask_linear(blk.ff._modules["0"])
                self._premask_linear(blk.ff._modules["2"])
        return self

    # -- GPT-Neo-scale streaming construction ----------------------------
    @classmethod
    def build_compressed(cls, embed_dim, num_heads, num_blocks, vocab_size,
                         seq_len, causal=False, head_vocab_chunks=8,
                         chunk_block_linears=None):
        """Build an encrypted GPT whose parameters never all materialize.

        The enabler for GPT-Neo (1.3B) on one 16 GB chip: materialized 2PC
        shares need 21 GB. Three memory levers compose:
          1. seed-compressed shares (mpc/primitives/compressed.py): only
             share0 = w - PRG(key) is resident — 10.5 GB, not 21;
          2. streaming block construction: each block is initialized,
             compressed, written into ONE pre-allocated stacked buffer
             with a donated in-place update, then freed — peak stays one
             block above the final footprint (nn.module.PrestackedBlocks;
             the in-graph jnp.stack of scan_identical_blocks would cost a
             second full copy);
          3. vocab-chunked LM head (ChunkedLMHead): the (d, 50257) weight
             expands per vocab slice under a scan, capping the
             weight-sized Beaver-triple transients at 1/chunks.
        """
        import jax
        from functools import partial

        model = cls(embed_dim, num_heads, 0, vocab_size, seq_len,
                    full=True, causal=causal)
        model.num_blocks = num_blocks

        @partial(jax.jit, donate_argnums=(0,))
        def _write(buf, leaf, i):
            return buf.at[i].set(leaf)

        if chunk_block_linears is None:
            # at >= 1024-dim the block FFN/QKV weight-sized Beaver
            # transients ((d, 4d) per lane) no longer fit next to the
            # resident share0 stacks — chunk them into (d, d) slices
            chunk_block_linears = embed_dim >= 1024

        def _chunkify_block(blk):
            """Replace the block's big Linears with ChunkedLinear at (d, d)
            slice granularity (out-chunked QKV/FFN-up, in-chunked FFN-down)
            BEFORE the compress walk, so their full weights never expand."""
            if not chunk_block_linears:
                return

            def take(lin):
                return (lin._parameters["weight"],
                        lin._parameters.get("bias"))

            w, bias = take(blk.attn.search)
            blk.attn.search = nn.module.ChunkedLinear(
                w, bias, 3, 0, _write, salt=13 << 20
            )
            w, bias = take(blk.ff._modules["0"])
            blk.ff._modules["0"] = nn.module.ChunkedLinear(
                w, bias, 4, 0, _write, salt=14 << 20
            )
            w, bias = take(blk.ff._modules["2"])
            blk.ff._modules["2"] = nn.module.ChunkedLinear(
                w, bias, 4, 1, _write, salt=15 << 20
            )

        stacked = None
        treedef = None
        template = None
        for b in range(num_blocks):
            blk = cls.Block(embed_dim, num_heads, causal=causal)
            _chunkify_block(blk)
            blk.encrypt(src=0, seed_compress=True)
            tree = blk.params_pytree()
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            if stacked is None:
                stacked = [
                    jnp.zeros((num_blocks,) + l.shape, l.dtype) for l in leaves
                ]
            stacked = [
                _write(s, l, b) for s, l in zip(stacked, leaves)
            ]
            if b == num_blocks - 1:
                template = blk
                # the template's own (compressed) params duplicate stack
                # row b — drop them; bind_params installs fresh values
                # before every forward
                for m in template.modules():
                    for name in list(m._parameters):
                        m._parameters[name] = None
            del tree, leaves
        stacked_tree = jax.tree_util.tree_unflatten(treedef, stacked)
        model.blocks = nn.module.PrestackedBlocks(
            template, stacked_tree, num_blocks
        )

        # LM head: vocab-sliced compressed weight + one scan (fc replaced
        # BEFORE the compress walk so its full weight never compresses)
        fcw = model.fc._parameters["weight"]          # (V, d) plain
        fcb = model.fc._parameters.get("bias")
        model.fc = ChunkedLMHead(fcw, fcb, head_vocab_chunks, _write)
        del fcw

        # embedding: same vocab slicing — the unsliced lookup's table-sized
        # Beaver masks are the other HBM overflow (evaluate_embed_chunked)
        tew = model.tok_embed._parameters["weight"]   # (V, d) plain
        model.tok_embed = ChunkedEmbedding(tew, head_vocab_chunks, _write)
        del tew

        # everything else (pos, LN) compresses in place
        model.encrypt(src=0, seed_compress=True)
        return model

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
    GEOM = dict(embed_dim=768, num_heads=12, num_blocks=12, vocab_size=50257)

    def __init__(self, seq_len, full=True, causal=False):
        super().__init__(embed_dim=768, num_heads=12, num_blocks=12,
                         vocab_size=50257, seq_len=seq_len, full=full,
                         causal=causal)


class GPTNeo(GPT):
    GEOM = dict(embed_dim=2048, num_heads=16, num_blocks=24, vocab_size=50257)

    def __init__(self, seq_len, full=True, causal=False):
        super().__init__(embed_dim=2048, num_heads=16, num_blocks=24,
                         vocab_size=50257, seq_len=seq_len, full=full,
                         causal=causal)


class GPTNeoLarge(GPT):
    GEOM = dict(embed_dim=2560, num_heads=20, num_blocks=32, vocab_size=50257)

    def __init__(self, seq_len, full=True, causal=False):
        super().__init__(embed_dim=2560, num_heads=20, num_blocks=32,
                         vocab_size=50257, seq_len=seq_len, full=full,
                         causal=causal)
