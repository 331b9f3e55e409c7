"""Fully-private autoregressive generation (examples/generate.py): the
whole decode loop compiles to one program; generated tokens must be
near-argmax under plaintext semantics (exact-argmax when margins exceed
the LUT noise floor)."""

import numpy as np


def test_tiny_generation_matches_plaintext():
    import examples.generate as G

    got, want, margins = G.run(
        seq_len=6, vocab=31, dim=16, heads=2, blocks=1,
        prompt_len=3, gen_tokens=2, seed=0, verbose=False,
    )
    # every encrypted choice is a near-argmax of the plaintext logits
    assert max(margins) < 0.05, margins
    # and with comfortable margins the tokens agree exactly
    assert got == want, (got, want, margins)
