"""Seed-compressed 2PC shares (mpc/primitives/compressed.py): party 1's
share is PRG(key) regenerated at use, share0 = w - r is the only resident
share — the memory design that fits GPT-Neo on one chip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import curl_tpu
from curl_tpu.mpc.primitives.compressed import (
    SeedCompressedArithmetic,
    bits_for_impl,
)


@pytest.fixture(autouse=True)
def _init():
    curl_tpu.init(world_size=2, seed=5)


def test_expansion_reconstructs_plaintext():
    vals = np.linspace(-8, 8, 96).reshape(6, 16)
    key = jax.random.PRNGKey(7)
    t = SeedCompressedArithmetic.encrypt(vals, key)
    # share0 + PRG(key) must decode to the fixed-point encoding of vals
    r = bits_for_impl(key, t.share0.shape, t._impl)
    dec = np.asarray((t.share0 + r).view(jnp.int64)).astype(np.float64)
    np.testing.assert_allclose(
        dec / t.encoder.scale, vals, atol=1.0 / t.encoder.scale
    )


def test_pytree_roundtrip_and_vmap_axes():
    from curl_tpu.mpc.mpc import MPCTensor
    from curl_tpu.parallel.runner import _arg_axes

    t = SeedCompressedArithmetic.encrypt(np.ones((4, 4)), jax.random.PRNGKey(1))
    leaves, treedef = jax.tree_util.tree_flatten(MPCTensor(t))
    # share0 lo/hi u32 planes + key — no materialized party axis, and no
    # uint64 inputs (the TPU X64 emulation would split those into a full
    # second copy of temps)
    assert len(leaves) == 3
    assert all(l.dtype != jnp.uint64 for l in leaves[:2])
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(rebuilt._tensor, SeedCompressedArithmetic)

    # params mixing stacked MPCTensor leaves and compressed leaves produce a
    # per-subtree in_axes pytree (None over compressed, 0 elsewhere)
    stacked = curl_tpu.cryptensor(np.ones((2, 2))).mpc
    axes = _arg_axes({"a": stacked, "b": MPCTensor(t)})
    assert axes == {"a": 0, "b": None}
    assert _arg_axes({"a": stacked}) == 0


def test_compressed_model_forward_matches_plain():
    """Tiny Linear+GELU+Linear: seed-compressed compiled forward decodes to
    the plain forward within LUT envelope, and matches the same model
    encrypted the materialized way."""
    from curl_tpu import nn
    from curl_tpu.nn.plain import PlainTensor

    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 12))

    def build():
        from curl_tpu.nn.module import _init_counter

        curl_tpu.init(world_size=2, seed=9)
        _init_counter[0] = 0  # identical weights across builds
        m = nn.Sequential(nn.Linear(12, 16), nn.GELU(), nn.Linear(16, 4))
        return m

    m = build()
    plain = np.asarray(m(PlainTensor(x)).get_plain_text())

    m.encrypt(src=0, seed_compress=True)
    apply_fn, params = m.functional()
    # every param leaf is compressed: exactly 2 leaves per tensor, none
    # carrying a party axis
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.shape[:1] != (2,) or leaf.ndim == 1
    xe = curl_tpu.cryptensor(x)
    step = curl_tpu.compile_parties(apply_fn, world_size=2)
    out = step(jax.random.PRNGKey(2), params, xe.mpc)
    got = np.asarray(curl_tpu.CrypTensor(out).get_plain_text())
    assert np.abs(got - plain).max() < 0.05

    m2 = build()
    m2.encrypt(src=0)  # materialized path, same weights (same init keys)
    apply_fn2, params2 = m2.functional()
    step2 = curl_tpu.compile_parties(apply_fn2, world_size=2)
    out2 = step2(jax.random.PRNGKey(2), params2, curl_tpu.cryptensor(x).mpc)
    got2 = np.asarray(curl_tpu.CrypTensor(out2).get_plain_text())
    assert np.abs(got - got2).max() < 0.05


def test_compressed_gpt_scan_blocks():
    """Compressed params flow through scan_identical_blocks + scan_chunked
    (the GPT execution path): tiny full GPT forward decodes within the
    envelope of the plain forward."""
    from curl_tpu import models
    from curl_tpu.nn.plain import PlainTensor
    from curl_tpu import cfg

    with cfg.temp_override({"models.head_chunk_positions": 4}):
        curl_tpu.init(world_size=2, seed=77)
        m = models.GPT(embed_dim=16, num_heads=2, num_blocks=2,
                       vocab_size=50, seq_len=8, full=True)
        x = np.arange(8, dtype=np.float64).reshape(1, 8) % 50
        plain = np.asarray(m(PlainTensor(x)).get_plain_text())
        m.encrypt(src=0, seed_compress=True)
        apply_fn, params = m.functional()
        xe = curl_tpu.cryptensor(x, precision=0)
        step = curl_tpu.compile_parties(apply_fn, world_size=2)
        out = step(jax.random.PRNGKey(5), params, xe.mpc)
        got = np.asarray(curl_tpu.CrypTensor(out).get_plain_text())
    assert got.shape == plain.shape == (1, 8, 50)
    assert np.abs(got - plain).max() < 0.08
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=0.08)


def test_build_compressed_gpt_matches_plain():
    """Streaming construction (GPT.build_compressed): prestacked compressed
    blocks + vocab-chunked LM head decode within envelope of a plain
    forward of a REGULAR model with identical weights (same init-key
    stream), exercising the exact GPT-Neo execution path at tiny scale."""
    from curl_tpu import cfg, models
    from curl_tpu.nn.module import _init_counter
    from curl_tpu.nn.plain import PlainTensor

    geom = dict(embed_dim=16, num_heads=2, num_blocks=3,
                vocab_size=50, seq_len=8)
    x = np.arange(8, dtype=np.float64).reshape(1, 8) % 50

    curl_tpu.init(world_size=2, seed=21)
    _init_counter[0] = 0
    plain_model = models.GPT(**geom, full=True)
    plain = np.asarray(plain_model(PlainTensor(x)).get_plain_text())

    with cfg.temp_override({"models.head_chunk_positions": 4}):
        curl_tpu.init(world_size=2, seed=21)
        _init_counter[0] = 0
        m = models.GPT.build_compressed(**geom, head_vocab_chunks=4,
                                        chunk_block_linears=True)
        apply_fn, params = m.functional()
        # no leaf carries a party axis and block leaves are (num_blocks, ...)
        stacked = m.blocks._parameters["stacked"]
        for leaf in jax.tree_util.tree_leaves(stacked):
            assert leaf.shape[0] == geom["num_blocks"]
        xe = curl_tpu.cryptensor(x, precision=0)
        step = curl_tpu.compile_parties(apply_fn, world_size=2)
        out = step(jax.random.PRNGKey(5), params, xe.mpc)
        got = np.asarray(curl_tpu.CrypTensor(out).get_plain_text())

    assert got.shape == plain.shape == (1, 8, 50)
    assert np.abs(got - plain).max() < 0.08
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=0.08)


# ---------------------------------------------------------------------------
# boundary enforcement (VERDICT r3 item 7): the documented limits must RAISE
# ---------------------------------------------------------------------------

def test_backward_through_compressed_raises():
    """A compressed tensor with requires_grad entering the tape must raise
    a clear error, not produce silently wrong gradients."""
    from curl_tpu.mpc.mpc import MPCTensor

    t = SeedCompressedArithmetic.encrypt(np.ones((3, 3)), jax.random.PRNGKey(2))
    w = MPCTensor(t)
    w.requires_grad = True
    x = curl_tpu.cryptensor(np.ones((3, 3))).mpc
    with pytest.raises(RuntimeError, match="seed-compressed"):
        x.matmul(w)


def test_forward_with_frozen_compressed_weights_allows_input_grads():
    """requires_grad on the INPUT stays legal: grads flow to the input only
    (the inference-with-private-query pattern)."""
    from curl_tpu.mpc.mpc import MPCTensor

    t = SeedCompressedArithmetic.encrypt(
        np.eye(3), jax.random.PRNGKey(3)
    )
    w = MPCTensor(t)  # requires_grad defaults False
    x = curl_tpu.cryptensor(np.ones((2, 3))).mpc

    def run(xm, wm):
        # set inside the trace: pytree flatten/unflatten (vmap slicing)
        # does not carry the requires_grad attribute
        xm.requires_grad = True
        out = xm.matmul(wm)
        out.backward()
        return xm.grad.share

    step = curl_tpu.compile_parties(run, world_size=2, jit=False)
    g = step(jax.random.PRNGKey(9), x, w)
    # d(sum(x @ I))/dx = 1 everywhere
    dec = np.asarray(jnp.sum(g.astype(jnp.uint64), axis=0).view(jnp.int64))
    np.testing.assert_allclose(dec / (1 << 16), np.ones((2, 3)), atol=0.01)


def test_ws3_expansion_raises():
    """share expansion at world_size != 2 must raise, not decode garbage."""
    from conftest import reinit

    reinit(world_size=3, seed=6)
    try:
        t = SeedCompressedArithmetic.encrypt(np.ones((2, 2)), jax.random.PRNGKey(4))
        x = curl_tpu.cryptensor(np.ones((2, 2))).mpc

        def run(xm, wm):
            return (xm * wm).share

        step = curl_tpu.compile_parties(run, world_size=3, jit=False)
        from curl_tpu.mpc.mpc import MPCTensor

        with pytest.raises(RuntimeError, match="2PC-only"):
            step(jax.random.PRNGKey(8), x, MPCTensor(t))
    finally:
        reinit(world_size=2, seed=5)


def test_memory_footprint_regression():
    """The two memory levers hold at tiny scale:
    1. compressed params' resident bytes ~ half the SINGLE materialized
       share stack (u32 planes of share0 only; materialized 2PC is 2x u64);
    2. the vocab-chunked head's compiled temp usage shrinks as chunks grow
       (the OOM guard: live set capped at ~1/chunks)."""
    from curl_tpu import models

    def leaf_bytes(tree):
        return sum(
            getattr(l, "nbytes", 0) for l in jax.tree_util.tree_leaves(tree)
        )

    # temp_override, NOT cfg.set: a leaked head_chunk_positions=0 broke
    # test_max_cascade's chunking parity test in full-suite order
    with curl_tpu.cfg.temp_override({"models.head_chunk_positions": 0}):
        m_mat = models.GPT(embed_dim=16, num_heads=2, num_blocks=1,
                           vocab_size=64, seq_len=4, full=False)
        m_mat.encrypt(src=0)
        _, p_mat = m_mat.functional()

        m_cmp = models.GPT(embed_dim=16, num_heads=2, num_blocks=1,
                           vocab_size=64, seq_len=4, full=False)
        m_cmp.encrypt(src=0, seed_compress=True)
        _, p_cmp = m_cmp.functional()

    # materialized: (2, ...) u64 stacks = 16 B/param; compressed: u32 lo+hi
    # planes of share0 = 8 B/param (+ tiny keys)
    assert leaf_bytes(p_cmp) < 0.6 * leaf_bytes(p_mat), (
        leaf_bytes(p_cmp), leaf_bytes(p_mat))


def test_rbg_impl_pinned_roundtrip():
    """impl='rbg' (the round-4 TPU default_impl choice) expands through one
    RngBitGenerator op; encrypt-time r and trace-time expansion agree, so
    share0 + bits_for_impl(key) decodes to the plaintext — on any backend."""
    vals = np.linspace(-4, 4, 64).reshape(8, 8)
    key = jax.random.PRNGKey(13)
    t = SeedCompressedArithmetic.encrypt(vals, key, impl="rbg")
    assert t._impl == "rbg"
    r = bits_for_impl(key, t.share0.shape, "rbg")
    dec = np.asarray((t.share0 + r).view(jnp.int64)).astype(np.float64)
    np.testing.assert_allclose(
        dec / t.encoder.scale, vals, atol=1.0 / t.encoder.scale
    )
    # pinning: expansion uses the stored impl even if config changes later
    with curl_tpu.cfg.temp_override({"mpc.bulk_rng": "xla"}):
        r2 = bits_for_impl(t.key, t.share0.shape, t._impl)
    assert (np.asarray(r) == np.asarray(r2)).all()
    # and the rbg stream differs from the threefry stream (really one
    # RngBitGenerator draw, not a fallthrough)
    tf = bits_for_impl(key, t.share0.shape, "xla")
    assert (np.asarray(r) != np.asarray(tf)).any()


def test_default_impl_tracks_bulk_rng_dispatch(monkeypatch):
    """default_impl() mirrors random._bulk_rng_impl()'s auto semantics:
    rbg on the TPU backend (round-4 default), threefry on CPU, explicit
    settings win. Backend is monkeypatched so the TPU branch is locked in
    from the CPU suite."""
    from curl_tpu.mpc.primitives import compressed

    assert compressed.default_impl() == "xla"  # CPU + auto
    with curl_tpu.cfg.temp_override({"mpc.bulk_rng": "rbg"}):
        assert compressed.default_impl() == "rbg"
    monkeypatch.setattr(
        compressed.jax, "default_backend", lambda: "tpu"
    )
    assert compressed.default_impl() == "rbg"  # TPU + auto
    with curl_tpu.cfg.temp_override({"mpc.bulk_rng": "pallas_tpu"}):
        assert compressed.default_impl() == "pallas_tpu"
