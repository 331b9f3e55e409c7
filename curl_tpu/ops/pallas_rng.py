"""Hardware-PRNG mask generation (cfg.mpc.bulk_rng = "pallas_tpu").

Each MPC protocol round draws fresh uniform ring elements; with threefry
every draw unrolls to ~200 HLO ops, which dominates XLA compile time (and
remote-compiler memory) for deep protocols. This kernel generates a uint64
tensor from the TPU's per-core PRNG (pltpu.prng_random_bits) in ONE op per
draw site: seed with 64 bits derived from the (key, trace-counter) pair,
emit two uint32 planes, and combine to uint64 outside the kernel (Mosaic
has no uint64).

vmap-soundness: simulated parties run as vmap lanes of one program, so a
batched draw MUST give each lane the stream of ITS seed (XLA's
RngBitGenerator fails exactly this, which is why it was rejected in
round 1). Pallas's automatic batching rule cannot block a (B, 2) SMEM
operand, so batching is implemented explicitly: a custom_vmap rule maps
the party axis onto the kernel grid, with one re-seed per grid step.
Validated on-device by scripts/validate_pallas_rng.py.

Correlation-correctness requirement: identical seeds must give identical
streams on every party's chip (same libtpu + same hardware generation).
That holds within one deployment; cross-fleet it must be validated before
enabling (hence opt-in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up(x, m):
    return (x + m - 1) // m * m


# one custom_vmap-wrapped draw function per row count (shape-specialized)
_DRAW_CACHE = {}

# rows per grid tile: 2 planes x 512x128 u32 = 512 KB of VMEM per step,
# far under the ~16 MB budget while big enough to amortize the reseed
_TILE_ROWS = 512


def _get_batched_draw(rows: int):
    """(B, 2) int32 seed words -> (B, rows*128) uint64.

    Grid = (B parties/lanes, T row-tiles). Each tile reseeds with
    (s0, s1, t) so its stream is a pure function of the seed words and the
    tile index — independent of grid iteration order, and VMEM usage is
    bounded by the tile, not the draw size (weight-sized Beaver masks are
    hundreds of MB)."""
    if rows in _DRAW_CACHE:
        return _DRAW_CACHE[rows]

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile_rows = min(rows, _TILE_ROWS)
    tiles = (rows + tile_rows - 1) // tile_rows
    padded_rows = tiles * tile_rows

    def impl(seeds):
        b_total = seeds.shape[0]

        def kernel(seed_ref, hi_ref, lo_ref):
            b = pl.program_id(0)
            t = pl.program_id(1)
            # Mosaic caps prng_seed at 2 words, so the tile index is mixed
            # into both words with distinct odd multipliers (Weyl-style);
            # i32 products wrap, which is exactly the intended mixing.
            m0 = jnp.int32(-1640531527)  # 0x9E3779B9
            m1 = jnp.int32(-2048144789)  # 0x85EBCA6B
            pltpu.prng_seed(
                seed_ref[b, 0] ^ (t * m0), seed_ref[b, 1] ^ ((t + 1) * m1)
            )
            hi_ref[0] = pltpu.prng_random_bits((tile_rows, 128))
            lo_ref[0] = pltpu.prng_random_bits((tile_rows, 128))

        # Mosaic cannot legalize the i64 block-index maps that
        # jax_enable_x64 (required globally for uint64 shares) produces —
        # trace just the kernel call with x64 off (everything here is
        # i32/u32; the u64 combine happens outside the context).
        with jax.enable_x64(False):
            hi, lo = pl.pallas_call(
                kernel,
                grid=(b_total, tiles),
                out_shape=(
                    jax.ShapeDtypeStruct((b_total, padded_rows, 128), jnp.uint32),
                    jax.ShapeDtypeStruct((b_total, padded_rows, 128), jnp.uint32),
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
                out_specs=(
                    pl.BlockSpec((1, tile_rows, 128), lambda b, t: (b, t, 0)),
                    pl.BlockSpec((1, tile_rows, 128), lambda b, t: (b, t, 0)),
                ),
            )(seeds)
        flat = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
        return flat.reshape(b_total, padded_rows * 128)[:, : rows * 128]

    @jax.custom_batching.custom_vmap
    def draw(seeds):
        return impl(seeds)

    @draw.def_vmap
    def _rule(axis_size, in_batched, seeds):  # noqa: ANN001
        (seeds_batched,) = in_batched
        if not seeds_batched:
            # same seeds on every lane -> same (shared) stream
            return draw(seeds), False
        lead = seeds.shape[0]
        out = draw(seeds.reshape(-1, 2))
        return out.reshape(lead, -1, rows * 128), True

    _DRAW_CACHE[rows] = draw
    return draw


def pallas_random_bits_u64(seed_words, shape):
    """uint64 uniform bits of `shape` from a (2,) int32 seed-word vector.

    Both words are fed to ``pltpu.prng_seed`` (which folds all operands into
    the hardware PRNG state), giving a 64-bit effective seed space — a
    scalar u32 seed would birthday-collide across the ~10^4 draws of a deep
    protocol trace.
    """
    import numpy as np

    if jax.default_backend() != "tpu":
        raise NotImplementedError(
            "pallas_random_bits_u64 requires a TPU backend (pltpu.prng_seed "
            "has no CPU interpret rule in this JAX version)"
        )

    n = int(np.prod(shape)) if shape else 1
    rows = _round_up(max((n + 127) // 128, 1), 8)
    draw = _get_batched_draw(rows)
    flat = draw(seed_words.astype(jnp.int32).reshape(1, 2))[0]
    return flat[:n].reshape(shape)


def seed_from_key(key):
    """Derive the (2,) int32 kernel seed words from a (typed) PRNG key.

    One scalar threefry evaluation — cheap; the bulk generation happens in
    the kernel."""
    return jax.random.bits(key, (2,), dtype=jnp.uint32).astype(jnp.int32)
