"""Fused hardware-PRNG PRZS / dealer-sharing kernel (cfg.mpc.przs_kernel).

Share CONSTRUCTION is the measured hot spot of the big Beaver stages: at
the GPT-2 weight shape (768, 50257) one PRZS sharing under the 2-lane
party vmap costs 16.5 ms with RngBitGenerator draws (24 ms with the rank-0
plaintext add), while the raw per-stream generation floor is ~1-3 ms
(benchmarks/results/przs_variants.json, scripts/probe_przs_variants.py).
The cost is HBM: prev-stream and next-stream each materialize, then the
subtract and the per-lane select/add materialize again. This kernel
generates BOTH ring streams per party tile-by-tile in VMEM from the TPU's
hardware PRNG, subtracts with borrow in u32 pairs, optionally adds the
rank-0 plaintext, and writes ONLY the resulting share planes:

    przs:   out_p = PRG(seed_prev_p) - PRG(seed_next_p)
    share:  out_p = przs_p + (rank0_p) * plain        (tfp_provider sharing)

Correlation soundness is inherited from the seed structure, exactly like
ops/pallas_rng.py: party p's next seed IS party p+1's prev seed (the ring
invariant of random.make_party_keys / the reference's seed ring exchange,
curl/__init__.py:225-267), and identical seed words give identical
hardware-PRNG streams on every party's core. Telescoping then holds by
construction: sum_p (PRG(s_{p-1}) - PRG(s_p)) = 0 mod 2^64. The per-tile
reseed mixing (Weyl multipliers on the tile index) matches
pallas_rng._get_batched_draw with the SAME tile geometry, so the kernel's
streams are bit-identical to pallas_random_bits_u64(seed) of each ring
stream — which is what the on-device validation checks
(scripts/validate_przs_kernel.py).

vmap-soundness: per-lane (prev, next) seed words are batched through a
custom_vmap rule that maps the party axis onto the kernel grid (one
reseed pair per lane per tile); XLA's own batching cannot thread per-lane
PRNG state, which is why the rule is explicit (same design as
pallas_rng/_rbg_fn). Under shard_map each party calls the unbatched form
with its own two seeds. CPU has no kernel: config "auto" only engages on
the TPU backend, and the composable path remains the reference semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import u64pair as up

# Tile geometry MUST match pallas_rng._get_batched_draw (_TILE_ROWS=512,
# hi plane drawn before lo per reseed) so streams are bit-identical to
# pallas_random_bits_u64 per ring stream — the validation hook.
_TILE_ROWS = 512
_M0 = np.int32(-1640531527)   # 0x9E3779B9
_M1 = np.int32(-2048144789)   # 0x85EBCA6B

_KERNEL_CACHE = {}


def _round_up(x, m):
    return (x + m - 1) // m * m


def _build(rows: int, mode: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile_rows = min(rows, _TILE_ROWS)
    tiles = (rows + tile_rows - 1) // tile_rows
    assert tiles * tile_rows == rows

    def impl(seeds, flags, *plain_planes):
        """seeds (P, 2, 2) i32, flags (P,) i32; in the share modes plain
        lo/hi planes — (rows, 128) party-invariant for "share",
        (P, rows, 128) per-lane for "share_lane" -> lo, hi (P, rows, 128)
        u32."""
        P = seeds.shape[0]

        def kernel(seed_ref, flag_ref, *refs):
            if mode in ("share", "share_lane"):
                pl_lo, pl_hi = refs[0], refs[1]
                out_lo, out_hi = refs[2], refs[3]
            else:
                out_lo, out_hi = refs
            p = pl.program_id(0)
            t = pl.program_id(1)

            def draw(w0, w1):
                # reseed exactly like pallas_rng: tile index Weyl-mixed
                # into both words; hi plane first, then lo
                pltpu.prng_seed(w0 ^ (t * _M0), w1 ^ ((t + 1) * _M1))
                hi = pltpu.prng_random_bits((tile_rows, 128)).astype(
                    jnp.uint32
                )
                lo = pltpu.prng_random_bits((tile_rows, 128)).astype(
                    jnp.uint32
                )
                return lo, hi

            prev = draw(seed_ref[p, 0, 0], seed_ref[p, 0, 1])
            nxt = draw(seed_ref[p, 1, 0], seed_ref[p, 1, 1])
            lo, hi = up.sub(prev, nxt)
            if mode in ("share", "share_lane"):
                is0 = (flag_ref[p] != 0).astype(jnp.uint32)
                m = up.U32(0) - is0  # 0 or 0xFFFFFFFF, broadcasts
                lo, hi = up.add((lo, hi), (pl_lo[0] & m, pl_hi[0] & m))
            out_lo[0] = lo
            out_hi[0] = hi

        shared_spec = pl.BlockSpec(
            (1, tile_rows, 128), lambda p, t: (0, t, 0),
            memory_space=pltpu.VMEM,
        )
        lane_spec = pl.BlockSpec(
            (1, tile_rows, 128), lambda p, t: (p, t, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        ins = [seeds, flags]
        if mode == "share":
            in_specs += [shared_spec, shared_spec]
            ins += [q.reshape(1, rows, 128) for q in plain_planes]
        elif mode == "share_lane":
            in_specs += [lane_spec, lane_spec]
            ins += [q.reshape(P, rows, 128) for q in plain_planes]
        with jax.enable_x64(False):
            lo, hi = pl.pallas_call(
                kernel,
                grid=(P, tiles),
                out_shape=(
                    jax.ShapeDtypeStruct((P, rows, 128), jnp.uint32),
                    jax.ShapeDtypeStruct((P, rows, 128), jnp.uint32),
                ),
                in_specs=in_specs,
                out_specs=(lane_spec, lane_spec),
            )(*ins)
        return lo, hi

    return impl


def _combine(lo, hi, rows):
    flat = (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)
    return flat.reshape(flat.shape[0], rows * 128)


def _get_przs(rows: int):
    key = (rows, "przs")
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    impl = _build(rows, "przs")

    @jax.custom_batching.custom_vmap
    def fused(seed_pair):
        # unbatched (shard_map / host): one party's share
        lo, hi = impl(
            seed_pair.reshape(1, 2, 2), jnp.zeros((1,), jnp.int32)
        )
        return _combine(lo, hi, rows)[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, seed_pair):  # noqa: ANN001
        (sb,) = in_batched
        assert sb, "per-lane PRZS seeds must be batched"
        lo, hi = impl(seed_pair, jnp.zeros((axis_size,), jnp.int32))
        return _combine(lo, hi, rows), True

    _KERNEL_CACHE[key] = fused
    return fused


def _get_share(rows: int):
    key = (rows, "share")
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    impl_shared = _build(rows, "share")
    impl_lane = _build(rows, "share_lane")

    @jax.custom_batching.custom_vmap
    def fused(seed_pair, flag, pl_lo, pl_hi):
        lo, hi = impl_shared(
            seed_pair.reshape(1, 2, 2), flag.reshape(1), pl_lo, pl_hi
        )
        return _combine(lo, hi, rows)[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, seed_pair, flag, pl_lo, pl_hi):  # noqa: ANN001
        sb, fb, pb_lo, pb_hi = in_batched
        assert sb and fb, "per-lane seeds/flags must be batched"
        if pb_lo or pb_hi:
            # per-lane plaintext (e.g. a value derived from a revealed
            # quantity, batched through the party vmap): each lane adds
            # ITS plain under its own rank flag — identical semantics to
            # the composable `share + (rank==src) * plain`
            assert pb_lo and pb_hi
            lo, hi = impl_lane(seed_pair, flag, pl_lo, pl_hi)
        else:
            # party-invariant plaintext (TFP dealer stream): read once
            lo, hi = impl_shared(seed_pair, flag, pl_lo, pl_hi)
        return _combine(lo, hi, rows), True

    _KERNEL_CACHE[key] = fused
    return fused


# ---------------------------------------------------------------------------
# Native 2-D-tiled variant: the flat kernel's (rows*128,) output must be
# sliced + reshaped to the target shape, which relayouts (~20 ms at the
# (768, 50257) weight shape — the przs_kernel_ab.json finding that made the
# flat kernel a net loss). This variant tiles the TRUE trailing-2D shape
# (leading dims collapsed into rows), so consumers read the output at its
# native layout and the combine fuses downstream.
# ---------------------------------------------------------------------------

_TILE_R2 = 256
_TILE_C2 = 512


def _build2d(R: int, C: int, mode: str):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tr = min(_TILE_R2, _round_up(R, 8))
    tc = min(_TILE_C2, _round_up(C, 128))
    gi = (R + tr - 1) // tr
    gj = (C + tc - 1) // tc

    def impl(seeds, flags, *plain_planes):
        P = seeds.shape[0]

        def kernel(seed_ref, flag_ref, *refs):
            if mode in ("share", "share_lane"):
                pl_lo, pl_hi = refs[0], refs[1]
                out_lo, out_hi = refs[2], refs[3]
            else:
                out_lo, out_hi = refs
            p = pl.program_id(0)
            t = pl.program_id(1) * gj + pl.program_id(2)  # flat tile index

            def draw(w0, w1):
                pltpu.prng_seed(w0 ^ (t * _M0), w1 ^ ((t + 1) * _M1))
                hi = pltpu.prng_random_bits((tr, tc)).astype(jnp.uint32)
                lo = pltpu.prng_random_bits((tr, tc)).astype(jnp.uint32)
                return lo, hi

            prev = draw(seed_ref[p, 0, 0], seed_ref[p, 0, 1])
            nxt = draw(seed_ref[p, 1, 0], seed_ref[p, 1, 1])
            lo, hi = up.sub(prev, nxt)
            if mode in ("share", "share_lane"):
                is0 = (flag_ref[p] != 0).astype(jnp.uint32)
                m = up.U32(0) - is0
                lo, hi = up.add((lo, hi), (pl_lo[0] & m, pl_hi[0] & m))
            out_lo[0] = lo
            out_hi[0] = hi

        shared_spec = pl.BlockSpec(
            (1, tr, tc), lambda p, i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        )
        lane_spec = pl.BlockSpec(
            (1, tr, tc), lambda p, i, j: (p, i, j),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        ins = [seeds, flags]
        if mode == "share":
            in_specs += [shared_spec, shared_spec]
            ins += [q.reshape(1, R, C) for q in plain_planes]
        elif mode == "share_lane":
            in_specs += [lane_spec, lane_spec]
            ins += [q.reshape(P, R, C) for q in plain_planes]
        with jax.enable_x64(False):
            lo, hi = pl.pallas_call(
                kernel,
                grid=(P, gi, gj),
                out_shape=(
                    jax.ShapeDtypeStruct((P, R, C), jnp.uint32),
                    jax.ShapeDtypeStruct((P, R, C), jnp.uint32),
                ),
                in_specs=in_specs,
                out_specs=(lane_spec, lane_spec),
            )(*ins)
        return lo, hi

    return impl


def _combine2d(lo, hi):
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def _get_przs2d(R: int, C: int):
    key = (R, C, "przs2d")
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    impl = _build2d(R, C, "przs")

    @jax.custom_batching.custom_vmap
    def fused(seed_pair):
        lo, hi = impl(
            seed_pair.reshape(1, 2, 2), jnp.zeros((1,), jnp.int32)
        )
        return _combine2d(lo, hi)[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, seed_pair):  # noqa: ANN001
        (sb,) = in_batched
        assert sb, "per-lane PRZS seeds must be batched"
        lo, hi = impl(seed_pair, jnp.zeros((axis_size,), jnp.int32))
        return _combine2d(lo, hi), True

    _KERNEL_CACHE[key] = fused
    return fused


def _get_share2d(R: int, C: int):
    key = (R, C, "share2d")
    if key in _KERNEL_CACHE:
        return _KERNEL_CACHE[key]
    impl_shared = _build2d(R, C, "share")
    impl_lane = _build2d(R, C, "share_lane")

    @jax.custom_batching.custom_vmap
    def fused(seed_pair, flag, pl_lo, pl_hi):
        lo, hi = impl_shared(
            seed_pair.reshape(1, 2, 2), flag.reshape(1), pl_lo, pl_hi
        )
        return _combine2d(lo, hi)[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, seed_pair, flag, pl_lo, pl_hi):  # noqa: ANN001
        sb, fb, pb_lo, pb_hi = in_batched
        assert sb and fb, "per-lane seeds/flags must be batched"
        if pb_lo or pb_hi:
            assert pb_lo and pb_hi
            lo, hi = impl_lane(seed_pair, flag, pl_lo, pl_hi)
        else:
            lo, hi = impl_shared(seed_pair, flag, pl_lo, pl_hi)
        return _combine2d(lo, hi), True

    _KERNEL_CACHE[key] = fused
    return fused


def _as_2d(shape):
    """Collapse an ND shape to (R, C) rows x trailing dim, or None for
    sub-2D shapes (those keep the flat kernel)."""
    if len(shape) < 2:
        return None
    C = shape[-1]
    R = 1
    for d in shape[:-1]:
        R *= d
    return R, C


def _seed_words(key):
    """(2,) i32 kernel seed words from a typed PRNG key (one scalar
    threefry evaluation — same derivation as pallas_rng.seed_from_key)."""
    return jax.random.bits(key, (2,), dtype=jnp.uint32).astype(jnp.int32)


def seed_pair_from_keys(key_prev, key_next):
    """(2, 2) i32 [prev words, next words]."""
    return jnp.stack([_seed_words(key_prev), _seed_words(key_next)])


def _rows_for(n: int) -> int:
    rows_raw = max((n + 127) // 128, 1)
    tile = min(_TILE_ROWS, 8 * ((rows_raw + 7) // 8))
    return _round_up(rows_raw, tile)


def _plain_planes(value, rows):
    n = int(np.prod(value.shape)) if value.shape else 1
    total = rows * 128
    flat = value.reshape(n)
    if total - n:
        flat = jnp.pad(flat, ((0, total - n),))
    lo = (flat & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (flat >> jnp.uint64(32)).astype(jnp.uint32)
    return lo.reshape(rows, 128), hi.reshape(rows, 128)


def _require_tpu():
    if jax.default_backend() != "tpu":
        raise NotImplementedError(
            "pallas PRZS kernel requires a TPU backend (pltpu.prng_seed "
            "has no CPU interpret rule in this JAX version)"
        )


def pallas_przs_u64(seed_pair, shape):
    """One party's PRZS zero-share of ``shape`` from its (2, 2) i32
    [prev, next] seed words. Per-lane under the party vmap.

    ND shapes route to the native-2-D-tiled kernel (leading dims collapsed
    into rows) so the output needs no relayout; sub-2D shapes use the flat
    (rows, 128) kernel."""
    _require_tpu()
    rc = _as_2d(shape)
    if rc is not None:
        R, C = rc
        out = _get_przs2d(R, C)(seed_pair)
        return out.reshape(shape)
    n = int(np.prod(shape)) if shape else 1
    rows = _rows_for(n)
    flat = _get_przs(rows)(seed_pair)
    return flat[:n].reshape(shape)


def _plain_planes_2d(value, R, C):
    v = value.reshape(R, C)
    lo = (v & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (v >> jnp.uint64(32)).astype(jnp.uint32)
    return lo, hi


def pallas_share_u64(seed_pair, rank0, plain, shape):
    """One party's dealer sharing of ``plain``: PRZS + rank0 * plain.

    rank0: this party's rank-0 indicator (integer scalar, per-lane under
    vmap). plain: the dealer's u64 plaintext — party-invariant under vmap
    (TFP dealer semantics: one shared draw, only rank 0's copy enters the
    share sum) or per-lane (values derived from revealed quantities).
    ND shapes use the native-2-D-tiled kernel."""
    _require_tpu()
    rc = _as_2d(shape)
    if rc is not None:
        R, C = rc
        pl_lo, pl_hi = _plain_planes_2d(plain, R, C)
        out = _get_share2d(R, C)(
            seed_pair, rank0.astype(jnp.int32), pl_lo, pl_hi
        )
        return out.reshape(shape)
    n = int(np.prod(shape)) if shape else 1
    rows = _rows_for(n)
    pl_lo, pl_hi = _plain_planes(plain, rows)
    flat = _get_share(rows)(
        seed_pair, rank0.astype(jnp.int32), pl_lo, pl_hi
    )
    return flat[:n].reshape(shape)
