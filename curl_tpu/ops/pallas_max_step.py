"""Fused 2PC max-step: compare + bit-convert + select in ONE TPU kernel.

The scan_reduction max tournament's step —

    keep = carry.ge(rolled)                      # packed-32 SPK circuit
    new  = rolled + keep * (carry - rolled)      # Beaver select

— is the vocab-softmax bottleneck of LLM private inference. Unfused, each
step materializes ~40 intermediate HBM arrays (re-shares, 6 rounds of
masked reveals, triple streams, B2A, select reveals) plus their PRNG
draws. This kernel executes the SAME protocol math (identical messages,
identical randomness structure; reference round layout
curl/mpc/primitives/beaver.py:336-355, circuit.py:27-130) for both
simulated parties inside VMEM, drawing all protocol randomness from the
hardware PRNG, and writes only the new carry shares back.

Scope/soundness: a SIMULATION-runtime fastpath (cfg.mpc.fused_max_step),
exactly like the one-program vmap fusion itself — the per-party message
values and randomness distribution match the composable path, and trace-
time round/byte accounting is registered explicitly (register_stats). The
shard_map real-multi-host runtime keeps the composable circuit path.

Layout notes: elements pair (i, i + n/2) into one packed 32-bit-ring word
(halves stay block-contiguous — no interleave ops on TPU); all uint64
arithmetic runs as (lo, hi) uint32 pairs (ops/u64pair.py — Mosaic has no
64-bit ints). The protocol math takes an injectable randomness source so
the exact traced code is unit-tested on CPU against the unfused protocol
(tests/test_fused_max.py); only the PRNG wrapper is TPU-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import u64pair as up

# packed-32 SPK constants (identical to mpc/primitives/circuit.py, width 32:
# levels 0..4; no level-i arrow crosses an aligned 2^(i+1) block boundary)
_LEVELS = 5


def _level_constants():
    masks, mults, out_masks = [], [], []
    for i in range(_LEVELS):
        step = 1 << (i + 1)
        m = 0
        for start in range((1 << i) - 1, 64, step):
            m |= 1 << start
        mult = ((1 << ((1 << i) + 1)) - 2) % (1 << 64)
        masks.append(m)
        mults.append(mult)
        out_masks.append((m * mult) % (1 << 64))
    return masks, mults, out_masks


_MASKS, _MULTS, _OUT_MASKS = _level_constants()
_BOUNDARY_CLEAR = ((1 << 64) - 1) ^ (1 << 32)


def _mul_const_pow2m2(x, k):
    """x * ((1 << k) - 2)  ==  (x << k) - (x << 1)   mod 2^64."""
    return up.sub(up.shl(x, k), up.shl(x, 1))


def _beaver_and(u0, u1, v0, v1, rbits):
    """One Beaver binary AND on XOR shares; returns z0, z1 with
    z0 ^ z1 = (u0^u1) & (v0^v1). rbits() -> fresh uniform u32-pair."""
    a0, a1, b0, b1, c0 = rbits(), rbits(), rbits(), rbits(), rbits()
    a = up.xor(a0, a1)
    b = up.xor(b0, b1)
    c1 = up.xor(up.and_(a, b), c0)
    eps = up.xor(up.xor(u0, a0), up.xor(u1, a1))
    delta = up.xor(up.xor(v0, b0), up.xor(v1, b1))
    # z = c ^ (eps & b) ^ (u & delta): u = a ^ eps folds the public
    # eps & delta term in — one AND-plane fewer per party
    z0 = up.xor(up.xor(c0, up.and_(b0, eps)), up.and_(u0, delta))
    z1 = up.xor(up.xor(c1, up.and_(b1, eps)), up.and_(u1, delta))
    return z0, z1


def _sign_bits_math(d0, d1, rbits):
    """XOR shares of the packed-32 sign bits of d = d0 + d1.

    d0/d1: per-party additive shares as (lo, hi) u32-pair HALF-planes
    shaped (2, m) — row h holds elements [h*m, (h+1)*m). Word k of the
    comparison packs elements k (low lane) and k+m (high lane) of the
    difference reduced mod 2^32 (share reduction to the subring = dropping
    the high plane). Returns (lz0, lz1): 0/1 uint32 half-planes (2, m),
    XOR-shared ltz bit per element.
    """
    w0p = pack_words(d0[0])
    w1p = pack_words(d1[0])

    # ---- A2B: XOR re-share each party's packed word -----------------------
    x0 = rbits()
    x1 = up.xor(x0, w0p)
    y1 = rbits()
    y0 = up.xor(y1, w1p)

    # ---- packed 32-bit adder: S = X & Y, P = X ^ Y ------------------------
    s0, s1 = _beaver_and(x0, x1, y0, y1, rbits)
    p_orig0 = up.xor(x0, y0)
    p_orig1 = up.xor(x1, y1)
    p0, p1 = p_orig0, p_orig1

    for i in range(_LEVELS):
        out_mask = _OUT_MASKS[i]
        in_mask = _MASKS[i]
        k = (1 << i) + 1
        pm0 = up.and_const(p0, out_mask)
        pm1 = up.and_const(p1, out_mask)
        sf0 = _mul_const_pow2m2(up.and_const(s0, in_mask), k)
        sf1 = _mul_const_pow2m2(up.and_const(s1, in_mask), k)
        pf0 = _mul_const_pow2m2(up.and_const(p0, in_mask), k)
        pf1 = _mul_const_pow2m2(up.and_const(p1, in_mask), k)
        us0, us1 = _beaver_and(pm0, pm1, sf0, sf1, rbits)
        up0, up1 = _beaver_and(pm0, pm1, pf0, pf1, rbits)
        s0 = up.xor(s0, us0)
        s1 = up.xor(s1, us1)
        not_out = ((1 << 64) - 1) ^ out_mask
        p0 = up.xor(up.and_const(p0, not_out), up0)
        p1 = up.xor(up.and_const(p1, not_out), up1)

    carry_sh0 = up.and_const(up.shl(s0, 1), _BOUNDARY_CLEAR)
    carry_sh1 = up.and_const(up.shl(s1, 1), _BOUNDARY_CLEAR)
    sum0 = up.xor(p_orig0, carry_sh0)
    sum1 = up.xor(p_orig1, carry_sh1)

    # ---- sign bits: lane 31 -> element k (half 0), lane 63 -> k+m (half 1)
    lz0 = jnp.stack([(sum0[0] >> up.U32(31)) & up.U32(1),
                     (sum0[1] >> up.U32(31)) & up.U32(1)])
    lz1 = jnp.stack([(sum1[0] >> up.U32(31)) & up.U32(1),
                     (sum1[1] >> up.U32(31)) & up.U32(1)])
    return lz0, lz1


def _b2a_bit_math(bit0, bit1, rbits, rbit):
    """B2A an XOR-shared bit: multiplication-free ((1 - 2t) is +/-1).

    bit0/bit1: 0/1 uint32 half-planes (2, m). Returns per-party arithmetic
    shares as (lo, hi) u64-pair half-planes.
    """
    rb = rbit()
    rb0 = rbit()
    rb1 = rb ^ rb0
    ra0 = _half_rbits(rbits)
    rb64 = (rb, jnp.zeros_like(rb))
    ra1 = up.sub(rb64, ra0)
    t = bit0 ^ bit1 ^ rb0 ^ rb1  # public 0/1
    one = (jnp.ones_like(rb), jnp.zeros_like(rb))
    a0 = up.select_bit(t, up.sub(one, ra0), ra0)
    a1 = up.select_bit(t, up.neg(ra1), ra1)
    return a0, a1


def ltz_bit_math(d0, d1, rbits, rbit):
    """Arithmetic shares of ltz(d) from additive shares of d (packed-32
    compare + B2A — the circuit.py / converters.py round structure fused
    over u32-pair planes). Returns per-party (lo, hi) u64-pair half-planes
    holding 0/1 ring values."""
    lz0, lz1 = _sign_bits_math(d0, d1, rbits)
    return _b2a_bit_math(lz0, lz1, rbits, rbit)


def max_step_math(c0, c1, r0, r1, rbits, rbit):
    """The fused tournament step on u32-pair planes.

    c/r: carry/rolled additive shares per party, each a (lo, hi) pair of
    HALF-planes shaped (2, m).
    rbits(): fresh uniform (lo, hi) u32-pair of word shape (m,).
    rbit(): fresh uniform 0/1 uint32 plane of half-plane shape (2, m).

    Returns new carry shares (lo, hi) pairs shaped (2, m) per party.
    """
    d0 = up.sub(c0, r0)
    d1 = up.sub(c1, r1)
    lz0, lz1 = _sign_bits_math(d0, d1, rbits)
    # ge = NOT ltz (flip on party 0's share)
    g0 = lz0 ^ up.U32(1)
    g1 = lz1
    ga0, ga1 = _b2a_bit_math(g0, g1, rbits, rbit)

    # ---- Beaver select: new = rolled + ge * (carry - rolled) --------------
    a20, a21 = _half_rbits(rbits), _half_rbits(rbits)
    b20, b21 = _half_rbits(rbits), _half_rbits(rbits)
    c20 = _half_rbits(rbits)
    ab = up.mul(up.add(a20, a21), up.add(b20, b21))
    c21 = up.sub(ab, c20)
    eps = up.add(up.sub(ga0, a20), up.sub(ga1, a21))
    delta = up.add(up.sub(d0, b20), up.sub(d1, b21))
    # prod = c + eps*b + ga*delta (ga = a + eps): one mul fewer per party
    prod0 = up.add(up.add(c20, up.mul(eps, b20)), up.mul(delta, ga0))
    prod1 = up.add(up.add(c21, up.mul(eps, b21)), up.mul(delta, ga1))
    n0 = up.add(r0, prod0)
    n1 = up.add(r1, prod1)
    return n0, n1


def _half_rbits(rbits):
    """Two word-shaped draws stacked into one half-plane-shaped pair."""
    w1, w2 = rbits(), rbits()
    return (jnp.stack([w1[0], w2[0]]), jnp.stack([w1[1], w2[1]]))


def pack_words(d_lo_halves):
    """(2, m) u32 low-32-bit planes -> (lo, hi) packed word pair (m,):
    half 0 -> low lane, half 1 -> high lane (mod-2^32 share reduction is
    just dropping the high plane)."""
    return d_lo_halves[0], d_lo_halves[1]


# ---------------------------------------------------------------------------
# TPU kernel wrapper
# ---------------------------------------------------------------------------

_TILE_ROWS = 128  # word rows per grid step: (128,128) u32 = 64 KB/plane.
# 256 rows overflows the 16 MB scoped-VMEM budget on v5e by ~2% once the
# protocol's ~60 live temporaries are accounted (measured: 16.34M > 16M).


def _kernel_call(cl0, ch0, cl1, ch1, rl0, rh0, rl1, rh1, seeds):
    """Half-planes (2, R, 128) u32; words tile as (TR, 128). Returns the
    four new-share planes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = cl0.shape[1]
    tr = min(_TILE_ROWS, rows)
    assert rows % tr == 0
    grid = rows // tr

    def kernel(seed_ref, *refs):
        (cl0r, ch0r, cl1r, ch1r, rl0r, rh0r, rl1r, rh1r,
         ol0r, oh0r, ol1r, oh1r) = refs
        t = pl.program_id(0)
        m0 = np.int32(-1640531527)
        m1 = np.int32(-2048144789)
        pltpu.prng_seed(seed_ref[0] ^ (t * m0), seed_ref[1] ^ ((t + 1) * m1))

        def rbits():
            # prng_random_bits returns int32; the u64-pair math needs uint32
            # (signed carry comparisons in up.add/up.sub corrupt the adder).
            # int32->uint32 astype is bit-preserving (mod-2^32 conversion).
            lo = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32)
            hi = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32)
            return lo, hi

        def rbit():
            a = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32) & np.uint32(1)
            b = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32) & np.uint32(1)
            return jnp.stack([a, b])

        c0 = (cl0r[...], ch0r[...])
        c1 = (cl1r[...], ch1r[...])
        r0 = (rl0r[...], rh0r[...])
        r1 = (rl1r[...], rh1r[...])
        n0, n1 = max_step_math(c0, c1, r0, r1, rbits, rbit)
        ol0r[...], oh0r[...] = n0
        ol1r[...], oh1r[...] = n1

    spec = pl.BlockSpec((2, tr, 128), lambda t: (0, t, 0))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((2, rows, 128), jnp.uint32)
                for _ in range(4)
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 8,
            out_specs=(spec,) * 4,
        )(seeds, cl0, ch0, cl1, ch1, rl0, rh0, rl1, rh1)
    return outs


# one custom_vmap function per flattened element count (shape-specialized)
_FUSED_CACHE = {}


def _get_fused(n):
    if n in _FUSED_CACHE:
        return _FUSED_CACHE[n]

    @jax.custom_batching.custom_vmap
    def fused(c_share, r_share, seed):
        # unbatched = world_size 1 degenerate case: shares ARE the values
        d = jax.lax.bitcast_convert_type(c_share - r_share, jnp.int64)
        return jnp.where(d >= 0, c_share, r_share)

    @fused.def_vmap
    def _rule(axis_size, in_batched, c_share, r_share, seed):  # noqa: ANN001
        assert axis_size == 2, (
            "fused_max_step supports exactly 2 simulated parties"
        )
        seed_comb = (seed[0] ^ seed[1]) if in_batched[2] else seed
        out = fused_max_step_shares(c_share, r_share, seed_comb)
        return out, True

    _FUSED_CACHE[n] = fused
    return fused


def fused_max_step_mpc(carry, rolled):
    """MPCTensor-level fused tournament step (called inside the per-party
    vmap trace): new = rolled + (carry >= rolled) * (carry - rolled).

    Registers the composable path's exact round/byte profile with the
    trace-time comm stats (the kernel exchanges the same messages
    internally): 7 all_xor reveals (S AND + 5 packed prefix levels + B2A)
    and 1 all_sum (batched select reveal).
    """
    from .. import comm
    from .. import random as crng
    from ..mpc.mpc import MPCTensor
    from ..mpc.primitives.arithmetic import ArithmeticSharedTensor
    from .pallas_rng import seed_from_key

    c_share = carry.share
    r_share = jnp.broadcast_to(rolled.share, c_share.shape)
    shape = c_share.shape
    n = int(np.prod(shape)) if shape else 1
    nw = (n + 1) // 2

    seed = seed_from_key(crng.current_keys()["local"])
    out = _get_fused(n)(c_share.reshape(n), r_share.reshape(n), seed)

    comm.register_virtual("all_xor", 2 * nw * 8, rounds=1)        # S AND
    comm.register_virtual("all_xor", 5 * 4 * nw * 8, rounds=5)    # prefix
    comm.register_virtual("all_xor", n * 8, rounds=1)             # B2A open
    comm.register_virtual("all_sum", 2 * n * 8, rounds=1)         # select

    return MPCTensor(
        ArithmeticSharedTensor(out.reshape(shape), carry.encoder)
    )


# ---------------------------------------------------------------------------
# Fused LTZ (generic comparison) kernel
# ---------------------------------------------------------------------------

_LTZ_TILE_ROWS = 128


def _ltz_kernel_call(dl0, dl1, seeds):
    """LOW u32 half-planes (2, R, 128) of each party's difference shares
    (the packed-32 compare never reads the high plane). Returns the four
    u32 planes (lo0, hi0, lo1, hi1) of the arithmetic 0/1 ltz-bit shares."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = dl0.shape[1]
    tr = min(_LTZ_TILE_ROWS, rows)
    assert rows % tr == 0
    grid = rows // tr

    def kernel(seed_ref, *refs):
        dl0r, dl1r, ol0r, oh0r, ol1r, oh1r = refs
        t = pl.program_id(0)
        m0 = np.int32(-1640531527)
        m1 = np.int32(-2048144789)
        pltpu.prng_seed(seed_ref[0] ^ (t * m0), seed_ref[1] ^ ((t + 1) * m1))

        def rbits():
            lo = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32)
            hi = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32)
            return lo, hi

        def rbit():
            a = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32) & np.uint32(1)
            b = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32) & np.uint32(1)
            return jnp.stack([a, b])

        d0 = (dl0r[...], jnp.zeros_like(dl0r[...]))
        d1 = (dl1r[...], jnp.zeros_like(dl1r[...]))
        a0, a1 = ltz_bit_math(d0, d1, rbits, rbit)
        ol0r[...], oh0r[...] = a0
        ol1r[...], oh1r[...] = a1

    spec = pl.BlockSpec((2, tr, 128), lambda t: (0, t, 0))
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((2, rows, 128), jnp.uint32)
                for _ in range(4)
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 2,
            out_specs=(spec,) * 4,
        )(seeds, dl0, dl1)
    return outs


def fused_ltz_shares(d_shares, seed_words):
    """(2, n) uint64 additive shares of d -> (2, n) uint64 arithmetic
    shares of the 0/1 bit ltz(d), computed in the packed-32 subring
    (exact for |d| < 2^31 ring units — the cfg.mpc.compare_bits = 32
    envelope). n pads internally to 2 * rows * 128 (pad shares 0:
    ltz(0) = 0 — discarded by the final slice)."""
    n = d_shares.shape[1]
    m_raw = (n + 1) // 2
    rows_raw = (m_raw + 127) // 128
    tr = min(_LTZ_TILE_ROWS, 8 * ((rows_raw + 7) // 8))
    rows = ((rows_raw + tr - 1) // tr) * tr
    m = rows * 128
    pad = 2 * m - n

    def lo_planes(s):
        flat = jnp.pad(s, ((0, pad),)) if pad else s
        halves = flat.reshape(2, rows, 128)
        lo, _hi = up.from_u64(halves)
        return lo

    ol0, oh0, ol1, oh1 = _ltz_kernel_call(
        lo_planes(d_shares[0]), lo_planes(d_shares[1]), seed_words
    )
    out0 = up.to_u64(ol0, oh0).reshape(2 * m)[:n]
    out1 = up.to_u64(ol1, oh1).reshape(2 * m)[:n]
    return jnp.stack([out0, out1])


_FUSED_LTZ_CACHE = {}


def _get_fused_ltz(n):
    if n in _FUSED_LTZ_CACHE:
        return _FUSED_LTZ_CACHE[n]

    @jax.custom_batching.custom_vmap
    def fused(d_share, seed):
        # unbatched = world_size 1 degenerate case: the share IS the value
        d = jax.lax.bitcast_convert_type(d_share, jnp.int64)
        return (d < 0).astype(jnp.uint64)

    @fused.def_vmap
    def _rule(axis_size, in_batched, d_share, seed):  # noqa: ANN001
        assert axis_size == 2, "fused_ltz supports exactly 2 simulated parties"
        seed_comb = (seed[0] ^ seed[1]) if in_batched[1] else seed
        out = fused_ltz_shares(d_share, seed_comb)
        return out, True

    _FUSED_LTZ_CACHE[n] = fused
    return fused


# below this, the Pallas pad would dominate: one (8, 128) PRNG tile mints
# >= 1024 lanes anyway, and the composable path is cheap at these sizes
_FUSED_LTZ_MIN_ELEMENTS = 1024


def fused_ltz_mpc(x):
    """MPCTensor-level fused LTZ (called inside the per-party vmap trace):
    arithmetic 0/1 shares of (x < 0), one Mosaic kernel.

    Every comparison funnels through MPCTensor._ltz (mpc.py:206), so this
    single hook accelerates ge/gt/le/lt, sign/abs/relu, the gelu domain
    checks, and the non-fused max methods. Registers the packed-32
    composable path's exact round/byte profile (the kernel exchanges the
    same messages internally): 7 all_xor reveals (S AND + 5 packed prefix
    levels + B2A open).
    """
    from .. import comm
    from .. import random as crng
    from ..encoder import FixedPointEncoder
    from ..mpc.mpc import MPCTensor
    from ..mpc.primitives.arithmetic import ArithmeticSharedTensor
    from .pallas_rng import seed_from_key

    share = x.share
    shape = share.shape
    n = int(np.prod(shape)) if shape else 1
    nw = (n + 1) // 2

    # fresh key per call: two compares in one trace (e.g. gelu's sign and
    # domain check) must never share kernel protocol randomness
    seed = seed_from_key(crng._draw_key("local"))
    out = _get_fused_ltz(n)(share.reshape(n), seed)

    comm.register_virtual("all_xor", 2 * nw * 8, rounds=1)        # S AND
    comm.register_virtual("all_xor", 5 * 4 * nw * 8, rounds=5)    # prefix
    comm.register_virtual("all_xor", n * 8, rounds=1)             # B2A open

    return MPCTensor(
        ArithmeticSharedTensor(out.reshape(shape), FixedPointEncoder(0))
    )


def fused_max_step_shares(carry_shares, rolled_shares, seed_words):
    """(2, n) uint64 share arrays (party-stacked) -> new carry shares.

    n is padded internally to 2 * rows * 128 (pad shares 0: ge(0,0)=1,
    new = 0 — discarded by the final slice)."""
    n = carry_shares.shape[1]
    m_raw = (n + 1) // 2
    rows_raw = (m_raw + 127) // 128
    tr = min(_TILE_ROWS, 8 * ((rows_raw + 7) // 8))
    rows = ((rows_raw + tr - 1) // tr) * tr
    m = rows * 128
    pad = 2 * m - n

    def planes(s):
        flat = jnp.pad(s, ((0, pad),)) if pad else s
        halves = flat.reshape(2, rows, 128)
        return up.from_u64(halves)

    cl0, ch0 = planes(carry_shares[0])
    cl1, ch1 = planes(carry_shares[1])
    rl0, rh0 = planes(rolled_shares[0])
    rl1, rh1 = planes(rolled_shares[1])
    ol0, oh0, ol1, oh1 = _kernel_call(
        cl0, ch0, cl1, ch1, rl0, rh0, rl1, rh1, seed_words
    )
    out0 = up.to_u64(ol0, oh0).reshape(2 * m)[:n]
    out1 = up.to_u64(ol1, oh1).reshape(2 * m)[:n]
    return jnp.stack([out0, out1])
