"""Fused uint64 ring matmul: limb-decompose + int8 MXU + recombine in VMEM.

The XLA path (ring.matmul) is exact but materializes every intermediate in
HBM: the (K, 8N) int8 limb expansion of the weight operand, the full
(8M, 8N) int32 plane tensor (824 MB at GPT-2 lm-head scale), and a
transposed copy of it for recombination. Measured on v5e, one private
matmul runs ~14x above its HBM-traffic floor and dominates the GPT-2
forward (profile stage mm_big: 0.27 s of a 0.90 s forward).

This kernel performs the SAME exact computation (bit-identical mod-2^64
results; same balanced-limb algorithm as ring._balanced_limbs /
ring._combine_planes, reference analogue curl/cuda/cuda_tensor.py:158-281)
with every intermediate kept in VMEM:

    for each (batch b, M-tile m, N-tile n):             # grid
        acc = 0                                         # int32, VMEM scratch
        for each K-tile k:                              # innermost grid dim
            da = balanced_limbs(A[b, m, k])             # (8*TM, TK) int8
            db = balanced_limbs(B[b, k, n])             # (TK, 8*TN) int8
            acc += da @ db                              # one MXU contraction
        out[b, m, n] = combine_planes(acc)              # u32-pair shifts/adds

HBM traffic collapses to one read of each operand plus one u64 write of
the result. uint64 is carried as (lo, hi) uint32 planes (Mosaic has no
64-bit ints, ops/u64pair.py); the balanced-digit recoding and plane
recombination run on the VPU between MXU steps.

Soundness: pure local math — no protocol randomness, no communication —
so it is valid under every runtime (vmap simulation, shard_map,
world_size 1) and for public and private operands alike. Exactness:
balanced digits lie in [-128, 127], each plane product is
<= K * 2^14 < 2^31 for K < 2^17 (ring.MAX_EXACT_K guards the caller), and
int32 accumulation across K-tiles is the same sum reassociated.

The kernel math (decompose / recombine) is importable standalone and unit
tested on CPU in interpreter mode against ring.matmul
(tests/test_pallas_ring_mm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import u64pair as up

# ---------------------------------------------------------------------------
# kernel math (runs inside Mosaic; int32/uint32 ops only)
# ---------------------------------------------------------------------------

_N_LIMBS = 8


def _balanced_limbs_planes(lo, hi):
    """(R, C) uint32 planes of a uint64 tile -> list of 8 (R, C) int8 limbs.

    Same recoding as ring._balanced_limbs: byte + carry >= 128 emits
    byte + carry - 256 and propagates carry 1. Bytes 0-3 come from the low
    plane, 4-7 from the high plane; the carry crosses planes at byte 4.
    """
    digits = []
    carry = jnp.zeros(lo.shape, jnp.int32)
    for i in range(_N_LIMBS):
        word = lo if i < 4 else hi
        byte = ((word >> up.U32(8 * (i % 4))) & up.U32(0xFF)).astype(jnp.int32)
        v = byte + carry
        ge = v >= 128
        digits.append(jnp.where(ge, v - 256, v).astype(jnp.int8))
        carry = ge.astype(jnp.int32)
    return digits


def _combine_planes_pair(acc, tm, tn):
    """(8*TM, 8*TN) int32 plane sums -> (lo, hi) uint32 (TM, TN) mod 2^64.

    Plane (i, j) lives at rows [i*TM, (i+1)*TM), cols [j*TN, (j+1)*TN) and
    contributes its sign-extended value shifted by 8*(i+j); planes with
    i + j > 7 vanish mod 2^64.
    """
    zero = jnp.zeros((tm, tn), jnp.uint32)
    out = (zero, zero)
    for i in range(_N_LIMBS):
        for j in range(_N_LIMBS - i):
            p = acc[i * tm:(i + 1) * tm, j * tn:(j + 1) * tn]
            p_lo = p.astype(jnp.uint32)
            # sign extension: high word is 0 or 0xFFFFFFFF
            p_hi = (p >> 31).astype(jnp.uint32)
            out = up.add(out, up.shl((p_lo, p_hi), 8 * (i + j)))
    return out


def mm_tile_math(al, ah, bl, bh):
    """One K-tile contribution: limb-decompose both tiles, one int8 MXU
    contraction -> (8*TM, 8*TN) int32. Importable for CPU unit tests."""
    da = jnp.concatenate(_balanced_limbs_planes(al, ah), axis=0)  # (8TM, TK)
    db = jnp.concatenate(_balanced_limbs_planes(bl, bh), axis=1)  # (TK, 8TN)
    return jax.lax.dot_general(
        da, db,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def acc_tile_into(acc_ref, al, ah, bl, bh, tn):
    """Same contribution as mm_tile_math, accumulated into ``acc_ref``
    as 8 per-limb MXU dots against static lane slices.

    Rationale: the single-dot form concatenates the 8 B-limb planes along
    the LANE dimension ((TK, 8*TN) int8) — a cross-lane relayout Mosaic
    executes poorly. The A-limb concat along sublanes is cheap and stays;
    each B limb plane (TK, TN) is consumed in its natural layout.

    Triangle trim: plane (i, j) is shifted by 8*(i+j) bits at recombine,
    so i + j > 7 vanishes mod 2^64 — for B limb j only the first (8-j)
    A-limb rows contribute. Dotting just that static row prefix cuts MXU
    work 64 -> 36 plane products (1.78x) with bit-identical output
    (_combine_planes_pair never reads the dropped planes)."""
    tm = acc_ref.shape[0] // _N_LIMBS
    da = jnp.concatenate(_balanced_limbs_planes(al, ah), axis=0)  # (8TM, TK)
    dbs = _balanced_limbs_planes(bl, bh)                          # 8x(TK, TN)
    for j in range(_N_LIMBS):
        rows = (_N_LIMBS - j) * tm
        acc_ref[:rows, j * tn:(j + 1) * tn] += jax.lax.dot_general(
            da[:rows], dbs[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


# ---------------------------------------------------------------------------
# pallas_call wrapper
# ---------------------------------------------------------------------------

# (8*TM, 8*TN) int32 accumulator: 512 x 2048 x 4 B = 4 MB; operand tiles +
# limb planes + pipeline double-buffering fit the remaining VMEM budget.
_TM = 64
_TN = 256
_TK = 512


# A/B switch: per-limb lane-slice dots (True) vs one concatenated dot.
# Flipped after on-device timing; the math is identical (tests cover both).
_PER_LIMB_DOTS = True


def _kernel(al_ref, ah_ref, bl_ref, bh_ref, ol_ref, oh_ref, acc_ref):
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if _PER_LIMB_DOTS:
        acc_tile_into(
            acc_ref, _tile_of(al_ref), _tile_of(ah_ref),
            _tile_of(bl_ref), _tile_of(bh_ref), _TN
        )
    else:
        acc_ref[...] += mm_tile_math(
            _tile_of(al_ref), _tile_of(ah_ref),
            _tile_of(bl_ref), _tile_of(bh_ref)
        )

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        lo, hi = _combine_planes_pair(acc_ref[...], _TM, _TN)
        ol_ref[0] = lo
        oh_ref[0] = hi


# imported lazily so CPU-only environments never touch pallas at import time
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _pad_to(x, rows, cols):
    pr, pc = rows - x.shape[-2], cols - x.shape[-1]
    if pr or pc:
        pad = ((0, 0),) * (x.ndim - 2) + ((0, pr), (0, pc))
        x = jnp.pad(x, pad)
    return x


def _operand_spec(x, tile, index_map_batched, index_map_shared):
    """BlockSpec for an operand that is either batched (3-D, indexed by the
    grid's b dim) or SHARED (2-D — e.g. a weight/table identical across the
    batch and party lanes): a shared operand is read by every grid b step
    from the same HBM buffer, so no broadcast_to/reshape copy is ever
    materialized and the pipeline re-reads it per tile instead of per
    (party, tile)."""
    if x.ndim == 3:
        return pl.BlockSpec(
            (1,) + tile, index_map_batched, memory_space=pltpu.VMEM
        )
    return pl.BlockSpec(tile, index_map_shared, memory_space=pltpu.VMEM)


def _tile_of(ref):
    """The (rows, cols) tile of an operand ref, batched or shared."""
    return ref[0] if ref.ndim == 3 else ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mm_planes(al, ah, bl, bh, interpret=False):
    """(B, M, K)|(M, K) x (B, K, N)|(K, N) uint32 planes -> (B, M, N)
    planes, exact mod 2^64; 2-D operands are shared across the batch."""
    B = al.shape[0] if al.ndim == 3 else bl.shape[0]
    M, K = al.shape[-2:]
    N = bl.shape[-1]
    mp = -(-M // _TM) * _TM
    kp = -(-K // _TK) * _TK
    npad = -(-N // _TN) * _TN
    al, ah = _pad_to(al, mp, kp), _pad_to(ah, mp, kp)
    bl, bh = _pad_to(bl, kp, npad), _pad_to(bh, kp, npad)

    grid = (B, mp // _TM, npad // _TN, kp // _TK)
    a_spec = _operand_spec(
        al, (_TM, _TK),
        lambda b, m, n, k: (b, m, k), lambda b, m, n, k: (m, k),
    )
    b_spec = _operand_spec(
        bl, (_TK, _TN),
        lambda b, m, n, k: (b, k, n), lambda b, m, n, k: (k, n),
    )
    o_spec = pl.BlockSpec(
        (1, _TM, _TN), lambda b, m, n, k: (b, m, n), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        ol, oh = pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[a_spec, a_spec, b_spec, b_spec],
            out_specs=(o_spec, o_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, mp, npad), jnp.uint32),
                jax.ShapeDtypeStruct((B, mp, npad), jnp.uint32),
            ),
            scratch_shapes=[
                pltpu.VMEM((_N_LIMBS * _TM, _N_LIMBS * _TN), jnp.int32)
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * mp * kp * npad * _N_LIMBS * _N_LIMBS,
                bytes_accessed=8 * B * (mp * kp + kp * npad + mp * npad),
                transcendentals=0,
            ),
            interpret=interpret,
        )(al, ah, bl, bh)
    return ol[:, :M, :N], oh[:, :M, :N]


def matmul_3d(a_u64, b_u64, interpret=False):
    """(B, M, K)|(M, K) @ (B, K, N)|(K, N) uint64 -> (B, M, N) uint64,
    exact mod 2^64; a 2-D operand is SHARED across the batch (read once —
    no broadcast copy)."""
    al, ah = up.from_u64(a_u64)
    bl, bh = up.from_u64(b_u64)
    ol, oh = _mm_planes(al, ah, bl, bh, interpret=interpret)
    return up.to_u64(ol, oh)


def _fold_party_axis(axis_size, in_batched, ops):
    """vmap-rule helper: fold the vmapped party axis into the kernel batch.

    Unbatched 2-D operands stay 2-D (shared across parties AND the host
    batch — the common case for weights/tables, saving both the broadcast
    copy and the per-party HBM re-read). Everything else is normalized to
    (P, B, rows, cols) and flattened to (P*B, rows, cols):
      * batched 4-D: host-batched per-party operand — flatten directly;
      * batched 3-D: per-party 2-D operand (e.g. activations against a
        host-batched other side) — repeat across B;
      * unbatched 3-D: host-batched, party-invariant — repeat across P.
    Returns (folded ops, B)."""
    B = 1
    for v, bt in zip(ops, in_batched):
        if bt and v.ndim == 4:
            B = max(B, v.shape[1])
        elif not bt and v.ndim == 3:
            B = max(B, v.shape[0])
    out = []
    for v, bt in zip(ops, in_batched):
        if not bt:
            if v.ndim == 2:
                out.append(v)  # shared
                continue
            v = jnp.broadcast_to(v[None], (axis_size,) + v.shape)
        elif v.ndim == 3:
            v = jnp.broadcast_to(v[:, None], (axis_size, B) + v.shape[1:])
        out.append(v.reshape((axis_size * B,) + v.shape[2:]))
    return out, B


# one custom_vmap per (ndim signature): the party-simulation vmap (and any
# outer batching) folds into the kernel's leading batch grid dimension
@jax.custom_batching.custom_vmap
def _mm_batched(a, b):
    return matmul_3d(a, b)


@_mm_batched.def_vmap
def _mm_batched_rule(axis_size, in_batched, a, b):  # noqa: ANN001
    (a, b), B = _fold_party_axis(axis_size, in_batched, (a, b))
    out = _mm_batched(a, b)
    return out.reshape((axis_size, B) + out.shape[1:]), True


# ---------------------------------------------------------------------------
# multi-pair matmul-accumulate: sum_p A_p @ B_p mod 2^64 in ONE kernel pass
# ---------------------------------------------------------------------------
#
# The Beaver protocols compute sums of ring matmuls over the SAME output
# tile (unmasked: eps@b + x@delta; masked-operand: a@b_plain + eps@b_share
# + x@delta). Running them as separate kernels recombines the int32 limb
# planes and writes the u64 output P times, then re-reads it for the adds.
# Limb-plane sums are linear BEFORE recombination, so all P products can
# share one int32 accumulator: one recombine pass, one output write, zero
# intermediate (M, N) u64 traffic. Exactness: |balanced digit product|
# <= 2^14, accumulated over sum_p K_p terms -> requires
# n_pairs * K < 2^17 (= ring.MAX_EXACT_K), which the caller guards.


def _acc_kernel(*refs):
    n_pairs = (len(refs) - 3) // 4
    ol_ref, oh_ref, acc_ref = refs[-3], refs[-2], refs[-1]
    k = pl.program_id(3)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for p in range(n_pairs):
        al, ah, bl, bh = refs[4 * p:4 * p + 4]
        if _PER_LIMB_DOTS:
            acc_tile_into(
                acc_ref, _tile_of(al), _tile_of(ah),
                _tile_of(bl), _tile_of(bh), _TN
            )
        else:
            acc_ref[...] += mm_tile_math(
                _tile_of(al), _tile_of(ah), _tile_of(bl), _tile_of(bh)
            )

    @pl.when(k == pl.num_programs(3) - 1)
    def _():
        lo, hi = _combine_planes_pair(acc_ref[...], _TM, _TN)
        ol_ref[0] = lo
        oh_ref[0] = hi


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mm_planes_acc(*planes, interpret=False):
    """planes: flat (al, ah, bl, bh) per pair, every pair (B, M, K)|(M, K)
    x (B, K, N)|(K, N) uint32 planes -> summed (B, M, N) planes, exact
    mod 2^64; 2-D operands are shared across the batch (read once from one
    HBM buffer for all batch/party grid steps)."""
    n_pairs = len(planes) // 4
    B = next(p.shape[0] for p in planes if p.ndim == 3)
    M, K = planes[0].shape[-2:]
    N = planes[2].shape[-1]
    mp = -(-M // _TM) * _TM
    kp = -(-K // _TK) * _TK
    npad = -(-N // _TN) * _TN
    padded = []
    specs = []
    for p in range(n_pairs):
        al, ah, bl, bh = planes[4 * p:4 * p + 4]
        padded += [
            _pad_to(al, mp, kp), _pad_to(ah, mp, kp),
            _pad_to(bl, kp, npad), _pad_to(bh, kp, npad),
        ]
        a_spec = _operand_spec(
            al, (_TM, _TK),
            lambda b, m, n, k: (b, m, k), lambda b, m, n, k: (m, k),
        )
        b_spec = _operand_spec(
            bl, (_TK, _TN),
            lambda b, m, n, k: (b, k, n), lambda b, m, n, k: (k, n),
        )
        specs += [a_spec, a_spec, b_spec, b_spec]

    grid = (B, mp // _TM, npad // _TN, kp // _TK)
    o_spec = pl.BlockSpec(
        (1, _TM, _TN), lambda b, m, n, k: (b, m, n), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        ol, oh = pl.pallas_call(
            _acc_kernel,
            grid=grid,
            in_specs=specs,
            out_specs=(o_spec, o_spec),
            out_shape=(
                jax.ShapeDtypeStruct((B, mp, npad), jnp.uint32),
                jax.ShapeDtypeStruct((B, mp, npad), jnp.uint32),
            ),
            scratch_shapes=[
                pltpu.VMEM((_N_LIMBS * _TM, _N_LIMBS * _TN), jnp.int32)
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * B * mp * kp * npad * _N_LIMBS * _N_LIMBS * n_pairs,
                bytes_accessed=8 * B * (
                    n_pairs * (mp * kp + kp * npad) + mp * npad
                ),
                transcendentals=0,
            ),
            interpret=interpret,
        )(*padded)
    return ol[:, :M, :N], oh[:, :M, :N]


@functools.lru_cache(maxsize=None)
def _acc_batched_fn(n_pairs, interpret):
    """One custom_vmap per pair count: the party-simulation vmap folds into
    the kernel's leading batch grid dimension (same rule as _mm_batched)."""

    @jax.custom_batching.custom_vmap
    def f(*ab):  # (a0, b0, ...) each (B, M, K)|(M, K) / (B, K, N)|(K, N)
        planes = []
        for p in range(n_pairs):
            al, ah = up.from_u64(ab[2 * p])
            bl, bh = up.from_u64(ab[2 * p + 1])
            planes += [al, ah, bl, bh]
        ol, oh = _mm_planes_acc(*planes, interpret=interpret)
        return up.to_u64(ol, oh)

    @f.def_vmap
    def _rule(axis_size, in_batched, *ab):  # noqa: ANN001
        flat, B = _fold_party_axis(axis_size, in_batched, ab)
        out = f(*flat)
        return out.reshape((axis_size, B) + out.shape[1:]), True

    return f


def matmul_acc(pairs, interpret=False):
    """sum_p (A_p @ B_p) mod 2^64 in one fused pass. Every pair must share
    the contraction depth K and produce the same (batch, M, N) output;
    caller guarantees len(pairs) * K < ring.MAX_EXACT_K. Unbatched (2-D)
    operands — weights, masked tables — are passed to the kernel SHARED:
    read once from one HBM buffer for every batch/party grid step, instead
    of materializing broadcast copies."""
    norm = [(jnp.asarray(a), jnp.asarray(b)) for a, b in pairs]
    mkns = {(a.shape[-2], a.shape[-1], b.shape[-1]) for a, b in norm}
    if len(mkns) != 1 or any(a.shape[-1] != b.shape[-2] for a, b in norm):
        raise ValueError(
            "matmul_acc pairs must share one (M, K, N) signature; got "
            + ", ".join(f"{a.shape}@{b.shape}" for a, b in norm)
        )
    batch = jnp.broadcast_shapes(
        *[a.shape[:-2] for a, _ in norm], *[b.shape[:-2] for _, b in norm]
    )
    nb = int(np.prod(batch)) if batch else 1
    flat = []
    any_batched = False
    for a, b in norm:
        for v in (a, b):
            if v.ndim == 2 and batch:
                flat.append(v)  # shared across the batch
                continue
            v = jnp.broadcast_to(v, batch + v.shape[-2:])
            flat.append(v.reshape((nb,) + v.shape[-2:]))
            any_batched = True
    if not any_batched:  # all-2D: give the kernel a size-1 batch
        flat[0] = flat[0][None]
    out = _acc_batched_fn(len(norm), interpret)(*flat)
    return out.reshape(batch + out.shape[-2:])


def matmul(a_u64, b_u64):
    """uint64 ring matmul with arbitrary (matching/broadcastable) batch
    dims, via the fused kernel. Caller guarantees K < ring.MAX_EXACT_K.
    A 2-D operand alongside a batched one stays SHARED (single HBM read,
    no broadcast copy)."""
    a = jnp.asarray(a_u64)
    b = jnp.asarray(b_u64)
    squeeze_a = a.ndim == 1
    squeeze_b = b.ndim == 1
    if squeeze_a:
        a = a[None, :]
    if squeeze_b:
        b = b[:, None]
    batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    nb = int(np.prod(batch)) if batch else 1

    def prep(v):
        if v.ndim == 2 and batch:
            return v  # shared
        v = jnp.broadcast_to(v, batch + v.shape[-2:])
        return v.reshape((nb,) + v.shape[-2:])

    av, bv = prep(a), prep(b)
    if av.ndim == 2 and bv.ndim == 2:
        av = av[None]
    out = _mm_batched(av, bv)
    out = out.reshape(batch + out.shape[-2:])
    if squeeze_a:
        out = out[..., 0, :]
    if squeeze_b:
        out = out[..., 0]
    return out
