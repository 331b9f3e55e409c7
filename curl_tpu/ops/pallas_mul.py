"""Fused 2PC elementwise Beaver multiply / square with in-kernel rescale.

Every elementwise private product (softmax numerator x 1/denominator, gelu
masking products, Beaver selects, and the 8 sequential squarings of the
"limit" exp method that dominate the vocab softmax — profile stage
vocab_exp: 0.116 s of the 0.90 s GPT-2 forward) runs, unfused, as ~10
HBM-materialized arrays: the triple draw (a, b, c) + their PRZS shares,
the eps/delta reveal, the product recombination, and the truncation
protocol's own randomness + reveal. This kernel executes the SAME protocol
math for both simulated parties in VMEM with hardware-PRNG randomness and
writes only the result shares:

    mul:    a,b ~ U(Z_2^64); c = ab; PRZS-share; eps = x-a, delta = y-b
            z_p = c_p + eps*b_p + x_p*delta        (beaver.py:32-89)
    square: r ~ U; z_p = r2_p + 2 r_p eps (+ rank0 eps^2)  (beaver.py:114)
    rescale: EGK+20 Fig.10 probabilistic truncation (beaver.py:166-195)
             or the 2PC-local crypten truncation (arithmetic.py:472)

Scope/soundness: SIMULATION-runtime fastpath exactly like
ops/pallas_max_step.py — 2PC vmap runtime, TFP provider, TPU backend;
identical message values and randomness distributions as the composable
path (tfp_provider.py sampling mirrored 1:1), with trace-time round/byte
accounting registered via comm.register_virtual. The math functions take
an injectable randomness source so the exact traced code is unit-tested on
CPU against the composable protocol (tests/test_fused_mul.py).

uint64 runs as (lo, hi) uint32 pairs (ops/u64pair.py; Mosaic has no u64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import u64pair as up

_K = 64  # ring width


# ---------------------------------------------------------------------------
# u64-pair helpers beyond u64pair.py
# ---------------------------------------------------------------------------

def sar(a, k: int):
    """Arithmetic (sign-extending) right shift by Python-int k."""
    if k == 0:
        return a
    lo, hi = up.shr(a, k)
    sign_mask = up.U32(0) - (a[1] >> up.U32(31))      # 0 or 0xFFFFFFFF
    ext = ((1 << 64) - (1 << (64 - k))) % (1 << 64)   # top k bits set
    ext_lo = np.uint32(ext & 0xFFFFFFFF)
    ext_hi = np.uint32((ext >> 32) & 0xFFFFFFFF)
    return lo | (sign_mask & ext_lo), hi | (sign_mask & ext_hi)


def trunc_div_pow2(a, m: int):
    """Signed truncated division by 2^m: (s + (s<0)*(2^m-1)) >> m (arith).

    The 2PC-local crypten truncation applied per share
    (ring.trunc_div_pow2_signed / reference arithmetic.py:472)."""
    if m == 0:
        return a
    neg = up.U32(0) - (a[1] >> up.U32(31))            # 0 or 0xFFFFFFFF
    corr = ((1 << m) - 1)
    corr_lo = np.uint32(corr & 0xFFFFFFFF)
    corr_hi = np.uint32((corr >> 32) & 0xFFFFFFFF)
    biased = up.add(a, (neg & corr_lo, neg & corr_hi))
    return sar(biased, m)


def const_pair(value: int, like):
    v = value % (1 << 64)
    lo = jnp.full_like(like[0], np.uint32(v & 0xFFFFFFFF))
    hi = jnp.full_like(like[1], np.uint32((v >> 32) & 0xFFFFFFFF))
    return lo, hi


# ---------------------------------------------------------------------------
# protocol math (injectable randomness; unit-tested on CPU)
# ---------------------------------------------------------------------------

def _share_pair(value, r64):
    """PRZS + rank-0-adds-plaintext sharing of an in-kernel draw
    (tfp_provider._share_from_local for world_size 2)."""
    s = r64()
    return up.add(s, value), up.neg(s)


def beaver_mul_math(x0, x1, y0, y1, r64):
    """z_p shares of x*y: triple + 2-product reconstruction
    (beaver.py:32-89, tfp_provider.py triple sampling)."""
    a = r64()
    b = r64()
    c = up.mul(a, b)
    a0, a1 = _share_pair(a, r64)
    b0, b1 = _share_pair(b, r64)
    c0, c1 = _share_pair(c, r64)
    eps = up.add(up.sub(x0, a0), up.sub(x1, a1))
    delta = up.add(up.sub(y0, b0), up.sub(y1, b1))
    z0 = up.add(up.add(c0, up.mul(eps, b0)), up.mul(x0, delta))
    z1 = up.add(up.add(c1, up.mul(eps, b1)), up.mul(x1, delta))
    return z0, z1


def beaver_square_math(x0, x1, r64):
    """z_p shares of x^2 (beaver.py:114-127)."""
    r = r64()
    r2 = up.mul(r, r)
    r0, r1 = _share_pair(r, r64)
    r20, r21 = _share_pair(r2, r64)
    eps = up.add(up.sub(x0, r0), up.sub(x1, r1))
    z0 = up.add(r20, up.mul(up.shl(r0, 1), eps))
    z0 = up.add(z0, up.mul(eps, eps))                  # rank-0 public term
    z1 = up.add(r21, up.mul(up.shl(r1, 1), eps))
    return z0, z1


def egk_trunc_math(z0, z1, m: int, r64, rk, l: int = 62):
    """EGK+20 Fig.10 probabilistic truncation by 2^m, mirroring
    beaver.egk_trunc_pr:166-195 exactly (one in-kernel reveal)."""
    r_sh = _share_pair(rk(l - m), r64)
    rp_sh = _share_pair(rk(m), r64)
    b_sh = _share_pair(rk(1), r64)

    # step 1: mask and reveal c
    a0 = up.add(z0, const_pair(1 << (l - 1), z0))      # rank-0 bias
    a1 = z1
    rpp0 = up.add(up.shl(r_sh[0], m), rp_sh[0])
    rpp1 = up.add(up.shl(r_sh[1], m), rp_sh[1])
    enc0 = up.shl(up.add(a0, up.add(up.shl(b_sh[0], l), rpp0)), _K - l - 1)
    enc1 = up.shl(up.add(a1, up.add(up.shl(b_sh[1], l), rpp1)), _K - l - 1)
    c = up.add(enc0, enc1)                             # public reveal
    c_p = sar(c, _K - l - 1)

    # step 2: strip the masking bit (c_pl public 0/1)
    c_pl = up.shr(c_p, l)[0] & up.U32(1)
    # v_p = b_p + rank0(c_pl) - 2 b_p c_pl:
    #   c_pl = 0 -> v_p = b_p;  c_pl = 1 -> v0 = 1 - b0, v1 = -b1
    one = const_pair(1, z0)
    v0 = up.select_bit(c_pl, up.sub(one, b_sh[0]), b_sh[0])
    v1 = up.select_bit(c_pl, up.neg(b_sh[1]), b_sh[1])

    # step 3: reconstruct the truncation
    c_mod = up.and_const(c_p, (1 << l) - 1)            # nonneg residue mod 2^l
    pub_tail = up.shr(c_mod, m)                        # signed floordiv, >= 0
    y0 = up.sub(up.shl(v0, l - m), r_sh[0])
    y0 = up.add(y0, up.add(const_pair(-(1 << (l - m - 1)), z0), pub_tail))
    y1 = up.sub(up.shl(v1, l - m), r_sh[1])
    return y0, y1


def fused_op_math(op, trunc, m, x0, x1, y0, y1, r64, rk):
    """op in {mul, square, trunc}; trunc in {none, egk, crypten}."""
    if op == "mul":
        z0, z1 = beaver_mul_math(x0, x1, y0, y1, r64)
    elif op == "square":
        z0, z1 = beaver_square_math(x0, x1, r64)
    else:  # standalone truncation of existing shares (LUT index trunc)
        z0, z1 = x0, x1
    if trunc == "egk":
        z0, z1 = egk_trunc_math(z0, z1, m, r64, rk)
    elif trunc == "crypten":
        z0, z1 = trunc_div_pow2(z0, m), trunc_div_pow2(z1, m)
    return z0, z1


# ---------------------------------------------------------------------------
# pallas wrapper
# ---------------------------------------------------------------------------

_TILE_ROWS = 64  # (64, 128) u32 planes; ~25 live u64-pair temporaries fit


def _kernel_call(op, trunc, m, planes, seeds):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = planes[0].shape[0]
    tr = min(_TILE_ROWS, rows)
    assert rows % tr == 0
    grid = rows // tr

    def kernel(seed_ref, *refs):
        ins, outs = refs[:-4], refs[-4:]
        t = pl.program_id(0)
        m0 = np.int32(-1640531527)
        m1 = np.int32(-2048144789)
        pltpu.prng_seed(seed_ref[0] ^ (t * m0), seed_ref[1] ^ ((t + 1) * m1))

        def r64():
            lo = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32)
            hi = pltpu.prng_random_bits((tr, 128)).astype(jnp.uint32)
            return lo, hi

        def rk(bits):
            lo, hi = r64()
            if bits <= 32:
                return lo & np.uint32((1 << bits) - 1), jnp.zeros_like(hi)
            return lo, hi & np.uint32((1 << (bits - 32)) - 1)

        x0 = (ins[0][...], ins[1][...])
        x1 = (ins[2][...], ins[3][...])
        if op == "mul":
            y0 = (ins[4][...], ins[5][...])
            y1 = (ins[6][...], ins[7][...])
        else:
            y0 = y1 = None
        z0, z1 = fused_op_math(op, trunc, m, x0, x1, y0, y1, r64, rk)
        outs[0][...], outs[1][...] = z0
        outs[2][...], outs[3][...] = z1

    spec = pl.BlockSpec((tr, 128), lambda t: (t, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows, 128), jnp.uint32) for _ in range(4)
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [spec] * len(planes),
            out_specs=(spec,) * 4,
        )(seeds, *planes)


def _fused_shares(op, trunc, m, x_shares, y_shares, seed_words):
    """(2, n) uint64 share arrays -> (2, n) result shares. Pads n to a
    whole number of (rows, 128) tiles (pad shares 0 -> pad results are
    discarded by the final slice)."""
    n = x_shares.shape[1]
    rows_raw = (n + 127) // 128
    tr = min(_TILE_ROWS, 8 * ((rows_raw + 7) // 8))
    rows = ((rows_raw + tr - 1) // tr) * tr
    total = rows * 128
    pad = total - n

    def planes(s):
        flat = jnp.pad(s, ((0, pad),)) if pad else s
        return up.from_u64(flat.reshape(rows, 128))

    ins = list(planes(x_shares[0]) + planes(x_shares[1]))
    if op == "mul":
        ins += list(planes(y_shares[0]) + planes(y_shares[1]))
    ol0, oh0, ol1, oh1 = _kernel_call(op, trunc, m, ins, seed_words)
    out0 = up.to_u64(ol0, oh0).reshape(total)[:n]
    out1 = up.to_u64(ol1, oh1).reshape(total)[:n]
    return jnp.stack([out0, out1])


_FUSED_CACHE = {}


def _get_fused(op, trunc, m, n):
    key = (op, trunc, m, n)
    if key in _FUSED_CACHE:
        return _FUSED_CACHE[key]

    @jax.custom_batching.custom_vmap
    def fused(x_share, y_share, seed):
        # world_size-1 degenerate case: shares ARE the values
        if op == "mul":
            z = x_share * y_share
        elif op == "square":
            z = x_share * x_share
        else:
            z = x_share
        if trunc in ("egk", "crypten"):
            from .. import ring

            z = ring.trunc_div_pow2_signed(z, m)
        return z

    @fused.def_vmap
    def _rule(axis_size, in_batched, x_share, y_share, seed):  # noqa: ANN001
        assert axis_size == 2, "fused mul supports exactly 2 simulated parties"
        if op == "mul" and not in_batched[1]:
            y_share = jnp.broadcast_to(y_share[None], (2,) + y_share.shape)
        seed_comb = (seed[0] ^ seed[1]) if in_batched[2] else seed
        out = _fused_shares(op, trunc, m, x_share, y_share, seed_comb)
        return out, True

    _FUSED_CACHE[key] = fused
    return fused


_FUSED_MUL_MIN_ELEMENTS = 1024


def fused_available(x, y=None, key="fused_mul") -> bool:
    """2PC vmap runtime + TFP + TPU + elementwise size worth a kernel —
    the pallas_max_step scope rules. ``key`` selects the config gate
    (mpc.fused_mul for mul/square, mpc.fused_trunc for standalone trunc)."""
    from .. import comm
    from ..config import cfg

    try:
        enabled = getattr(cfg.mpc, key) == "pallas_tpu"
    except AttributeError:
        return False
    if not enabled:
        return False
    try:
        if cfg.mpc.active_security or cfg.mpc.protocol != "beaver":
            return False  # sacrifice check / RSS stay on the composable path
    except AttributeError:
        pass
    shape = jnp.broadcast_shapes(
        x.shape, y.shape if y is not None else x.shape
    )
    n = int(np.prod(shape)) if shape else 1
    if n < _FUSED_MUL_MIN_ELEMENTS:
        return False
    from ..mpc import get_default_provider

    if getattr(get_default_provider(), "NAME", None) != "TFP":
        return False
    # NOTE: deliberately NOT gated on the tuple cache. The kernel draws its
    # randomness in-kernel (hardware PRNG) and makes no provider requests,
    # so it must engage identically in the cache RECORDING trace and the
    # cache SERVING trace — gating on _serving_cache alone desynchronizes
    # the positional tuple stream (request N of the serve trace would pop
    # entry N of a differently-shaped record trace). Same design as the
    # fused max-step kernel. mpc.fused_mul: null forces every product's
    # randomness through the offline provider path.
    return (
        comm.get_world_size() == 2
        and comm.get_runtime() == "vmap"
        and jax.default_backend() == "tpu"
    )


def _run(op, x, y, trunc, m):
    from .. import comm
    from .. import random as crng
    from ..mpc.primitives.arithmetic import ArithmeticSharedTensor
    from .pallas_rng import seed_from_key

    shape = jnp.broadcast_shapes(x.shape, y.shape if y is not None else x.shape)
    xs = jnp.broadcast_to(x.share, shape)
    n = int(np.prod(shape)) if shape else 1
    seed = seed_from_key(crng._draw_key("local"))
    if op == "mul":
        ys = jnp.broadcast_to(y.share, shape)
        out = _get_fused("mul", trunc, m, n)(
            xs.reshape(n), ys.reshape(n), seed
        )
        comm.register_virtual("all_sum", 2 * n * 8, rounds=1)      # eps,delta
    else:  # square / trunc take only x
        out = _get_fused(op, trunc, m, n)(
            xs.reshape(n), xs.reshape(n), seed
        )
        if op == "square":
            comm.register_virtual("all_sum", n * 8, rounds=1)      # eps
    if trunc == "egk":
        comm.register_virtual("all_sum", n * 8, rounds=1)          # EGK c
    return ArithmeticSharedTensor(out.reshape(shape), x.encoder)


def fused_mul_mpc(x, y, trunc: str, m: int):
    """Elementwise private x*y with fused rescale. trunc: egk|crypten|none."""
    return _run("mul", x, y, trunc, m)


def fused_square_mpc(x, trunc: str, m: int):
    """Private x^2 with fused rescale."""
    return _run("square", x, None, trunc, m)


def fused_trunc_mpc(x, m: int):
    """Standalone EGK+20 probabilistic truncation by 2^m as one kernel —
    the per-LUT-call index truncation (_trunc_lut / bior's final trunc,
    beaver.egk_trunc_pr): masking randomness (r, r', b) from the hardware
    PRNG, the single c-reveal, and the reconstruction all in VMEM."""
    return _run("trunc", x, None, "egk", m)
