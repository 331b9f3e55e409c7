"""Ring arithmetic over Z_2^64, TPU-native.

Shares live as ``jnp.uint64`` arrays: on TPU, XLA emulates 64-bit integer
elementwise ops with exact mod-2^64 wraparound semantics (verified on v5e),
which replaces the reference's reliance on torch.int64 two's-complement
overflow (reference: curl/mpc/primitives/arithmetic.py).

The one thing the TPU cannot do natively is a 64-bit integer matmul/conv —
the MXU is an fp/int8 systolic array. The reference works around the same
limitation on GPUs with CUDALongTensor (reference: curl/cuda/cuda_tensor.py:
158-281), block-decomposing int64 into float64 limbs. Here we decompose each
uint64 operand into eight *balanced signed* int8 limbs (digits in [-128, 127]
with carry recoding, so products fit int8xint8->int32 MXU tiles exactly) and
run ONE large int8 matmul of shape (8M, K) @ (K, 8N): all 64 limb-plane
products in a single MXU pass, recombined mod 2^64 with uint64 shifts.

Exactness argument: plane (i, j) contributes sum_k a_i[k] b_j[k] * 2^(8(i+j)).
|digit| <= 128 so each product has magnitude <= 2^14; int32 accumulation is
exact for K < 2^17. The final combine only needs planes with i + j <= 7
because 2^(8(i+j)) = 0 mod 2^64 otherwise.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

U64 = jnp.uint64
I64 = jnp.int64
RING_BITS = 64
N_LIMBS = 8
LIMB_BITS = 8

# Maximum contraction size for exact int32 accumulation of balanced int8 limbs.
MAX_EXACT_K = 1 << 17


def to_ring(x) -> jax.Array:
    """Reinterpret/convert anything integral to uint64 ring elements."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint64:
        return x
    if x.dtype in (jnp.int64, jnp.int32, jnp.int16, jnp.int8):
        return x.astype(jnp.int64).view(jnp.uint64)
    if x.dtype in (jnp.uint32, jnp.uint16, jnp.uint8, jnp.bool_):
        return x.astype(jnp.uint64)
    raise TypeError(f"cannot interpret dtype {x.dtype} as ring element")


def to_signed(x: jax.Array) -> jax.Array:
    """View uint64 ring elements as two's-complement int64."""
    return x.view(jnp.int64)


def from_signed(x: jax.Array) -> jax.Array:
    return x.view(jnp.uint64)


def const(value: int, shape=(), dtype=U64) -> jax.Array:
    """Ring constant from a python int (mod 2^64)."""
    return jnp.full(shape, np.uint64(value % (1 << 64)), dtype=dtype)


def scalar(value: int) -> np.uint64:
    return np.uint64(value % (1 << 64))


# ---------------------------------------------------------------------------
# Elementwise ring ops (exact mod 2^64; XLA emulates on TPU)
# ---------------------------------------------------------------------------

def add(a, b):
    return jnp.add(a, b)


def sub(a, b):
    return jnp.subtract(a, b)


def neg(a):
    return jnp.negative(a)


def mul(a, b):
    return jnp.multiply(a, b)


def mul_pow2(a, bits: int):
    """Multiply by 2^bits (mod 2^64)."""
    if bits == 0:
        return a
    return a << jnp.uint64(bits)


def shift_right_logical(a, bits):
    return jnp.right_shift(a, jnp.uint64(bits))


def shift_right_arith(a, bits):
    """Arithmetic shift interpreting as signed int64 (reference __rshift__)."""
    return from_signed(to_signed(a) >> jnp.int64(bits))


def shift_left(a, bits):
    return a << jnp.uint64(bits)


def xor(a, b):
    return jnp.bitwise_xor(a, b)


def and_(a, b):
    return jnp.bitwise_and(a, b)


def or_(a, b):
    return jnp.bitwise_or(a, b)


def invert(a):
    return jnp.bitwise_not(a)


def trunc_div_pow2_signed(a, bits: int):
    """Signed truncated division by 2^bits: torch's div(..., rounding_mode='trunc').

    Matches reference 2PC local truncation (arithmetic.py:472):
    trunc(x / 2^m) = (x + (x < 0) * (2^m - 1)) >> m   (arithmetic shift).
    """
    if bits == 0:
        return a
    s = to_signed(a)
    corr = jnp.where(s < 0, jnp.int64((1 << bits) - 1), jnp.int64(0))
    return from_signed((s + corr) >> jnp.int64(bits))


def trunc_div_signed(a, divisor: int):
    """Signed truncated division by an arbitrary positive integer."""
    if divisor <= 0:
        raise ValueError("divisor must be positive")
    if divisor & (divisor - 1) == 0:
        return trunc_div_pow2_signed(a, int(math.log2(divisor)))
    s = to_signed(a)
    # jnp // on signed ints floors; truncation adds one when the floored
    # quotient is negative and division is inexact
    q = s // jnp.int64(divisor)
    r = s - q * jnp.int64(divisor)
    q = jnp.where((r != 0) & ((s < 0) != (divisor < 0)), q + 1, q)
    return from_signed(q)


def floormod_pow2(a, bits: int):
    """a mod 2^bits as nonnegative residue (python/torch % semantics)."""
    if bits >= 64:
        return a
    return a & jnp.uint64((1 << bits) - 1)


def signed_floordiv_pow2(a, bits: int):
    """Floor division of the signed view by 2^bits (python // semantics)."""
    return from_signed(to_signed(a) >> jnp.int64(bits))


def count_wraps(shares_stacked):
    """Count overflow wraps when summing signed shares over leading axis.

    Mirrors reference curl/common/util.py:15 count_wraps: adding two
    positives that overflow to negative counts +1; adding two negatives
    that underflow to positive counts -1.
    """
    s = to_signed(shares_stacked)
    result = jnp.zeros(s.shape[1:], dtype=jnp.int64)
    prev = s[0]
    for i in range(1, s.shape[0]):
        cur = s[i]
        next_val = prev + cur
        neg_wrap = (prev < 0) & (cur < 0) & (next_val > 0)
        pos_wrap = (prev > 0) & (cur > 0) & (next_val < 0)
        result = result + pos_wrap.astype(jnp.int64) - neg_wrap.astype(jnp.int64)
        prev = next_val
    return from_signed(result)


# ---------------------------------------------------------------------------
# Limb decomposition for MXU matmul / conv
# ---------------------------------------------------------------------------

def _balanced_limbs(x: jax.Array) -> jax.Array:
    """Decompose uint64 -> 8 balanced int8 digits (limb axis appended last).

    x = sum_i d_i * 2^(8 i)  (mod 2^64),  d_i in [-128, 127].

    Byte b plus incoming carry c is recoded: if b + c >= 128 the digit is
    b + c - 256 and a carry of 1 propagates. The 9th carry falls off mod 2^64.
    """
    digits = []
    carry = jnp.zeros(x.shape, dtype=jnp.int32)
    for i in range(N_LIMBS):
        byte = ((x >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)).astype(jnp.int32)
        v = byte + carry
        ge = v >= 128
        digit = jnp.where(ge, v - 256, v)
        carry = ge.astype(jnp.int32)
        digits.append(digit.astype(jnp.int8))
    return jnp.stack(digits, axis=-1)


def _combine_planes(planes: jax.Array) -> jax.Array:
    """Recombine (..., 8, 8) int32 limb-plane sums into uint64 mod 2^64."""
    out = jnp.zeros(planes.shape[:-2], dtype=jnp.uint64)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS - i):
            # sign-extend int32 plane into the 64-bit ring, then shift
            p = planes[..., i, j].astype(jnp.int64).view(jnp.uint64)
            out = out + (p << jnp.uint64(8 * (i + j)))
    return out


def _pallas_mm_enabled(M: int, K: int, N: int) -> bool:
    """Use the fused Pallas limb-matmul kernel (ops/pallas_ring_mm.py)?

    Pure local math, valid under every runtime; gated to the TPU backend
    (where the XLA path's HBM-materialized limb planes are ~14x above the
    traffic floor) and to sizes where tile padding cannot dominate.
    mpc.ring_mm_kernel: "auto" (default, on for TPU) | "off" | "pallas_tpu".
    """
    try:
        from .config import cfg

        mode = str(cfg.mpc.ring_mm_kernel)
    except Exception:  # noqa: BLE001 — config not loaded yet
        mode = "auto"
    if mode == "off":
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    return M * K * N >= (1 << 16)


def matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact uint64 ring matmul via one large int8 MXU matmul.

    a: (..., M, K) uint64; b: (..., K, N) uint64 -> (..., M, N) uint64.
    Batched dims must match (no broadcasting for now).
    TPU-native analogue of CUDALongTensor.matmul (reference cuda_tensor.py:242).
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim == 1 and b.ndim == 1:
        return vecdot(a, b)
    squeeze_a = False
    squeeze_b = False
    if a.ndim == 1:
        a = a[None, :]
        squeeze_a = True
    if b.ndim == 1:
        b = b[:, None]
        squeeze_b = True
    M, K = a.shape[-2], a.shape[-1]
    K2, N = b.shape[-2], b.shape[-1]
    assert K == K2, f"matmul inner dims mismatch {K} vs {K2}"
    if K >= MAX_EXACT_K:
        # K == 2^17 worst case (all digits -128) sums to exactly +2^31 and
        # would overflow the int32 MXU accumulator, so split at the bound too
        # split contraction to preserve exactness
        half = K // 2
        return matmul(a[..., :half], b[..., :half, :]) + matmul(
            a[..., half:], b[..., half:, :]
        )
    if _pallas_mm_enabled(M, K, N):
        from .ops import pallas_ring_mm

        # NOT pre-broadcast: the kernel wrapper keeps 2-D operands SHARED
        # across the batch (one HBM read instead of per-batch/party copies)
        out = pallas_ring_mm.matmul(a, b)
    else:
        batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
        a = jnp.broadcast_to(a, batch + a.shape[-2:])
        b = jnp.broadcast_to(b, batch + b.shape[-2:])
        out = _xla_matmul(a, b)
    if squeeze_a:
        out = out[..., 0, :]
    if squeeze_b:
        out = out[..., 0]
    return out


def matmul_acc(pairs) -> jax.Array:
    """sum_p (A_p @ B_p) mod 2^64 — the Beaver-protocol reconstruction sum.

    Where the fused Pallas kernel applies, all products share ONE int32
    limb-plane accumulator (limb planes are linear before recombination):
    one recombine pass and one u64 output write instead of P of each plus
    P-1 intermediate adds. Exactness needs the accumulated contraction
    sum_p K_p * 2^14 < 2^31, i.e. total K < MAX_EXACT_K. Falls back to
    summed ring.matmul calls (CPU backend, ragged Ks, 1-D operands,
    or an over-deep contraction)."""
    pairs = [(jnp.asarray(a), jnp.asarray(b)) for a, b in pairs]
    if len(pairs) == 1:
        return matmul(*pairs[0])
    fusable = all(a.ndim >= 2 and b.ndim >= 2 for a, b in pairs)
    if fusable:
        ks = {a.shape[-1] for a, _ in pairs}
        ms = {a.shape[-2] for a, _ in pairs}
        ns = {b.shape[-1] for _, b in pairs}
        fusable = (
            len(ks) == 1
            and len(ms) == 1
            and len(ns) == 1
            and all(a.shape[-1] == b.shape[-2] for a, b in pairs)
        )
        if fusable:
            (k,), (m,), (n,) = ks, ms, ns
            fusable = len(pairs) * k < MAX_EXACT_K and _pallas_mm_enabled(m, k, n)
    if fusable:
        from .ops import pallas_ring_mm

        return pallas_ring_mm.matmul_acc(pairs)
    out = matmul(*pairs[0])
    for a, b in pairs[1:]:
        out = out + matmul(a, b)
    return out


def _xla_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """The portable XLA limb path (batch dims already broadcast)."""
    batch = a.shape[:-2]
    M, K = a.shape[-2], a.shape[-1]
    N = b.shape[-1]
    da = _balanced_limbs(a)           # (..., M, K, 8)
    db = _balanced_limbs(b)           # (..., K, N, 8)
    # lay limbs out as (..., 8*M, K) and (..., K, 8*N)
    da = jnp.moveaxis(da, -1, -3)     # (..., 8, M, K)
    db = jnp.moveaxis(db, -1, -3)     # (..., 8, K, N)
    da = da.reshape(batch + (N_LIMBS * M, K))
    db = jnp.moveaxis(db, -3, -2)     # (..., K, 8, N)
    db = db.reshape(batch + (K, N_LIMBS * N))
    nb = len(batch)
    planes = lax.dot_general(
        da,
        db,
        dimension_numbers=(((nb + 1,), (nb,)), (tuple(range(nb)), tuple(range(nb)))),
        preferred_element_type=jnp.int32,
    )                                  # (..., 8M, 8N)
    planes = planes.reshape(batch + (N_LIMBS, M, N_LIMBS, N))
    perm = tuple(range(nb)) + (nb + 1, nb + 3, nb, nb + 2)
    planes = jnp.transpose(planes, perm)           # (..., M, N, 8_i, 8_j)
    return _combine_planes(planes)


def vecdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """1-D dot product in the ring."""
    return matmul(a[None, :], b[:, None])[0, 0]


def matmul_public(a_shared: jax.Array, b_public: jax.Array) -> jax.Array:
    """shared (uint64) @ public — still a ring matmul; same kernel."""
    return matmul(a_shared, to_ring(b_public))


def _conv_limb_planes(x, w, conv_fn):
    """Generic limb-plane conv: conv_fn maps (x_i8, w_i8) -> int32 map."""
    dx = _balanced_limbs(x)   # (..., 8) appended
    dw = _balanced_limbs(w)
    outs = None
    for i in range(N_LIMBS):
        for j in range(N_LIMBS - i):
            plane = conv_fn(dx[..., i], dw[..., j])  # int32
            contrib = plane.astype(jnp.int64).view(jnp.uint64) << jnp.uint64(
                8 * (i + j)
            )
            outs = contrib if outs is None else outs + contrib
    return outs


def conv2d(x, w, stride=1, padding=0, dilation=1, groups=1):
    """uint64 ring conv2d (NCHW x OIHW) matching torch.conv2d semantics."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)

    def cf(xi, wi):
        return lax.conv_general_dilated(
            xi.astype(jnp.int8),
            wi.astype(jnp.int8),
            window_strides=stride,
            padding=[(padding[0], padding[0]), (padding[1], padding[1])],
            rhs_dilation=dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )

    return _conv_limb_planes(x, w, cf)


def conv1d(x, w, stride=1, padding=0, dilation=1, groups=1):
    if isinstance(stride, int):
        stride = (stride,)
    if isinstance(padding, int):
        padding = (padding,)
    if isinstance(dilation, int):
        dilation = (dilation,)

    def cf(xi, wi):
        return lax.conv_general_dilated(
            xi.astype(jnp.int8),
            wi.astype(jnp.int8),
            window_strides=stride,
            padding=[(padding[0], padding[0])],
            rhs_dilation=dilation,
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )

    return _conv_limb_planes(x, w, cf)


def conv_transpose2d(x, w, stride=1, padding=0, output_padding=0, dilation=1, groups=1):
    """uint64 ring conv_transpose2d matching torch semantics (IOHW weights)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(output_padding, int):
        output_padding = (output_padding, output_padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if groups != 1:
        raise NotImplementedError("grouped conv_transpose not implemented")

    def cf(xi, wi):
        # torch conv_transpose2d == gradient of conv2d: lhs-dilate input,
        # pad with (k-1)*d - p, convolve with spatially-flipped swapped kernel
        kh, kw = wi.shape[-2], wi.shape[-1]
        wi_f = jnp.flip(wi, axis=(-2, -1)).swapaxes(0, 1)  # IOHW -> OIHW flipped
        ph = dilation[0] * (kh - 1) - padding[0]
        pw = dilation[1] * (kw - 1) - padding[1]
        return lax.conv_general_dilated(
            xi.astype(jnp.int8),
            wi_f.astype(jnp.int8),
            window_strides=(1, 1),
            padding=[(ph, ph + output_padding[0]), (pw, pw + output_padding[1])],
            lhs_dilation=stride,
            rhs_dilation=dilation,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.int32,
        )

    return _conv_limb_planes(x, w, cf)


def conv_transpose1d(x, w, stride=1, padding=0, output_padding=0, dilation=1, groups=1):
    if isinstance(stride, int):
        stride = (stride,)
    if isinstance(padding, int):
        padding = (padding,)
    if isinstance(output_padding, int):
        output_padding = (output_padding,)
    if isinstance(dilation, int):
        dilation = (dilation,)
    if groups != 1:
        raise NotImplementedError("grouped conv_transpose not implemented")

    def cf(xi, wi):
        k = wi.shape[-1]
        wi_f = jnp.flip(wi, axis=(-1,)).swapaxes(0, 1)
        p = dilation[0] * (k - 1) - padding[0]
        return lax.conv_general_dilated(
            xi.astype(jnp.int8),
            wi_f.astype(jnp.int8),
            window_strides=(1,),
            padding=[(p, p + output_padding[0])],
            lhs_dilation=stride,
            rhs_dilation=dilation,
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.int32,
        )

    return _conv_limb_planes(x, w, cf)
