"""Beaver-triple protocols + Curl's LUT protocols, TPU-native.

Rebuild of the reference beaver module (reference:
curl/mpc/primitives/beaver.py). Every protocol here costs exactly the same
number of communication rounds as the reference:

  mul/matmul/conv   1 batched reveal          (beaver.py:78-87)
  square            1 reveal                  (beaver.py:114)
  egk_trunc_pr      1 reveal                  (beaver.py:172-210, EGK+20 Fig.10)
  evaluate_lut      1 reveal, any table size  (beaver.py:213-247)
  evaluate_bior_lut 1 reveal + 1 Beaver mul + 1 EGK trunc  (beaver.py:250-294)
  evaluate_embed    1 reveal + ring matmul    (beaver.py:297-333)
  AND               1 batched reveal          (beaver.py:336)
  B2A_single_bit    1 reveal                  (beaver.py:358)

TPU-first detail: the LUT gather is reformulated. The reference gathers the
(N, L) secret one-hot at rotated indices then dots with the public table
(beaver.py:237-241). Algebraically identical and far cheaper on TPU is to
gather the *public* L-entry table at rotated indices —
    result[n] = sum_j onehot_r[n, j] * lut[(j + shift_n) mod L]
— a small-table take plus an elementwise multiply-reduce on the VPU, with no
gather of secret data at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import comm
from ... import random as rng
from ... import ring
from ...config import cfg
from ...encoder import FixedPointEncoder
from .arithmetic import ArithmeticSharedTensor


def _provider():
    from .. import get_default_provider

    return get_default_provider()


def _raw(x: ArithmeticSharedTensor) -> ArithmeticSharedTensor:
    """Scale-1 view (the IgnoreEncodings context of the reference)."""
    return ArithmeticSharedTensor(x.share, FixedPointEncoder(0))


def _beaver_protocol(op, x, y, **kwargs):
    """z = c + eps*b + a*delta + eps*delta with one batched reveal."""
    provider = _provider()
    a, b, c = provider.generate_additive_triple(
        x.shape, y.shape, op, **kwargs
    )

    if cfg.mpc.active_security:
        # SPDZ-style sacrifice check (beaver.py:58-76): verify (a, b, c)
        # against a second triple (f, g, h) at a random multiplier t.
        f, g, h = provider.generate_additive_triple(x.shape, y.shape, op, **kwargs)
        t = ArithmeticSharedTensor.PRSS(a.shape)
        t_plain = _raw(t).reveal()
        rho = comm.all_sum(t_plain * a.share - f.share)
        sigma = comm.all_sum(b.share - g.share)
        check = t_plain * c.share - h.share - sigma * f.share - rho * g.share
        check = comm.all_sum(check) - rho * sigma
        # Branchless failure: poison the output share so a tampered triple
        # can never yield a correct result (jit-compatible alternative to
        # the reference's raise).
        bad = jnp.any(check != 0)
        poison = jnp.where(bad, rng.random_ring(c.shape, "local"), jnp.uint64(0))
        c = c.with_share(c.share + poison)

    eps_share = x.share - a.share
    delta_share = y.share - b.share
    epsilon, delta = comm.all_sum([eps_share, delta_share])

    # z = c + eps*b + x*delta: algebraically identical to the reference's
    # c + eps*b + a*delta + (rank0) eps*delta (beaver.py:83-85) since
    # x = a + eps, but costs TWO ring products instead of three — on TPU
    # each is a full int8-limb MXU pass (ring.py), so this is a 1/3 cut of
    # the protocol's matmul/conv work. sum_p x_p = x makes the x*delta term
    # self-correcting: no rank-0 public-term mask needed.
    if op == "matmul" and x.ndim >= 2:
        # both products share one fused kernel pass (one limb-plane
        # accumulator, one recombine, one output write — ring.matmul_acc)
        z = c.share + ring.matmul_acc([(epsilon, b.share), (x.share, delta)])
        return ArithmeticSharedTensor(z, x.encoder)
    ring_op = _RING_OPS[op]
    z = c.share
    z = z + ring_op(epsilon, b.share, **kwargs)
    z = z + ring_op(x.share, delta, **kwargs)
    return ArithmeticSharedTensor(z, x.encoder)


_RING_OPS = {
    "mul": lambda a, b, **kw: a * b,
    "matmul": ring.matmul,
    "conv1d": ring.conv1d,
    "conv2d": ring.conv2d,
    "conv_transpose1d": ring.conv_transpose1d,
    "conv_transpose2d": ring.conv_transpose2d,
}


@jax.tree_util.register_pytree_node_class
class MaskedArithmetic(ArithmeticSharedTensor):
    """A secret operand pre-masked for Beaver-triple reuse.

    When the SAME secret tensor y multiplies many different x's (the LM-head
    weight across position chunks at batch >= 2, a decode loop's weights),
    the standard protocol wastes a y-sized mask draw, its PRZS sharing, and
    a y-sized reveal PER PRODUCT. Masking once — draw b, reveal
    delta = y - b — is simulatable exactly like a single Beaver product
    (delta is one-time-padded by b; each later product only reveals a fresh
    eps_i = x_i - a_i), the classic reusable-mask optimization of
    SecureML/DELPHI-style inference. Each product then needs only the fresh
    input-sized a_i and the dealer product c_i = a_i (op) b.

    ``b_plain`` is the dealer's lane-local draw (TFP semantics: only rank
    0's draw enters any share sum, exactly like tfp_provider sampling).
    ``share`` reconstructs a valid ordinary share of y (b_p + rank0*delta),
    so every non-product op falls back transparently.
    """

    __slots__ = ("b_plain", "b_share", "delta")

    def __init__(self, b_plain, b_share, delta, encoder):
        self.b_plain = b_plain
        self.b_share = b_share
        self.delta = delta
        self.encoder = encoder

    def tree_flatten(self):
        return (self.b_plain, self.b_share, self.delta), (
            self.encoder.precision_bits,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, FixedPointEncoder(aux[0]))

    @property
    def share(self):
        return self.b_share + _rank0(self.delta)

    @property
    def shape(self):
        return self.b_share.shape

    @property
    def ndim(self):
        return self.b_share.ndim

    def t(self):
        return MaskedArithmetic(
            self.b_plain.T, self.b_share.T, self.delta.T, self.encoder
        )

    def transpose(self, d0, d1):
        sw = lambda v: jnp.swapaxes(v, d0, d1)  # noqa: E731
        return MaskedArithmetic(
            sw(self.b_plain), sw(self.b_share), sw(self.delta), self.encoder
        )

    def with_share(self, share) -> ArithmeticSharedTensor:
        return ArithmeticSharedTensor(share, self.encoder)


def mask_operand(y: ArithmeticSharedTensor):
    """Pre-mask ``y`` for product reuse, or return it unchanged when the
    reuse pattern does not apply: non-TFP providers (their dealer semantics
    differ), active security (the sacrifice check needs full triples), and
    the tuple-cache flows (the positional offline stream has no mask
    identity — and the gate must agree between the cache RECORDING trace
    and the SERVING trace, so it keys on the cache session, not on runtime
    kernel state)."""
    provider = _provider()
    if (
        getattr(provider, "NAME", None) != "TFP"
        or provider.tracing
        or provider._serving_cache is not None
        or cfg.mpc.active_security
    ):
        return y
    b = rng.random_ring(y.shape, rng.dealer_stream())
    b_share = rng.przs_share(b)
    delta = comm.all_sum(y.share - b_share)
    return MaskedArithmetic(b, b_share, delta, y.encoder)


def _masked_protocol(op, x, y: MaskedArithmetic, **kwargs):
    """One product against a pre-masked operand: fresh input-sized a only."""
    ring_op = _RING_OPS[op]
    a = rng.random_ring(x.shape, rng.dealer_stream())
    if op == "matmul" and x.ndim >= 2 and y.ndim >= 2:
        # all three products — the dealer product a@b_plain (rank-0 masked
        # on the LEFT operand: mask*(a@b) == (mask*a)@b), eps@b_share, and
        # x@delta — land in one fused kernel pass (ring.matmul_acc). Same
        # RNG draw order as the generic path below: a, PRZS(x), PRZS(out).
        batch = np.broadcast_shapes(x.shape[:-2], y.shape[:-2])
        out_shape = batch + (x.shape[-2], y.shape[-1])
        a_share = rng.przs_share(a)
        c_share = rng.przs_arithmetic(out_shape)
        if comm.get_world_size() > 1:
            mask = (comm.rank_signed() == 0).astype(jnp.uint64)
            a_eff = a * mask
        else:
            a_eff = a
        epsilon = comm.all_sum(x.share - a_share)
        z = c_share + ring.matmul_acc(
            [(a_eff, y.b_plain), (epsilon, y.b_share), (x.share, y.delta)]
        )
        return ArithmeticSharedTensor(z, x.encoder)
    c = ring_op(a, y.b_plain, **kwargs)  # dealer product (lane-local draw)
    a_share = rng.przs_share(a)
    c_share = rng.przs_share(c)
    epsilon = comm.all_sum(x.share - a_share)
    z = c_share + ring_op(epsilon, y.b_share, **kwargs)
    z = z + ring_op(x.share, y.delta, **kwargs)
    return ArithmeticSharedTensor(z, x.encoder)


def mul(x, y):
    if isinstance(y, MaskedArithmetic):
        return _masked_protocol("mul", x, y)
    return _beaver_protocol("mul", x, y)


def matmul(x, y):
    if isinstance(y, MaskedArithmetic):
        return _masked_protocol("matmul", x, y)
    return _beaver_protocol("matmul", x, y)


def conv1d(x, y, **kwargs):
    if isinstance(y, MaskedArithmetic):
        return _masked_protocol("conv1d", x, y, **kwargs)
    return _beaver_protocol("conv1d", x, y, **kwargs)


def conv2d(x, y, **kwargs):
    if isinstance(y, MaskedArithmetic):
        return _masked_protocol("conv2d", x, y, **kwargs)
    return _beaver_protocol("conv2d", x, y, **kwargs)


def conv_transpose1d(x, y, **kwargs):
    if isinstance(y, MaskedArithmetic):
        return _masked_protocol("conv_transpose1d", x, y, **kwargs)
    return _beaver_protocol("conv_transpose1d", x, y, **kwargs)


def conv_transpose2d(x, y, **kwargs):
    if isinstance(y, MaskedArithmetic):
        return _masked_protocol("conv_transpose2d", x, y, **kwargs)
    return _beaver_protocol("conv_transpose2d", x, y, **kwargs)


def square(x):
    """z = r2 + 2*eps*r + eps^2, one reveal (beaver.py:114-127)."""
    provider = _provider()
    r, r2 = provider.square(x.shape)
    epsilon = comm.all_sum(x.share - r.share)
    z = r2.share + ring.scalar(2) * r.share * epsilon
    pub = epsilon * epsilon
    if comm.get_world_size() > 1:
        mask = (comm.rank_signed() == 0).astype(jnp.uint64)
        pub = pub * mask
    return ArithmeticSharedTensor(z + pub, x.encoder)


def wraps(x):
    """Wrap-count protocol (beaver.py:130-157): [theta_x] = theta_z +
    [beta_xr] - [theta_r] (eta term dropped whp)."""
    provider = _provider()
    r, theta_r = provider.wrap_rng(x.shape)
    beta_xr = ring.count_wraps(jnp.stack([x.share, r.share], axis=0))

    z_share = x.share + r.share
    z_stack = comm.all_gather_stack(z_share)  # (P, ...)
    theta_z = ring.count_wraps(z_stack)
    theta_x = beta_xr - theta_r.share
    if comm.get_world_size() > 1:
        mask = (comm.rank_signed() == 0).astype(jnp.uint64)
        theta_x = theta_x + mask * theta_z
    else:
        theta_x = theta_x + theta_z
    return ArithmeticSharedTensor(theta_x, FixedPointEncoder(0))


def truncate(x, y: int):
    """Public-divisor truncation with wrap correction for >2PC
    (beaver.py:160-169)."""
    wrap_count = wraps(x)
    share = ring.trunc_div_signed(x.share, y)
    correction = wrap_count.share * ring.scalar(4 * ((1 << 62) // y))
    return ArithmeticSharedTensor(share - correction, x.encoder)


def egk_trunc_pr(x, l: int, m: int):
    """EGK+20 Fig.10 probabilistic truncation, one reveal
    (beaver.py:172-210). Bit-exact port of the arithmetic."""
    provider = _provider()
    k = 64
    r, r_p, b = provider.egk_trunc_pr_rng(x.shape, l, m)
    two_to_l = ring.scalar(1 << l)

    # Step 1: mask and reveal c
    a_p = x.share + _public_const(1 << (l - 1), x.shape)
    rpp = ring.scalar(1 << m) * r.share + r_p.share
    enc_c = ring.scalar(1 << (k - l - 1)) * (a_p + two_to_l * b.share + rpp)
    c = comm.all_sum(enc_c)
    c_p = ring.shift_right_arith(c, k - l - 1)

    # Step 2: strip the masking bit
    c_pl = (ring.shift_right_arith(c_p, l)) & jnp.uint64(1)
    # v = b + c_pl - 2 b c_pl  (arithmetic XOR; c_pl public)
    v = b.share + _rank0(c_pl) - ring.scalar(2) * b.share * c_pl

    # Step 3: reconstruct the truncation
    c_p_mod = jnp.mod(ring.to_signed(c_p), ring.to_signed(two_to_l)).view(jnp.uint64)
    pub_tail = ring.signed_floordiv_pow2(c_p_mod, m)
    y_share = (
        ring.scalar(1 << (l - m)) * v
        - r.share
        - _public_const(1 << (l - m - 1), x.shape)
        + _rank0(pub_tail)
    )
    return ArithmeticSharedTensor(y_share, x.encoder)


def _public_const(value: int, shape):
    """Additive public constant: contributed by rank 0 only."""
    c = ring.const(value, shape)
    if comm.get_world_size() > 1:
        mask = (comm.rank_signed() == 0).astype(jnp.uint64)
        return mask * c
    return c


def _rank0(arr):
    if comm.get_world_size() > 1:
        mask = (comm.rank_signed() == 0).astype(jnp.uint64)
        return mask * arr
    return arr


# ---------------------------------------------------------------------------
# LUT protocols — Curl's signature primitives
# ---------------------------------------------------------------------------

def _lut_open_shift(x_flat, size: int):
    """Generate one-hot mask, reveal (x - r) mod size. One round."""
    provider = _provider()
    r, one_hot_r = provider.generate_one_hot(x_flat.shape, size)
    z = comm.all_sum(x_flat.share - r.share)
    shift = jnp.mod(ring.to_signed(z), jnp.int64(size)).astype(jnp.int32)
    return one_hot_r, shift


def _onehot_fast_available() -> bool:
    """Gate for the direct rotated-one-hot construction (TFP dealer-trust
    fast path): TFP + beaver + passive + 2PC + the vmap simulated-party
    runtime. Like the fused kernels (ops/pallas_mul.py:fused_available),
    deliberately NOT gated on the tuple cache: the path makes no provider
    requests, so it engages identically in the cache RECORDING trace and
    the SERVING trace. cfg.mpc.fused_onehot=False forces the tuple-based
    gather form (used by the conformance tests)."""
    try:
        if cfg.mpc.fused_onehot is False:
            return False
    except AttributeError:
        pass
    try:
        if cfg.mpc.active_security or cfg.mpc.protocol != "beaver":
            return False
    except AttributeError:
        pass
    provider = _provider()
    return (
        getattr(provider, "NAME", None) == "TFP"
        and comm.get_world_size() == 2
        and comm.get_runtime() == "vmap"
    )


def _rotated_onehot_fast(x_flat, size: int):
    """Share of onehot(x mod size) WITHOUT materializing + gathering the
    rotated tuple one-hot.

    The tuple path holds share[n, j] = PRZS[n, j] + rank0*onehot(r)[n, j]
    and gathers it at (j - shift_n) mod size — an (N, size) dynamic gather
    along lanes, miserable on TPU. But a public per-row rotation of a PRZS
    field is itself a PRZS field, so the rotated share can be built
    directly: fresh PRZS plus rank0*onehot((r + shift) mod size), where
    r + shift = x (mod size). Same wire messages (the one revealed value
    is the same z = x - r; one round, counted by comm.all_sum), same share
    distribution (uniform mask + data one-hot); the in-trace index
    reconstruction sits squarely inside the TFP dealer-trust model the
    fused kernels already use (the TFP dealer knows every tuple plaintext
    and therefore x = r + shift by construction — reference
    tfp_provider.py:17 documents the same trust).
    Reference protocol being accelerated: beaver.py:297-333.
    """
    from ... import random as rng_mod

    # same draw pattern as the tuple dealer (accounting + stream parity)
    r = rng_mod.random_ring(x_flat.shape, rng_mod.dealer_stream())
    r_clear = jnp.mod(ring.to_signed(r), jnp.int64(size))
    r_share = rng_mod.przs_share(r_clear.view(jnp.uint64))
    z = comm.all_sum(x_flat.share - r_share)
    shift = jnp.mod(ring.to_signed(z), jnp.int64(size))
    x_idx = jnp.mod(r_clear + shift, jnp.int64(size)).astype(jnp.int32)
    grid = jnp.arange(size, dtype=jnp.int32)
    onehot = (x_idx[:, None] == grid[None, :]).astype(jnp.uint64)
    # (N, size) sharing: the fused kernel's per-lane-plain path (onehot
    # depends on the revealed shift, so it is lane-batched under vmap)
    oh_share = rng_mod.przs_share(onehot)
    return oh_share


def _lut_fastpath_available() -> bool:
    """The gather-form LUT tuple (provider.generate_lut_masks) collapses the
    (N, L) one-hot work to O(N); available for dealers whose tuple plaintext
    is local to rank 0 (TFP). cfg.mpc.lut_fastpath=False forces the
    reference one-hot-dot form (used by the round/shape conformance tests).
    """
    try:
        enabled = bool(cfg.mpc.lut_fastpath)
    except (AttributeError, TypeError):
        enabled = True
    return enabled and hasattr(_provider(), "generate_lut_masks")


def _lut_gather_fast(x_flat, luts_rows, size: int):
    """Evaluate [T[(x) mod L] for T in luts_rows] in gather form.

    Identical round/byte profile to the one-hot form for the table part
    (one batched reveal of (x - r)); the output share is an output-shaped
    PRZS mask plus — on rank 0 only, which knows the tuple plaintext r —
    the public-table gather at (r + shift) mod L. See
    TrustedFirstParty.generate_lut_masks for the algebra.
    """
    provider = _provider()
    r_clear, r_share, masks = provider.generate_lut_masks(
        x_flat.shape, size, len(luts_rows)
    )
    z = comm.all_sum(x_flat.share - r_share.share)
    shift = jnp.mod(ring.to_signed(z), jnp.int64(size)).astype(jnp.int32)
    idx = jnp.mod(r_clear + shift, jnp.int32(size))
    outs = []
    for i, row in enumerate(luts_rows):
        gathered = jnp.take(ring.to_ring(jnp.asarray(row)), idx, axis=0)
        outs.append(masks[i] + _rank0(gathered))
    return outs


def _lut_chunk_elements() -> int:
    """Memory bound for the (N, L) one-hot intermediates (elements).

    Default effectively disables chunking: the lax.map chunked form was
    observed to break the remote TPU compiler in this environment (every
    post-chunking compile SIGKILLed while identical-scale unchunked
    programs compiled fine). Set mpc.lut_chunk_elements to enable for
    batch-scale runs once the compiler issue is resolved (round-2 item).
    """
    try:
        return int(cfg.mpc.lut_chunk_elements)
    except (AttributeError, TypeError):
        return 1 << 31


def _chunked_lut_sum(x_flat, luts_rows, size: int):
    """Evaluate sum_j onehot_r[n,j] * lut_row[(j + shift_n) % L] for one or
    two public table rows, chunking N so the (chunk, L) one-hot and rotated
    tables never exceed the memory bound.

    Round-preserving: the single reveal opens the full (N,) shift vector;
    only the LOCAL one-hot construction + gather + dot are chunked (the
    TFP mask is PRZS + rank-0 one-hot, both recomputable per chunk with a
    forked key stream). Falls back to the unchunked path for providers
    whose mask distribution needs communication (TTP).
    """
    from ... import random as rng_mod

    n = x_flat.shape[0]
    limit = _lut_chunk_elements()
    provider = _provider()
    chunkable = (
        provider.NAME == "TFP"
        and getattr(provider, "_serving_cache", None) is None
        and n * size > limit
        and n > 1
    )
    if not chunkable:
        one_hot_r, shift = _lut_open_shift(x_flat, size)
        rots = [_rotated_table(row, shift, size) for row in luts_rows]
        return [jnp.sum(one_hot_r.share * rot, axis=1) for rot in rots]

    # ---- chunked TFP path ----
    chunk = max(limit // size, 1)
    n_chunks = -(-n // chunk)
    n_pad = n_chunks * chunk

    # draw r exactly as generate_one_hot does, reveal shift in ONE round
    r = rng_mod.random_ring((n,), rng_mod.dealer_stream())
    r_clear = jnp.mod(ring.to_signed(r), jnp.int64(size))
    r_share = rng_mod.przs_share(r_clear.view(jnp.uint64))
    z = comm.all_sum(x_flat.share - r_share)
    shift = jnp.mod(ring.to_signed(z), jnp.int64(size)).astype(jnp.int32)

    r_clear_p = jnp.pad(r_clear, (0, n_pad - n))
    shift_p = jnp.pad(shift, (0, n_pad - n))
    grid = jnp.arange(size, dtype=jnp.int64)
    luts_stack = jnp.stack([ring.to_ring(row) for row in luts_rows])

    def body(inputs):
        rc, sh, idx = inputs
        with rng_mod.fork(idx):
            onehot = (rc[:, None] == grid).astype(jnp.uint64)
            oh_share = rng_mod.przs_share(onehot)
            j = jnp.arange(size, dtype=jnp.int32)[None, :]
            gidx = jnp.mod(j + sh[:, None], size)
            outs = []
            for li in range(len(luts_rows)):
                rot = jnp.take(luts_stack[li], gidx, axis=0)
                outs.append(jnp.sum(oh_share * rot, axis=1))
        return jnp.stack(outs)

    import jax as _jax

    results = _jax.lax.map(
        body,
        (
            r_clear_p.reshape(n_chunks, chunk),
            shift_p.reshape(n_chunks, chunk),
            jnp.arange(n_chunks),
        ),
    )  # (n_chunks, n_rows, chunk)
    flat = jnp.moveaxis(results, 1, 0).reshape(len(luts_rows), n_pad)[:, :n]
    return [flat[i] for i in range(len(luts_rows))]


def _rotated_table(lut, shift, size: int):
    """public table gathered at (j + shift_n) mod size -> (N, L)."""
    j = jnp.arange(size, dtype=jnp.int32)[None, :]
    idx = jnp.mod(j + shift[:, None], size)
    return jnp.take(ring.to_ring(lut), idx, axis=0)


def evaluate_lut(x, lut):
    """result[n] = sum_j onehot_r[n,j] * lut[(j + shift_n) mod L]
    (beaver.py:213-247, reformulated for public-side gather)."""
    lut = ring.to_ring(jnp.asarray(lut))
    size = lut.shape[0]
    shape = x.shape
    x_flat = x.with_share(x.share.reshape(-1))
    if _lut_fastpath_available():
        (result,) = _lut_gather_fast(x_flat, [lut], size)
    else:
        (result,) = _chunked_lut_sum(x_flat, [lut], size)
    return ArithmeticSharedTensor(result.reshape(shape), x.encoder)


def evaluate_bior_lut(x, luts, scale, bias: int):
    """Two-bank LUT + private linear interpolation (beaver.py:250-294):
    (lut1 - lut0) * scale + 2^bias * lut0, then EGK-truncate by 2*bias."""
    luts = ring.to_ring(jnp.asarray(luts))      # (2, L)
    size = luts.shape[1]
    shape = x.shape
    x_flat = x.with_share(x.share.reshape(-1))
    if _lut_fastpath_available():
        lut0, lut1 = _lut_gather_fast(x_flat, [luts[0], luts[1]], size)
    else:
        lut0, lut1 = _chunked_lut_sum(x_flat, [luts[0], luts[1]], size)

    scaling = _raw(
        ArithmeticSharedTensor(scale.share.reshape(-1), scale.encoder)
    )
    diff = ArithmeticSharedTensor(lut1 - lut0, FixedPointEncoder(0))
    prod = mul(diff, scaling)  # Beaver mul, no rescale (scale-1 encodings)
    combined = prod.share + ring.scalar(1 << bias) * lut0
    out = egk_trunc_pr(
        ArithmeticSharedTensor(combined, FixedPointEncoder(0)), 62, 2 * bias
    )
    return ArithmeticSharedTensor(out.share.reshape(shape), x.encoder)


def evaluate_embed(x, embed):
    """Private embedding lookup: rotated one-hot (secret-shared) matmul with
    the shared embedding matrix (beaver.py:297-333).

    Unlike evaluate_lut, the table itself is secret-shared here, so the
    gather-the-public-table trick does not apply; instead the (N, V) one-hot
    share is gathered at rotated indices and fed to the ring matmul
    (one int8-limb MXU pass). ``embed`` may be an ArithmeticSharedTensor, a
    raw share array, or a Beaver-masked table (MaskedArithmetic) — the
    masked form reuses its (V, d)-sized mask across every lookup in a
    chunk/decode scan.
    """
    if isinstance(embed, MaskedArithmetic):
        embed_t = embed
        size = embed.b_share.shape[0]
        dim = embed.b_share.shape[1]
    else:
        share = embed.share if hasattr(embed, "share") else embed
        share = ring.to_ring(share)
        embed_t = ArithmeticSharedTensor(share, FixedPointEncoder(0))
        size, dim = share.shape
    shape = x.shape + (dim,)
    x_flat = x.with_share(x.share.reshape(-1))
    if _onehot_fast_available():
        rotated = _rotated_onehot_fast(x_flat, size)
    else:
        one_hot_r, shift = _lut_open_shift(x_flat, size)
        j = jnp.arange(size, dtype=jnp.int32)[None, :]
        idx = jnp.mod(j - shift[:, None], size)
        rotated = jnp.take_along_axis(one_hot_r.share, idx, axis=1)
    # private x private matmul: the rotated one-hot and the embedding matrix
    # are both secret-shared -> Beaver matmul (reference beaver.py:328 runs
    # the same through ArithmeticSharedTensor.matmul)
    from .arithmetic import _get_protocol

    rotated_t = ArithmeticSharedTensor(rotated, FixedPointEncoder(0))
    if isinstance(embed_t, MaskedArithmetic):
        lookup = _masked_protocol("matmul", rotated_t, embed_t)
    else:
        # protocol-dispatched (replicated.py re-exports this function; its
        # RSS runtime must keep using its own matmul)
        lookup = _get_protocol().matmul(rotated_t, embed_t)
    return ArithmeticSharedTensor(lookup.share.reshape(shape), FixedPointEncoder(0))


def evaluate_embed_chunked(x, table_chunks, v_real: int, dim: int,
                           salt: int = 12 << 20):
    """Private embedding lookup against a VOCAB-SLICED secret table.

    The standard evaluate_embed materializes table-sized Beaver masks for
    the one-hot matmul — at GPT-Neo scale that is several (50257, 2048)
    uint64 temporaries per lane, which alone overflows HBM. Algebraically
    the lookup factorizes over vocab slices:

        onehot @ T = sum_i onehot[:, i*Vc:(i+1)*Vc] @ T_i

    so the rotated one-hot (cheap, (N, V_pad)) is built ONCE and the
    chunk products run under one lax.scan — per-iteration live set is
    chunk-sized. ``table_chunks`` is a list-like of n ArithmeticSharedTensor
    (or seed-compressed) chunks of shape (Vc, dim), stacked as a pytree
    with leading axis n (the PrestackedBlocks pattern); vocab padding rows
    must be zero so pad lanes contribute nothing.
    """
    from jax import lax

    from ... import random as rng_mod

    n_chunks = jax.tree_util.tree_leaves(table_chunks)[0].shape[0]
    vc = None
    shape = x.shape + (dim,)
    x_flat = x.with_share(x.share.reshape(-1))
    N = x_flat.shape[0]
    v_pad = None

    # chunk geometry from the stacked tree: leaf (n, Vc, dim)
    for leaf in jax.tree_util.tree_leaves(table_chunks):
        if leaf.ndim >= 3 and leaf.shape[-1] == dim:
            vc = leaf.shape[-2]
            break
    assert vc is not None, "table_chunks carries no (n, Vc, dim) leaf"
    v_pad = n_chunks * vc
    assert v_real <= v_pad, (v_real, v_pad)

    if _onehot_fast_available():
        rotated = _rotated_onehot_fast(x_flat, v_pad)
    else:
        one_hot_r, shift = _lut_open_shift(x_flat, v_pad)
        j = jnp.arange(v_pad, dtype=jnp.int32)[None, :]
        idx = jnp.mod(j - shift[:, None], v_pad)
        rotated = jnp.take_along_axis(one_hot_r.share, idx, axis=1)

    def body(carry, inp):
        w_i, i = inp
        with rng_mod.fork(i + salt):
            sl = lax.dynamic_slice_in_dim(rotated, i * vc, vc, 1)
            sl_t = ArithmeticSharedTensor(sl, FixedPointEncoder(0))
            t_i = w_i._tensor if hasattr(w_i, "_tensor") else w_i
            part = matmul(sl_t, t_i)
        return carry + part.share, None

    init = jnp.zeros((N, dim), jnp.uint64)
    acc, _ = lax.scan(body, init, (table_chunks, jnp.arange(n_chunks)))
    return ArithmeticSharedTensor(acc.reshape(shape), FixedPointEncoder(0))


# ---------------------------------------------------------------------------
# Binary Beaver + share conversion helpers
# ---------------------------------------------------------------------------

def AND(x, y):
    """Binary Beaver protocol, one batched reveal (beaver.py:336-355)."""
    from .binary import BinarySharedTensor

    provider = _provider()
    shape = np.broadcast_shapes(x.shape, y.shape)
    xs = jnp.broadcast_to(x.share, shape)
    ys = jnp.broadcast_to(y.share, shape)
    a, b, c = provider.generate_binary_triple(shape, shape)
    epsilon, delta = comm.all_xor([xs ^ a.share, ys ^ b.share])
    # z = c ^ (eps & b) ^ (x & delta): same identity as the arithmetic
    # protocol (x = a ^ eps), one AND-plane fewer and no rank-0 mask
    z = (b.share & epsilon) ^ (xs & delta) ^ c.share
    return BinarySharedTensor(z, x.encoder)


def B2A_single_bit(xB):
    """Convert single-bit binary shares to arithmetic (beaver.py:358-378)."""
    if comm.get_world_size() < 2:
        return ArithmeticSharedTensor(xB.share, FixedPointEncoder(0))
    provider = _provider()
    rA, rB = provider.B2A_rng(xB.shape)
    z = comm.all_xor(xB.share ^ rB.share)
    # rA * (1 - 2z) + z  with z public
    one_minus_2z = ring.scalar(1) - ring.scalar(2) * z
    share = rA.share * one_minus_2z + _rank0(z)
    return ArithmeticSharedTensor(share, FixedPointEncoder(0))
