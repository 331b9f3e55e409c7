"""Hardware-PRNG mask generation (experimental, opt-in).

Each MPC protocol round draws fresh uniform ring elements; with threefry
every draw unrolls to ~200 HLO ops, which dominates XLA compile time for
deep protocols. This kernel generates a uint64 tensor from the TPU's
per-core PRNG (pltpu.prng_random_bits) in ONE op: seed with a 32-bit value
derived from the (key, trace-counter) pair, emit two uint32 planes, and
combine to uint64 outside the kernel (Mosaic has no uint64).

Correlation-correctness requirement: identical seeds must give identical
streams on every party's chip (same libtpu + same hardware generation).
That holds within one deployment; until it is validated across the target
fleet this path stays opt-in (cfg.mpc.prng_impl = "pallas_tpu" — round 2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up(x, m):
    return (x + m - 1) // m * m


def pallas_random_bits_u64(seed_u32, shape):
    """uint64 uniform bits of `shape` from a scalar uint32 seed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    if jax.default_backend() != "tpu":
        raise NotImplementedError(
            "pallas_random_bits_u64 requires a TPU backend (pltpu.prng_seed "
            "has no CPU interpret rule in this JAX version)"
        )

    n = int(np.prod(shape)) if shape else 1
    rows = _round_up(max(n // 128, 1), 8)
    padded = rows * 128

    def kernel(seed_ref, hi_ref, lo_ref):
        pltpu.prng_seed(seed_ref[0])
        hi_ref[:] = pltpu.prng_random_bits((rows, 128))
        lo_ref[:] = pltpu.prng_random_bits((rows, 128))

    hi, lo = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed_u32], dtype=jnp.int32))

    flat = (hi.reshape(-1).astype(jnp.uint64) << jnp.uint64(32)) | lo.reshape(
        -1
    ).astype(jnp.uint64)
    out = flat[:n]
    # pad path: if shape smaller than one row, slicing above handles it
    return out.reshape(shape)


def seed_from_key(key, count: int):
    """Derive the kernel seed from a (typed) PRNG key + trace counter.

    One scalar threefry evaluation — cheap; the bulk generation happens in
    the kernel."""
    sub = jax.random.fold_in(key, count)
    return jax.random.bits(sub, (), dtype=jnp.uint32).astype(jnp.int32)
