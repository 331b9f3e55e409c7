#!/usr/bin/env python3
"""On-device validation + timing of the multi-pair fused ring matmul
(ops/pallas_ring_mm.matmul_acc): bit-exactness vs summed single matmuls at
the protocol-hot shapes, then wall-clock comparison at the GPT-2 lm-head
shape (the masked protocol's 3-pair reconstruction vs 3 separate kernels).

Timing is device-synchronized the honest way (on-device reduce + host
scalar fetch — block_until_ready returns early on axon)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from curl_tpu import ring
from curl_tpu.ops import pallas_ring_mm as pmm


def rand_u64(rng, shape):
    return jnp.asarray(rng.integers(0, 1 << 64, size=shape, dtype=np.uint64))


def sync(x):
    return int(np.asarray(jax.device_get(jax.jit(lambda v: v.sum())(x))))


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # -- exactness at protocol shapes ------------------------------------
    for n_pairs, M, K, N in [(2, 64, 768, 1024), (3, 64, 768, 1024),
                             (3, 65, 700, 300), (2, 8, 96, 40)]:
        pairs = [(rand_u64(rng, (M, K)), rand_u64(rng, (K, N)))
                 for _ in range(n_pairs)]
        ref = ring.matmul(*pairs[0])
        for a, b in pairs[1:]:
            ref = ref + ring.matmul(a, b)
        got = pmm.matmul_acc(pairs)
        ok = bool(jnp.all(got == ref))
        print(f"pairs={n_pairs} ({M},{K})@({K},{N}): exact={ok}")
        assert ok

    # -- timing at the lm-head shape (x2 party batch) --------------------
    B, M, K, N = 2, 64, 768, 50432
    pairs = [(rand_u64(rng, (B, M, K)), rand_u64(rng, (B, K, N)))
             for _ in range(3)]

    fused = jax.jit(lambda p: pmm.matmul_acc(p))
    sep = jax.jit(
        lambda p: pmm.matmul(*p[0]) + pmm.matmul(*p[1]) + pmm.matmul(*p[2])
    )
    for name, fn in [("separate x3", sep), ("fused 3-pair", fused)]:
        out = fn(pairs)
        sync(out)  # compile + first run
        ts = []
        for _ in range(3):
            t0 = time.time()
            sync(fn(pairs))
            ts.append(time.time() - t0)
        print(f"{name}: {min(ts)*1e3:.1f} ms  (all {[f'{t*1e3:.1f}' for t in ts]})")


if __name__ == "__main__":
    main()
