#!/usr/bin/env python3
"""On-device validation of the fused PRZS/sharing kernel (ops/pallas_przs.py).

Asserts, on the real TPU:
  1. stream identity: kernel przs == pallas_random_bits_u64(prev_seed)
     - pallas_random_bits_u64(next_seed) (same tile geometry + reseed
     mixing — the documented bit-identity hook);
  2. telescoping: sum of all lanes' kernel przs shares == 0 (ws=2, 3);
  3. dealer sharing: lanes of przs_share sum to the plaintext (shared
     plain AND per-lane plain variants, src=0 and src=1);
  4. determinism: same seeds -> same shares;
  5. end-to-end: a private matmul at a kernel-sized shape decodes
     correctly with the kernel on, and bit-matches... (not required —
     streams differ from the XLA path by design; decode equality to the
     plaintext product is the contract).

Usage: python scripts/validate_przs_kernel.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import curl_tpu
from curl_tpu import comm
from curl_tpu import random as crng
from curl_tpu.ops import pallas_przs
from curl_tpu.ops.pallas_rng import pallas_random_bits_u64
from curl_tpu.parallel import runner


def main():
    assert jax.default_backend() == "tpu", "requires the TPU backend"
    curl_tpu.init(world_size=2, seed=11)
    # the kernel is OPT-IN since the layout finding (przs_kernel_ab.json);
    # force it on for validation
    curl_tpu.cfg.set("mpc.przs_kernel", "pallas_tpu")

    shape = (768, 128)   # 2-D: routes to the native-tiled kernel variant
    shape1d = (131072,)  # 1-D: routes to the flat kernel (pallas_rng tiles)

    # -- 1. stream identity vs composed pallas_rng draws (FLAT path only:
    # the 2-D variant tiles the true shape, so its streams are its own) --
    kp = jax.random.fold_in(jax.random.key(1), 7)
    kn = jax.random.fold_in(jax.random.key(2), 7)
    sp = pallas_przs.seed_pair_from_keys(kp, kn)

    @jax.jit
    def kernel_przs(spv):
        return pallas_przs.pallas_przs_u64(spv, shape1d)

    @jax.jit
    def composed(spv):
        a = pallas_random_bits_u64(spv[0], shape1d)
        b = pallas_random_bits_u64(spv[1], shape1d)
        return a - b

    kz = np.asarray(kernel_przs(sp))
    cz = np.asarray(composed(sp))
    assert (kz == cz).all(), "kernel stream != composed pallas_rng streams"
    print("ok: stream identity (flat kernel == pallas_rng prev - next)")

    # -- 4. determinism ---------------------------------------------------
    kz2 = np.asarray(kernel_przs(sp))
    assert (kz == kz2).all()
    print("ok: determinism")

    # -- 2. telescoping under the party vmap ------------------------------
    for ws in (2, 3):
        out = runner.run_parties(
            lambda: crng.przs_arithmetic(shape), ws, 13, jit=True
        )
        total = np.asarray(out).sum(axis=0, dtype=np.uint64)
        assert (total == 0).all(), f"telescoping failed at ws={ws}"
        lanes = np.asarray(out)
        assert (lanes[0] != lanes[1]).any(), "lanes identical?"
        print(f"ok: telescoping ws={ws}")

    # -- 3. dealer sharing ------------------------------------------------
    rng0 = np.random.default_rng(0)
    plain_np = rng0.integers(0, 1 << 63, shape, dtype=np.uint64)
    plain = jnp.asarray(plain_np)

    # shared plain (party-invariant, the TFP dealer stream case)
    for src in (0, 1):
        out = runner.run_parties(
            lambda: crng.przs_share(plain, src=src), 2, 17 + src, jit=True
        )
        total = np.asarray(out).sum(axis=0, dtype=np.uint64)
        assert (total == plain_np).all(), f"shared-plain sharing src={src}"
        print(f"ok: dealer sharing (shared plain, src={src})")

    # per-lane plain: lane p's plain = plain + p; only rank 0's enters
    def lane_share():
        lane = comm.rank_signed().astype(jnp.uint64)
        return crng.przs_share(plain + lane)

    out = runner.run_parties(lane_share, 2, 23, jit=True)
    total = np.asarray(out).sum(axis=0, dtype=np.uint64)
    assert (total == plain_np).all(), "per-lane plain sharing (src=0)"
    print("ok: dealer sharing (per-lane plain)")

    # -- 5. end-to-end private matmul decode ------------------------------
    x = rng0.normal(size=(32, 768))
    w = rng0.normal(size=(768, 128)) * 0.05
    xe = curl_tpu.cryptensor(x)
    we = curl_tpu.cryptensor(w)
    step = curl_tpu.compile_parties(lambda a, b: a.matmul(b), 2)
    out = step(jax.random.PRNGKey(5), xe.mpc, we.mpc)
    share = np.asarray(out.share)
    dec = (share[0] + share[1]).view(np.int64).astype(np.float64) / (1 << 16)
    err = np.abs(dec - x @ w).max()
    assert err < 0.01, f"matmul decode err {err}"
    print(f"ok: private matmul decode (max err {err:.5f})")

    print("ALL PRZS-KERNEL CHECKS PASSED")


if __name__ == "__main__":
    main()
