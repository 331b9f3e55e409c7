"""On-device validation of the Pallas hardware-PRNG bulk-draw path.

Run on the real TPU (axon). Asserts the four properties that make
cfg.mpc.bulk_rng = "pallas_tpu" sound for MPC mask generation:

  1. determinism   — same seed words, two separate kernel launches ->
                     identical streams (PRZS requires party i's "next"
                     draw to equal party i+1's "prev" draw bit-for-bit);
  2. sensitivity   — different seed words -> different streams;
  3. vmap-soundness — vmapped kernel with per-lane seeds == stacked
                     individual calls (the property XLA's RngBitGenerator
                     LACKS, which is why rbg was rejected in round 1);
  4. PRZS invariant — end-to-end: przs_arithmetic under vmapped parties
                     with bulk_rng=pallas_tpu sums to zero over the ring.

Usage: python scripts/validate_pallas_rng.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import curl_tpu  # noqa: E402
from curl_tpu.ops.pallas_rng import pallas_random_bits_u64, seed_from_key  # noqa: E402


def main():
    assert jax.default_backend() == "tpu", (
        f"needs the real TPU, got {jax.default_backend()}"
    )
    shape = (16, 257)  # non-multiple-of-128 to exercise the pad/slice path

    seeds_a = jnp.array([12345, -7], dtype=jnp.int32)
    seeds_b = jnp.array([12345, -8], dtype=jnp.int32)

    f = jax.jit(lambda s: pallas_random_bits_u64(s, shape))
    a1 = np.asarray(f(seeds_a))
    a2 = np.asarray(f(seeds_a))
    b1 = np.asarray(f(seeds_b))

    assert (a1 == a2).all(), "determinism FAILED: same seed gave different bits"
    print("1. determinism: ok")
    assert (a1 != b1).any(), "sensitivity FAILED: different seed gave same bits"
    frac = (a1 == b1).mean()
    assert frac < 0.01, f"sensitivity WEAK: {frac:.3f} of words collide"
    print(f"2. seed sensitivity: ok (collision frac {frac:.4f})")

    # crude uniformity sanity: mean of top bit ~ 0.5
    top = (a1 >> np.uint64(63)).astype(np.float64).mean()
    assert 0.45 < top < 0.55, f"uniformity suspect: top-bit mean {top}"
    print(f"3. top-bit mean: {top:.4f}")

    # vmap-soundness
    seeds2 = jnp.stack([seeds_a, seeds_b])
    vm = jax.jit(jax.vmap(lambda s: pallas_random_bits_u64(s, shape)))(seeds2)
    vm = np.asarray(vm)
    assert (vm[0] == a1).all() and (vm[1] == b1).all(), (
        "vmap-soundness FAILED: vmapped lanes differ from individual calls"
    )
    assert (vm[0] != vm[1]).any(), "vmap lanes identical — rbg-style collapse"
    print("4. vmap per-lane soundness: ok")

    # multi-tile draw (rows > _TILE_ROWS): determinism + no repeated tiles
    big = (1200, 300)  # rows ~2816 -> 6 tiles of 512
    g = jax.jit(lambda s: pallas_random_bits_u64(s, big))
    c1 = np.asarray(g(seeds_a))
    c2 = np.asarray(g(seeds_a))
    assert (c1 == c2).all(), "multi-tile determinism FAILED"
    flat = c1.reshape(-1)
    t0, t1 = flat[: 512 * 128], flat[512 * 128 : 2 * 512 * 128]
    assert (t0 != t1).any(), "tile streams identical — tile mixing broken"
    print("4b. multi-tile draw: ok")

    # end-to-end PRZS under the protocol runtime
    curl_tpu.cfg.set("mpc.bulk_rng", "pallas_tpu")
    from curl_tpu import random as rng
    from curl_tpu.parallel import runner

    def przs_prog():
        return rng.przs_arithmetic((8, 512))

    out = runner.run_parties(przs_prog, 2, 99, jit=True)
    total = np.asarray(out).sum(axis=0, dtype=np.uint64)
    assert (total == 0).all(), "PRZS FAILED: shares do not telescope to zero"
    print("5. PRZS invariant under bulk_rng=pallas_tpu: ok")
    print("ALL PASS")


if __name__ == "__main__":
    main()
