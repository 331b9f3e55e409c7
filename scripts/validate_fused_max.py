#!/usr/bin/env python3
"""On-device validation of the fused max-step kernel (TPU only).

The protocol math is CPU-validated in tests/test_fused_max.py; this script
checks the REAL kernel (hardware PRNG + Mosaic lowering) on the TPU:

  1. kernel-level: fused_max_step_shares decodes to elementwise max on
     random in-envelope shares, including ties/negatives/envelope edges;
  2. seed behavior: same seed -> identical shares; different seed ->
     different shares, same decode;
  3. end-to-end: compiled scan_reduction vocab max with fused on vs off
     decodes identically (both exact).

Run: python scripts/validate_fused_max.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import curl_tpu
    from curl_tpu.ops.pallas_max_step import fused_max_step_shares

    assert jax.default_backend() == "tpu", "requires the TPU backend"
    rng = np.random.default_rng(0)

    # -- 1. kernel level ----------------------------------------------------
    n = 100_000  # odd sizes exercise padding
    a = rng.normal(size=n) * 1000
    b = rng.normal(size=n) * 1000
    a[0] = b[0] = 5.0
    a[1], b[1] = -3000.0, 2999.5
    a[2], b[2] = 16000.0, -16000.0
    enc = lambda v: np.round(v * 65536).astype(np.int64).astype(np.uint64)  # noqa: E731
    av, bv = enc(a), enc(b)
    c0 = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    r0 = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    cs = jnp.asarray(np.stack([c0, av - c0]))
    rs = jnp.asarray(np.stack([r0, bv - r0]))

    @jax.jit
    def run(cs, rs, seed):
        return fused_max_step_shares(cs, rs, seed)

    seed1 = jnp.asarray([17, 29], jnp.int32)
    out = np.asarray(jax.device_get(run(cs, rs, seed1)))
    got = out[0] + out[1]
    want = np.where(av.astype(np.int64) >= bv.astype(np.int64), av, bv)
    exact = np.array_equal(got, want)
    print(f"kernel decode exact: {exact} "
          f"({int((got != want).sum())} mismatches of {n})")
    assert exact

    # -- 2. seed behavior -----------------------------------------------------
    out_same = np.asarray(jax.device_get(run(cs, rs, seed1)))
    out_diff = np.asarray(jax.device_get(run(cs, rs, jnp.asarray([18, 29], jnp.int32))))
    print("same seed -> same shares:", np.array_equal(out, out_same))
    print("diff seed -> diff shares:", not np.array_equal(out, out_diff),
          "| same decode:", np.array_equal(out_diff[0] + out_diff[1], want))
    assert np.array_equal(out, out_same)
    assert not np.array_equal(out, out_diff)
    assert np.array_equal(out_diff[0] + out_diff[1], want)

    # -- 3. end-to-end through scan_reduction ---------------------------------
    curl_tpu.init(world_size=2, seed=11)
    x = rng.normal(size=(4, 50257)) * 8
    outs = {}
    for mode in (None, "pallas_tpu"):
        with curl_tpu.cfg.temp_override(
            {
                "functions.max_method": "scan_reduction",
                "functions.scan_fixed_width": 2048,
                "mpc.fused_max_step": mode,
            }
        ):
            xe = curl_tpu.cryptensor(x)
            outs[mode] = xe.max(-1)[0].get_plain_text()
    print("fused == unfused decode:",
          np.allclose(outs[None], outs["pallas_tpu"], atol=2e-4),
          "| == plaintext:", np.allclose(outs["pallas_tpu"], x.max(-1), atol=2e-4))
    assert np.allclose(outs[None], outs["pallas_tpu"], atol=2e-4)
    assert np.allclose(outs["pallas_tpu"], x.max(-1), atol=2e-4)
    print("ALL FUSED-MAX VALIDATIONS PASSED")


if __name__ == "__main__":
    main()
