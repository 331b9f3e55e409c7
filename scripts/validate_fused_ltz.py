#!/usr/bin/env python3
"""On-device validation of the fused LTZ kernel (TPU only).

The protocol math is CPU-validated in tests/test_fused_max.py
(test_ltz_bit_math_*); this script checks the REAL kernel (hardware PRNG +
Mosaic lowering) on the TPU:

  1. kernel-level: fused_ltz_shares decodes to the exact sign bit on
     random in-envelope shares, including zero / one-quantum / envelope
     edges and odd (padded) sizes;
  2. seed behavior: same seed -> identical shares; different seed ->
     different shares, same decode;
  3. end-to-end: compiled relu / ge / sign with cfg.mpc.fused_compare on
     vs off decode identically (both exact in-envelope).

Run: python scripts/validate_fused_ltz.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import curl_tpu
    from curl_tpu.ops.pallas_max_step import fused_ltz_shares

    assert jax.default_backend() == "tpu", "requires the TPU backend"
    rng = np.random.default_rng(0)

    # -- 1. kernel level ----------------------------------------------------
    n = 100_001  # odd size exercises padding
    v = rng.normal(size=n) * 1000
    v[0] = 0.0
    v[1] = -1.0 / 65536
    v[2] = 1.0 / 65536
    v[3] = -16000.0
    v[4] = 16000.0
    enc = np.round(v * 65536).astype(np.int64)
    dv = enc.astype(np.uint64)
    d0 = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    ds = jnp.asarray(np.stack([d0, dv - d0]))

    @jax.jit
    def run(ds, seed):
        return fused_ltz_shares(ds, seed)

    seed1 = jnp.asarray([23, 41], jnp.int32)
    out = np.asarray(jax.device_get(run(ds, seed1)))
    got = out[0] + out[1]
    want = (enc < 0).astype(np.uint64)
    exact = np.array_equal(got, want)
    print(f"kernel decode exact: {exact} "
          f"({int((got != want).sum())} mismatches of {n})")
    assert exact

    # -- 2. seed behavior ---------------------------------------------------
    out_same = np.asarray(jax.device_get(run(ds, seed1)))
    out_diff = np.asarray(
        jax.device_get(run(ds, jnp.asarray([24, 41], jnp.int32)))
    )
    print("same seed -> same shares:", np.array_equal(out, out_same))
    print("diff seed -> diff shares:", not np.array_equal(out, out_diff),
          "| same decode:", np.array_equal(out_diff[0] + out_diff[1], want))
    assert np.array_equal(out, out_same)
    assert not np.array_equal(out, out_diff)
    assert np.array_equal(out_diff[0] + out_diff[1], want)

    # -- 3. end-to-end relu / ge / sign -------------------------------------
    curl_tpu.init(world_size=2, seed=13)
    x = rng.normal(size=(8, 1024)) * 100
    y = rng.normal(size=(8, 1024)) * 100
    outs = {}
    for mode in (None, "pallas_tpu"):
        with curl_tpu.cfg.temp_override({"mpc.fused_compare": mode}):
            xe = curl_tpu.cryptensor(x)
            ye = curl_tpu.cryptensor(y)
            outs[mode] = (
                np.asarray(xe.relu().get_plain_text()),
                np.asarray(xe.ge(ye).get_plain_text()),
                np.asarray(xe.sign().get_plain_text()),
            )
    for i, tag in enumerate(("relu", "ge", "sign")):
        same = np.allclose(outs[None][i], outs["pallas_tpu"][i], atol=2e-4)
        print(f"{tag}: fused == unfused decode: {same}")
        assert same
    assert np.allclose(outs["pallas_tpu"][0], np.maximum(x, 0), atol=2e-4)
    assert np.array_equal(outs["pallas_tpu"][1], (x >= y).astype(float))
    print("ALL FUSED-LTZ VALIDATIONS PASSED")


if __name__ == "__main__":
    main()
