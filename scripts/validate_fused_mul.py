#!/usr/bin/env python3
"""On-device validation of the fused elementwise mul/square kernel.

The protocol math is CPU-validated in tests/test_fused_mul.py; this script
checks the REAL kernel (hardware PRNG + Mosaic lowering) on the TPU:

  1. kernel-level: _fused_shares("mul"/"square") decodes exactly
     (pre-rescale Beaver reconstruction is exact), odd sizes pad cleanly;
  2. seed behavior: same seed -> same shares; different -> same decode;
  3. end-to-end: private mul / square / limit-exp with cfg.mpc.fused_mul
     on vs off decode within 2 output LSB (EGK rescale is probabilistic).

Run: python scripts/validate_fused_mul.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import curl_tpu
    from curl_tpu.ops.pallas_mul import _fused_shares

    assert jax.default_backend() == "tpu", "requires the TPU backend"
    rng = np.random.default_rng(0)

    # -- 1. kernel level (no rescale: exact) ---------------------------------
    n = 100_001
    xv = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    yv = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)

    def shares(v):
        s = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
        return jnp.asarray(np.stack([s, v - s]))

    xs, ys = shares(xv), shares(yv)

    @jax.jit
    def run_mul(xs, ys, seed):
        return _fused_shares("mul", "none", 0, xs, ys, seed)

    @jax.jit
    def run_sq(xs, seed):
        return _fused_shares("square", "none", 0, xs, xs, seed)

    seed1 = jnp.asarray([7, 99], jnp.int32)
    out = np.asarray(jax.device_get(run_mul(xs, ys, seed1)))
    exact = np.array_equal(out[0] + out[1], xv * yv)
    print(f"mul kernel decode exact: {exact}")
    assert exact
    out_sq = np.asarray(jax.device_get(run_sq(xs, seed1)))
    exact_sq = np.array_equal(out_sq[0] + out_sq[1], xv * xv)
    print(f"square kernel decode exact: {exact_sq}")
    assert exact_sq

    # -- 2. seed behavior -----------------------------------------------------
    out_same = np.asarray(jax.device_get(run_mul(xs, ys, seed1)))
    out_diff = np.asarray(
        jax.device_get(run_mul(xs, ys, jnp.asarray([8, 99], jnp.int32)))
    )
    print("same seed -> same shares:", np.array_equal(out, out_same))
    print("diff seed -> diff shares:", not np.array_equal(out, out_diff),
          "| same decode:",
          np.array_equal(out_diff[0] + out_diff[1], xv * yv))
    assert np.array_equal(out, out_same)
    assert not np.array_equal(out, out_diff)

    # -- 3. end-to-end mul / square / exp -------------------------------------
    curl_tpu.init(world_size=2, seed=29)
    x = rng.uniform(-4, 4, size=(8, 1024))
    y = rng.uniform(-4, 4, size=(8, 1024))
    xneg = -np.abs(rng.uniform(0.1, 8, size=(8, 1024)))
    outs = {}
    for mode in (None, "pallas_tpu"):
        with curl_tpu.cfg.temp_override({"mpc.fused_mul": mode}):
            xe = curl_tpu.cryptensor(x)
            ye = curl_tpu.cryptensor(y)
            xne = curl_tpu.cryptensor(xneg)
            outs[mode] = (
                np.asarray((xe * ye).get_plain_text()),
                np.asarray(xe.square().get_plain_text()),
                np.asarray(xne.exp().get_plain_text()),
            )
    tol = 4 / (1 << 16)
    for i, tag in enumerate(("mul", "square", "exp")):
        d = np.abs(outs[None][i] - outs["pallas_tpu"][i]).max()
        # limit-exp is 8 SEQUENTIAL squarings: a +/-1-LSB truncation jitter
        # in step k doubles relatively at each later squaring ((1+d)^2 ~
        # 1+2d), so independent fused-vs-unfused runs can differ by up to
        # ~2^8 output LSB near exp(..)~1 (measured 4.96e-3 on device)
        ok = d <= (tol * (2 ** 8 if tag == "exp" else 1))
        print(f"{tag}: fused == unfused decode: {ok} (max diff {d:.2e})")
        assert ok
    assert np.abs(outs["pallas_tpu"][0] - x * y).max() < 0.01
    assert np.abs(outs["pallas_tpu"][2] - np.exp(xneg)).max() < 0.05

    # -- 4. standalone EGK truncation kernel (mpc.fused_trunc) ----------------
    tr_outs = {}
    for mode in (None, "pallas_tpu"):
        with curl_tpu.cfg.temp_override({"mpc.fused_trunc": mode}):
            xe = curl_tpu.cryptensor(x * 100)

            def tr(t):
                return t.egk_trunc_pr(62, 8)

            tr_outs[mode] = np.asarray(
                curl_tpu._eager_run(tr, xe).get_plain_text()
            )
    d = np.abs(tr_outs[None] - tr_outs["pallas_tpu"]).max()
    ok = d <= 2 / 256
    print(f"trunc: fused == unfused decode: {ok} (max diff {d:.2e})")
    assert ok
    assert np.abs(tr_outs["pallas_tpu"] - x * 100 / 256).max() < 2 / 256 + 1e-3
    print("ALL FUSED-MUL VALIDATIONS PASSED")


if __name__ == "__main__":
    main()
