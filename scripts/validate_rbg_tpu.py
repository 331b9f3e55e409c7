#!/usr/bin/env python3
"""On-device validation of bulk_rng="rbg" under the vmap party runtime
(the TPU default since round 4): PRZS telescopes, decode matches plaintext
through a mul+matmul+relu+sigmoid protocol chain, and the stream really is
the RngBitGenerator path (differs from the threefry stream).
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax

import curl_tpu
from curl_tpu import random as rng
from curl_tpu.parallel import runner


def main():
    curl_tpu.init(world_size=2, seed=31)
    backend = jax.default_backend()
    assert rng._use_rbg() or backend == "cpu", (backend, "auto should pick rbg")

    # PRZS telescopes on device
    out = runner.run_parties(lambda: rng.przs_arithmetic((64, 129)), 2, 7, jit=True)
    total = np.asarray(out[0] + out[1])
    assert (total == 0).all(), "PRZS does not telescope under rbg"

    # full protocol chain decodes correctly
    r = np.random.default_rng(0)
    x = r.normal(size=(16, 32))
    w = r.normal(size=(32, 8)) * 0.3
    xe = curl_tpu.cryptensor(x)
    we = curl_tpu.cryptensor(w)
    step = curl_tpu.compile_parties(
        lambda a, b: (a.matmul(b).relu(), a.mul(b.sum())), 2
    )
    o1, o2 = step(jax.random.PRNGKey(5), xe.mpc, we.mpc)
    dec1 = np.asarray(curl_tpu.CrypTensor(o1).get_plain_text())
    err = np.abs(dec1 - np.maximum(x @ w, 0)).max()
    assert err < 0.01, f"matmul+relu decode error {err}"
    dec2 = np.asarray(curl_tpu.CrypTensor(o2).get_plain_text())
    err2 = np.abs(dec2 - x * w.sum()).max()
    assert err2 < 0.01, f"mul decode error {err2}"
    # LUT path sanity (coarse tolerance: 8-bit haar LUT quantization)
    step2 = curl_tpu.compile_parties(lambda a: a.sigmoid(), 2)
    o3 = step2(jax.random.PRNGKey(6), xe.mpc)
    dec3 = np.asarray(curl_tpu.CrypTensor(o3).get_plain_text())
    err3 = np.abs(dec3 - 1.0 / (1.0 + np.exp(-x))).max()
    assert err3 < 0.1, f"sigmoid decode error {err3}"

    # the rbg stream is distinct from the threefry stream
    with curl_tpu.cfg.temp_override({"mpc.bulk_rng": "rbg"}):
        a = runner.run_parties(lambda: rng.random_ring((33,), "local"), 2, 9, jit=True)
    with curl_tpu.cfg.temp_override({"mpc.bulk_rng": "xla"}):
        b = runner.run_parties(lambda: rng.random_ring((33,), "local"), 2, 9, jit=True)
    assert (np.asarray(a) != np.asarray(b)).any()

    print(
        f"validate_rbg_tpu OK backend={backend} "
        f"max_err={err:.5f}/{err2:.5f}/{err3:.5f}"
    )


if __name__ == "__main__":
    main()
