"""On-device validation + timing of the fused Pallas ring matmul.

Checks bit-exactness against the XLA limb path on real-TPU hardware at the
GPT-2 hot shapes, then times both paths with honest device-sync timing.

Usage: python scripts/validate_ring_mm.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from curl_tpu import ring
from curl_tpu.ops import pallas_ring_mm as pmm


def sync(x):
    return int(np.asarray(jax.device_get(jax.jit(lambda s: s.sum())(x))))


def check(M, K, N, B=1):
    rng = np.random.default_rng(M + N)
    a = jnp.asarray(rng.integers(0, 1 << 64, size=(B, M, K), dtype=np.uint64))
    b = jnp.asarray(rng.integers(0, 1 << 64, size=(B, K, N), dtype=np.uint64))

    xla_mm = jax.jit(ring._xla_matmul)
    ker_mm = jax.jit(pmm.matmul)

    got = np.asarray(jax.device_get(ker_mm(a, b)))
    ref = np.asarray(jax.device_get(xla_mm(a, b)))
    exact = bool((got == ref).all())
    print(f"B={B} ({M},{K})@({K},{N}): bit-exact = {exact}")
    if not exact:
        bad = np.argwhere(got != ref)[:4]
        print("  first mismatches at", bad.tolist())
        return False

    for name, fn in (("xla", xla_mm), ("pallas", ker_mm)):
        out = fn(a, b); sync(out)  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.time(); out = fn(a, b); sync(out); ts.append(time.time() - t0)
        print(f"  {name:7s} {min(ts)*1e3:8.2f} ms")
    return True


def main():
    print("backend:", jax.default_backend())
    ok = True
    ok &= check(64, 768, 768)            # block linear
    ok &= check(64, 768, 50257)          # lm head
    ok &= check(64, 50257, 768)          # embedding one-hot
    ok &= check(64, 64, 64, B=12)        # attention scores per head
    ok &= check(512, 768, 50257)         # batch-8 lm head
    print("ALL RING-MM VALIDATIONS PASSED" if ok else "RING-MM VALIDATION FAILED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
