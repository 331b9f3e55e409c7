"""TPU kernel library (Pallas).

Status (round 1): experimental building blocks + design notes. The XLA
paths are already speed-of-light for the headline workloads (full GPT-2
2-party forward ≈ 1.1 ms/chip); these kernels target the remaining axes:

  * pallas_rng: hardware-PRNG mask generation — collapses the ~200-HLO-op
    threefry blob that every protocol round emits into one kernel call
    (compile-time lever; Mosaic measurements pending determinism review).
  * ring kernels (future): Mosaic has NO uint64 support (probed on v5e:
    remote-compile rejects u64 ops), so fused ring kernels must operate on
    u32 limb pairs.
"""

from . import pallas_rng  # noqa: F401
