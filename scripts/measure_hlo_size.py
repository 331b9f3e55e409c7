"""Lower (no compile) the 2-party GPT-2 forward and report StableHLO size
under bulk_rng = xla vs pallas_tpu. Compiler memory / compile time scale
with module size; this predicts the impact without a 15-min remote compile.

Usage: [BENCH_SEQ=16] python scripts/measure_hlo_size.py
"""

import os
import sys

sys.path.insert(0, ".")

SEQ = int(os.environ.get("BENCH_SEQ", "16"))
MODEL = os.environ.get("BENCH_MODEL", "GPT2")


def lowered_size(bulk_rng):
    import jax
    import numpy as np

    import curl_tpu
    from curl_tpu import models

    curl_tpu.cfg.set("mpc.bulk_rng", bulk_rng)
    curl_tpu.cfg.set("functions.max_method", "scan_reduction")
    curl_tpu.init(world_size=2, seed=11)

    model = getattr(models, MODEL)(seq_len=SEQ, full=True)
    model.encrypt(src=0)
    apply_fn, params = model.functional()
    x = np.random.default_rng(0).integers(0, 1000, size=(1, SEQ)).astype(np.float64)
    xe = curl_tpu.cryptensor(x, precision=0)

    step = curl_tpu.compile_parties(apply_fn, world_size=2)
    import time

    t0 = time.time()
    lowered = step.lower(jax.random.PRNGKey(100), params, xe.mpc)
    trace_t = time.time() - t0
    text = lowered.as_text()
    return len(text), text.count("\n"), trace_t


def main():
    modes = os.environ.get("MODES", "xla,pallas_tpu,rbg").split(",")
    for mode in modes:
        nbytes, nlines, trace_t = lowered_size(mode)
        print(
            f"bulk_rng={mode:<11} stablehlo: {nbytes/1e6:8.2f} MB, "
            f"{nlines:>9} lines, trace {trace_t:.1f}s"
        )


if __name__ == "__main__":
    main()
