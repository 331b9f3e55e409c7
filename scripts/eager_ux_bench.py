#!/usr/bin/env python3
"""Eager per-op UX timing on the live backend — the reference's primary UX
is eager ops over party processes (reference: tutorials + examples all call
ops eagerly; each op is a blocking torch/Gloo round). curl_tpu's eager mode
dispatches one XLA program per op over the tunnel; ``with curl_tpu.lazy():``
records and compiles the whole region instead. This script measures both on
a tutorial-scale workload so the documented trade-off rests on numbers.

Writes benchmarks/results/eager_ux_tpu.json:
  per-op eager latencies (median of reps), the same composite workload
  eager vs lazy, and the eager dispatch floor.

Usage: python scripts/eager_ux_bench.py  [--reps 20] [--json PATH]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timed(fn, reps):
    """Median wall latency of fn() in ms (fn must synchronize internally —
    eager curl_tpu ops fetch or block on the result)."""
    fn()  # warm (compile)
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        out.append((time.perf_counter() - t0) * 1e3)
    return {
        "median_ms": round(statistics.median(out), 3),
        "q1_ms": round(np.percentile(out, 25), 3),
        "q3_ms": round(np.percentile(out, 75), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument(
        "--json", default="benchmarks/results/eager_ux_tpu.json"
    )
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument(
        "--platform", default=None,
        help="pin jax platform (the axon sitecustomize overrides "
        "JAX_PLATFORMS, so env pinning alone does not work)",
    )
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import curl_tpu

    curl_tpu.init(world_size=2, seed=5)
    backend = jax.default_backend()
    n = args.size
    r = np.random.default_rng(0)
    a = curl_tpu.cryptensor(r.normal(size=(n, n)))
    b = curl_tpu.cryptensor(r.normal(size=(n, n)))

    results = {"backend": backend, "size": [n, n], "reps": args.reps, "ops": {}}

    # dispatch floor: one trivial device round-trip
    import jax.numpy as jnp

    dev_x = jnp.ones(())
    results["dispatch_floor_ms"] = timed(
        lambda: float(dev_x + 1), args.reps
    )["median_ms"]

    def sync(ct):
        # force completion by fetching one scalar of the (stacked) shares —
        # block_until_ready is unreliable on the axon tunnel (see bench.py)
        s = ct.share
        return jax.device_get(s.ravel()[0])

    OPS = {
        "add": lambda: sync(a + b),
        "mul": lambda: sync(a * b),
        "matmul": lambda: sync(a.matmul(b)),
        "relu": lambda: sync(a.relu()),
        "sigmoid": lambda: sync(a.sigmoid()),
        "softmax": lambda: sync(a.softmax(dim=-1)),
        "get_plain_text": lambda: np.asarray(a.get_plain_text()),
    }
    for name, fn in OPS.items():
        try:
            results["ops"][name] = timed(fn, args.reps)
        except Exception as e:  # keep the table even if one op trips
            results["ops"][name] = {"error": repr(e)[:200]}
        print(name, results["ops"][name], flush=True)

    # composite tutorial-scale region: linear -> relu -> linear -> sum,
    # eagerly (op-per-dispatch) vs inside one lazy() compiled region
    w1 = curl_tpu.cryptensor(r.normal(size=(n, n)) * 0.1)
    w2 = curl_tpu.cryptensor(r.normal(size=(n, 1)) * 0.1)

    def region_eager():
        h = a.matmul(w1).relu()
        return np.asarray(h.matmul(w2).sum().get_plain_text())

    def region_lazy():
        with curl_tpu.lazy():
            h = a.matmul(w1).relu()
            out = h.matmul(w2).sum()
        return np.asarray(out.get_plain_text())

    results["composite_eager"] = timed(region_eager, args.reps)
    results["composite_lazy"] = timed(region_lazy, args.reps)
    print("composite eager:", results["composite_eager"], flush=True)
    print("composite lazy :", results["composite_lazy"], flush=True)

    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", args.json)


if __name__ == "__main__":
    main()
