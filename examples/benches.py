#!/usr/bin/env python3
"""Per-function runtime + approximation-error benchmark.

Parity scope: reference examples/benches/benches.py — same function set and
evaluation domains, reporting runtime quantiles and total/avg abs and
relative errors vs float ground truth. Runs each nonlinearity through the
COMPILED 2-party path (one XLA program per function).

Usage: python examples/benches.py [--device cpu] [--size 4096] [--json out]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import json
import math
import os
import sys
import time

import numpy as np


# evaluation domains per function (reference benches.py:71-84)
DOMAINS = {
    "sigmoid": (-256, 256),
    "tanh": (-16, 16),
    "erf": (-4, 4),
    "gelu": (-4, 4),
    "silu": (-16, 16),
    "exp": (-4, 2),
    "log": (0.1, 64),
    "reciprocal": (0.1, 64),
    "sqrt": (0.1, 200),
    "inv_sqrt": (0.1, 200),
    "sin": (-6.28, 6.28),
    "cos": (-6.28, 6.28),
}

REFS = {
    "sigmoid": lambda x: 1 / (1 + np.exp(-x)),
    "tanh": np.tanh,
    "erf": np.vectorize(math.erf),
    "gelu": lambda x: x * (1 + np.vectorize(math.erf)(x / np.sqrt(2))) / 2,
    "silu": lambda x: x / (1 + np.exp(-x)),
    "exp": np.exp,
    "log": np.log,
    "reciprocal": np.reciprocal,
    "sqrt": np.sqrt,
    "inv_sqrt": lambda x: 1 / np.sqrt(x),
    "sin": np.sin,
    "cos": np.cos,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=4096)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument(
        "--loop", type=int, default=1,
        help="run the op N times inside ONE compiled program (lax.scan with "
        "per-iteration forked protocol randomness) and report per-iteration "
        "time — isolates device time from the ~30 ms remote-dispatch floor",
    )
    parser.add_argument("--json", default=None)
    parser.add_argument("--config", default="default.yaml")
    parser.add_argument("--functions", nargs="*", default=None)
    args = parser.parse_args()

    import jax
    import curl_tpu

    base = os.path.join(os.path.dirname(curl_tpu.__file__), "configs")
    curl_tpu.cfg.load_config(os.path.join(base, args.config))
    curl_tpu.init(world_size=2, seed=123)

    funcs = args.functions or list(DOMAINS)
    results = {}
    header = f"{'func':<12}{'median_ms':>10}{'q1_ms':>9}{'q3_ms':>9}{'total_abs':>12}{'avg_abs':>10}{'avg_rel':>10}"
    print(header)
    print("-" * len(header))

    for name in funcs:
        lo, hi = DOMAINS[name]
        xs = np.linspace(lo, hi, args.size)
        ref = REFS[name](xs)
        xe = curl_tpu.cryptensor(xs)

        if args.loop > 1:
            # N iterations in one program: scan with per-iteration forked
            # protocol randomness (fresh masks each iter — not elidable),
            # outputs checksummed into the carry so XLA keeps every iter
            from jax import lax

            from curl_tpu import random as crng

            def looped(m, n=name, N=args.loop):
                import jax.numpy as jnp

                def body(acc, i):
                    with crng.fork(i):
                        out = getattr(m, n)()
                    return acc + out.share.sum(), None

                acc, _ = lax.scan(
                    body, jnp.zeros((), jnp.uint64), jnp.arange(N)
                )
                with crng.fork(args.loop + 1):
                    out = getattr(m, n)()  # one decodable output
                return out, acc

            step = curl_tpu.compile_parties(looped, world_size=2)
        else:
            step = curl_tpu.compile_parties(
                lambda m, n=name: getattr(m, n)(), world_size=2
            )
        # timing must NOT trust block_until_ready: on the remote axon
        # platform it can return before device execution completes (the
        # round-1 headline artifact). Reduce on device and fetch the
        # scalar — the fetch cannot return until the program has run.
        reduce_fn = jax.jit(lambda s: s.sum())

        def sync(o):
            if isinstance(o, tuple):  # loop mode: (out, checksum carry)
                np.asarray(jax.device_get(o[1]))
                return o[0]
            np.asarray(jax.device_get(reduce_fn(o.share)))
            return o

        out = sync(step(jax.random.PRNGKey(0), xe.mpc))  # compile

        times = []
        for i in range(args.reps):
            t0 = time.time()
            out = sync(step(jax.random.PRNGKey(i + 1), xe.mpc))
            times.append((time.time() - t0) * 1000 / args.loop)
        times.sort()

        dec = curl_tpu.CrypTensor(out).get_plain_text()
        # reference metric semantics (benches.py:148-157, 199): ref cast to
        # fp16, rel = |out-ref|/|ref| with ref==0 mapped to 0 and infs
        # dropped — tiny-but-nonzero refs legitimately inflate this metric
        # (both frameworks show it; see benchmarks/results notes)
        ref16 = ref.astype(np.float16).astype(np.float64)
        abs_err = np.abs(dec - ref16)
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.where(ref16 == 0, 0.0, np.abs((dec - ref16) / ref16))
        rel = rel[np.isfinite(rel)]
        med = times[len(times) // 2]
        q1 = times[len(times) // 4]
        q3 = times[(3 * len(times)) // 4]
        results[name] = {
            "median_ms": med,
            "q1_ms": q1,
            "q3_ms": q3,
            "total_abs_err": float(abs_err.sum()),
            "avg_abs_err": float(abs_err.mean()),
            "avg_rel_err": float(rel.mean()),
        }
        print(
            f"{name:<12}{med:>10.2f}{q1:>9.2f}{q3:>9.2f}"
            f"{abs_err.sum():>12.3f}{abs_err.mean():>10.5f}{rel.mean():>10.5f}"
        )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
