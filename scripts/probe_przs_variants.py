#!/usr/bin/env python3
"""Probe: PRZS share-construction variants at the GPT-2 weight shape.

Round-4 decomposition (beaver_big_breakdown.json): przs at (768, 50257)
under the 2-lane party vmap costs 30 ms while ONE raw rbg draw at that
shape is 1.2 ms — a 25x wrapper gap that dominates triple generation
(53 ms) and hence the big Beaver matmuls (72% of the forward). This
script times candidate formulations inside one compiled program
(lax.scan, checksummed) to pick the round-5 implementation.

Variants (all bit-identical share values):
  raw_draw      one rbg draw at (K, V)                       [floor]
  przs_now      current przs_arithmetic under 2-lane vmap (shared-diff
                select since round 5)
  przs_take     the pre-round-5 formulation: stacked streams, per-lane
                double dynamic gather + subtract
  przs_sign     sign-multiply form of the ws=2 shared-diff trick
  share_now     _share_from_local (przs + rank0*plain) current
  share_fused   ws=2 fused: select(d) + is0*plain (one elementwise pass)
  sub_u64       one u64 subtract at (K, V) under the 2-lane vmap [op floor]

Usage: LOOP=32 python scripts/probe_przs_variants.py [variant ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = int(os.environ.get("LOOP", "32"))
REPS = int(os.environ.get("REPS", "3"))
K, V = 768, 50257


def main():
    only = set(sys.argv[1:])

    import jax
    import jax.numpy as jnp
    from jax import lax

    import curl_tpu
    from curl_tpu import comm
    from curl_tpu import random as crng

    if "BENCH_BULK_RNG" in os.environ:
        curl_tpu.cfg.set("mpc.bulk_rng", os.environ["BENCH_BULK_RNG"])
    curl_tpu.init(world_size=2, seed=11)

    results = []

    def timeit(tag, make_body, *arrays, vmap_lanes=True):
        """make_body() -> body(i, *arrs) returning u64 array(s); run LOOP
        times in one scan. If vmap_lanes, body runs under the 2-lane party
        vmap with proper per-lane keys + ring_all (the compile_parties
        wiring)."""
        keys = crng.make_party_keys(11, 2, stacked=False)

        @jax.jit
        def prog(kys, *arrs):
            from curl_tpu.parallel.runner import mpc_context

            if vmap_lanes:
                def party_fn(pk, *pa):
                    with mpc_context(pk, 2):
                        def step(acc, i):
                            with crng.fork(i):
                                out = make_body()(i, *pa)
                            leaves = jax.tree_util.tree_leaves(out)
                            s = jnp.zeros((), jnp.uint64)
                            for sh in leaves:
                                s = s + sh.reshape(-1)[:8].sum()
                            return acc + s, None

                        acc, _ = lax.scan(
                            step, jnp.zeros((), jnp.uint64), jnp.arange(LOOP))
                    return acc

                in_axes = (crng.KEY_AXES,) + (None,) * len(arrs)
                return jax.vmap(
                    party_fn, in_axes=in_axes, axis_name=comm.PARTY_AXIS
                )(kys, *arrs)
            else:
                with crng.KeyContext(
                    {k: (v[0] if k in ("next", "prev", "local", "ttp") else v)
                     for k, v in kys.items()}
                ):
                    def step(acc, i):
                        with crng.fork(i):
                            out = make_body()(i, *arrs)
                        leaves = jax.tree_util.tree_leaves(out)
                        s = jnp.zeros((), jnp.uint64)
                        for sh in leaves:
                            s = s + sh.reshape(-1)[:8].sum()
                        return acc + s, None

                    acc, _ = lax.scan(
                        step, jnp.zeros((), jnp.uint64), jnp.arange(LOOP))
                return acc

        t0 = time.time()
        np.asarray(jax.device_get(prog(keys, *arrays)))
        compile_s = time.time() - t0
        times = []
        for i in range(REPS):
            t0 = time.time()
            np.asarray(jax.device_get(prog(keys, *arrays)))
            times.append((time.time() - t0) / LOOP)
        rec = {"stage": tag, "latency_sec": round(min(times), 5),
               "compile_sec": round(compile_s, 1), "loop": LOOP}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    def want(tag):
        return not only or tag in only

    rng0 = np.random.default_rng(0)
    plain = jnp.asarray(rng0.integers(0, 1 << 63, (K, V), dtype=np.uint64))
    wshare = jnp.asarray(rng0.integers(0, 1 << 63, (K, V), dtype=np.uint64))

    if want("raw_draw"):
        timeit("raw_draw",
               lambda: lambda i: crng.random_ring((K, V), "local"),
               vmap_lanes=False)

    if want("przs_now"):
        timeit("przs_now", lambda: lambda i: crng.przs_arithmetic((K, V)))

    if want("przs_take"):
        # the PRE-round-5 formulation: stacked streams, per-lane double
        # dynamic gather + subtract (kept as the comparison baseline)
        def make():
            def body(i):
                c = crng._next_count()
                streams = jnp.stack(crng._ring_all_streams((K, V), c))
                r = comm.rank_signed()
                prev_s = jnp.take(streams, (r - 1) % 2, axis=0)
                next_s = jnp.take(streams, r % 2, axis=0)
                return prev_s - next_s

            return body

        timeit("przs_take", make)

    if want("przs_sign"):
        # sign-multiply form of the ws=2 shared-diff trick
        def make():
            def body(i):
                c = crng._next_count()
                streams = crng._ring_all_streams((K, V), c)
                d = streams[1] - streams[0]
                r = comm.rank_signed().astype(jnp.uint64)
                sign = jnp.uint64(1) - jnp.uint64(2) * r
                return sign * d

            return body

        timeit("przs_sign", make)

    if want("share_now"):
        def make():
            from curl_tpu.mpc.provider.tfp_provider import _share_from_local

            def body(i, pl_):
                return _share_from_local(pl_ + jnp.uint64(i)).share

            return body

        timeit("share_now", make, plain)

    if want("share_fused"):
        def make():
            def body(i, pl_):
                c = crng._next_count()
                streams = crng._ring_all_streams((K, V), c)
                d = streams[1] - streams[0]
                r = comm.rank_signed()
                przs = jnp.where(r == 0, d, jnp.uint64(0) - d)
                is0 = (r == 0).astype(jnp.uint64)
                return przs + is0 * (pl_ + jnp.uint64(i))

            return body

        timeit("share_fused", make, plain)

    if want("sub_u64"):
        def make():
            def body(i, a, b):
                return a - (b + jnp.uint64(i))

            return body

        timeit("sub_u64", make, plain, wshare)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "benchmarks",
        "results", "przs_variants.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
