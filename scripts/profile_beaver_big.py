#!/usr/bin/env python3
"""Sub-op isolation for the big Beaver matmul (the lm_head/embed shapes).

Loop-mode breakdown showed mm_big_pub (one public ring matmul at
(64,768)@(768,50257)) at 4 ms while the full Beaver matmul runs 165 ms —
~150 ms lives in the protocol wrapper. This script times each candidate
at the same shapes inside ONE compiled program (lax.scan, checksummed),
so the ~26 ms dispatch floor divides out.

Usage: LOOP=8 python scripts/profile_beaver_big.py [stage ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = int(os.environ.get("LOOP", "8"))
REPS = int(os.environ.get("REPS", "3"))
M, K, V = 64, 768, 50257


def main():
    only = set(sys.argv[1:])

    import jax
    import jax.numpy as jnp
    from jax import lax

    import curl_tpu
    from curl_tpu import ring
    from curl_tpu import random as crng
    from curl_tpu import comm

    # mirror bench.py: honor BENCH_BULK_RNG if set, else leave the config
    # "auto" default (rbg on TPU) so sub-op profiles match the headline run
    if "BENCH_BULK_RNG" in os.environ:
        curl_tpu.cfg.set("mpc.bulk_rng", os.environ["BENCH_BULK_RNG"])
    curl_tpu.init(world_size=2, seed=11)

    results = []

    def timeit(tag, make_body, *arrays):
        """make_body() -> fn(i, *arrays) returning a u64 array. ``arrays``
        are jit ARGUMENTS (closure-captured device arrays embed as HLO
        constants and overflow the remote compiler's request size)."""

        @jax.jit
        def prog(key, *arrs):
            with crng.KeyContext(
                {"local": key, "prev": key, "next": key, "global": key,
                 "ttp": key, "dealer": key}
            ):
                body = make_body()

                def step(acc, i):
                    with crng.fork(i):
                        out = body(i, *arrs)
                    return acc + out.reshape(-1)[:8].sum(), None

                acc, _ = lax.scan(
                    step, jnp.zeros((), jnp.uint64), jnp.arange(LOOP)
                )
            return acc

        t0 = time.time()
        np.asarray(jax.device_get(prog(jax.random.PRNGKey(7), *arrays)))
        compile_s = time.time() - t0
        times = []
        for i in range(REPS):
            t0 = time.time()
            np.asarray(jax.device_get(prog(jax.random.PRNGKey(8 + i), *arrays)))
            times.append((time.time() - t0) / LOOP)
        rec = {"stage": tag, "latency_sec": round(min(times), 5),
               "compile_sec": round(compile_s, 1), "loop": LOOP}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    def want(tag):
        return not only or tag in only

    rng0 = np.random.default_rng(0)
    big_b = jnp.asarray(rng0.integers(0, 1 << 63, (K, V), dtype=np.uint64))
    big_c = jnp.asarray(rng0.integers(0, 1 << 63, (M, V), dtype=np.uint64))
    big_b2 = jnp.asarray(rng0.integers(0, 1 << 63, (K, V), dtype=np.uint64))

    if want("draw_big"):
        # one (K, V) uniform draw (the b-mask)
        timeit("draw_big",
               lambda: lambda i: crng.random_ring((K, V), "local"))

    if want("przs_big"):
        # PRZS at (K, V): two draws + subtract
        timeit("przs_big", lambda: lambda i: crng.przs_arithmetic((K, V)))

    if want("add_big"):
        # one u64 elementwise add at (K, V)
        timeit("add_big", lambda: lambda i, b1, b2: b1 + (b2 + jnp.uint64(i)),
               big_b, big_b2)

    if want("mul_big"):
        # one u64 elementwise multiply at (K, V)
        timeit("mul_big", lambda: lambda i, b1, b2: b1 * (b2 + jnp.uint64(i)),
               big_b, big_b2)

    if want("maskmul_big"):
        # rank-style select: scalar-mask multiply at (K, V)
        timeit(
            "maskmul_big",
            lambda: lambda i, b1: (jnp.uint64(1) + jnp.uint64(0) * jnp.uint64(i)) * b1,
            big_b,
        )

    if want("vmap_allsum_big"):
        # the reveal: all_sum over a 2-lane party vmap at (K, V)
        def make():
            def body(i, b1, b2):
                def party_fn(x):
                    return comm.all_sum(x + jnp.uint64(i))

                stacked = jnp.stack([b1, b2])
                return jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(stacked)

            return body

        timeit("vmap_allsum_big", make, big_b, big_b2)

    if want("triple_big"):
        # the TFP additive triple at ((M,K), (K,V)) — the full offline draw,
        # under the 2-lane party vmap
        def make():
            from curl_tpu.mpc import get_default_provider

            provider = get_default_provider()

            def body(i, seed2):
                def party_fn(r):
                    comm.set_runtime("vmap")
                    a, b, c = provider.generate_additive_triple(
                        (M, K), (K, V), "matmul"
                    )
                    return c.share + jnp.uint64(0) * r

                return jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(seed2)

            return body

        timeit("triple_big", make,
               jnp.zeros((2, 1, 1), jnp.uint64))

    if want("mm_norescale") or want("mm_raw_protocol"):
        # ablation: the raw Beaver product WITHOUT the MPCTensor wrapper's
        # post-multiply rescale, under the party vmap
        from curl_tpu.mpc.primitives import beaver
        from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor
        from curl_tpu.encoder import FixedPointEncoder

        def make():
            def body(i, xs, ws):
                def party_fn(xsh, wsh):
                    comm.set_runtime("vmap")
                    xt = ArithmeticSharedTensor(xsh, FixedPointEncoder(16))
                    wt = ArithmeticSharedTensor(wsh, FixedPointEncoder(16))
                    return beaver.matmul(xt, wt).share

                return jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(xs, ws)

            return body

        xs2 = jnp.asarray(
            rng0.integers(0, 1 << 63, (2, M, K), dtype=np.uint64))
        ws2 = jnp.asarray(
            rng0.integers(0, 1 << 63, (2, K, V), dtype=np.uint64))
        timeit("mm_norescale", make, xs2, ws2)

    if want("trunc_out"):
        # ablation: EGK truncation alone at the OUTPUT shape (M, V)
        from curl_tpu.mpc.primitives import beaver
        from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor
        from curl_tpu.encoder import FixedPointEncoder

        def make():
            def body(i, zs):
                def party_fn(zsh):
                    comm.set_runtime("vmap")
                    zt = ArithmeticSharedTensor(zsh, FixedPointEncoder(16))
                    return beaver.egk_trunc_pr(zt, 62, 16).share

                return jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(zs)

            return body

        zs2 = jnp.asarray(
            rng0.integers(0, 1 << 40, (2, M, V), dtype=np.uint64))
        timeit("trunc_out", make, zs2)

    if want("mpc_mm"):
        # ablation: MPCTensor.matmul (protocol + rescale + autograd
        # dispatch) through the same direct vmap wiring as mm_norescale
        from curl_tpu.mpc.mpc import MPCTensor
        from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor
        from curl_tpu.encoder import FixedPointEncoder

        def make():
            def body(i, xs, ws):
                def party_fn(xsh, wsh):
                    comm.set_runtime("vmap")
                    xt = MPCTensor(
                        ArithmeticSharedTensor(xsh, FixedPointEncoder(16)))
                    wt = MPCTensor(
                        ArithmeticSharedTensor(wsh, FixedPointEncoder(16)))
                    return xt.matmul(wt).share

                return jax.vmap(party_fn, axis_name=comm.PARTY_AXIS)(xs, ws)

            return body

        xs3 = jnp.asarray(
            rng0.integers(0, 1 << 63, (2, M, K), dtype=np.uint64))
        ws3 = jnp.asarray(
            rng0.integers(0, 1 << 63, (2, K, V), dtype=np.uint64))
        timeit("mpc_mm", make, xs3, ws3)

    if want("mpc_mm_partykeys"):
        # same as mpc_mm but with PROPER per-lane party keys (the
        # compile_parties wiring): quantifies the per-lane tuple-RNG
        # duplication vs the shared-key probe distortion
        from curl_tpu.mpc.mpc import MPCTensor
        from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor
        from curl_tpu.encoder import FixedPointEncoder
        from curl_tpu.parallel.runner import mpc_context

        keys = crng.make_party_keys(11, 2)

        @jax.jit
        def prog(kys, xs, ws):
            def party_fn(pk, xsh, wsh):
                with mpc_context(pk, 2):
                    def step(acc, i):
                        with crng.fork(i):
                            xt = MPCTensor(ArithmeticSharedTensor(
                                xsh, FixedPointEncoder(16)))
                            wt = MPCTensor(ArithmeticSharedTensor(
                                wsh, FixedPointEncoder(16)))
                            out = xt.matmul(wt).share
                        return acc + out.reshape(-1)[:8].sum(), None

                    acc, _ = lax.scan(
                        step, jnp.zeros((), jnp.uint64), jnp.arange(LOOP))
                return acc

            return jax.vmap(
                party_fn, in_axes=(0, 0, 0), axis_name=comm.PARTY_AXIS
            )(kys, xs, ws)

        xs4 = jnp.asarray(
            rng0.integers(0, 1 << 63, (2, M, K), dtype=np.uint64))
        ws4 = jnp.asarray(
            rng0.integers(0, 1 << 63, (2, K, V), dtype=np.uint64))
        t0 = time.time()
        np.asarray(jax.device_get(prog(keys, xs4, ws4)))
        compile_s = time.time() - t0
        times = []
        for i in range(REPS):
            t0 = time.time()
            np.asarray(jax.device_get(prog(keys, xs4, ws4)))
            times.append((time.time() - t0) / LOOP)
        rec = {"stage": "mpc_mm_partykeys",
               "latency_sec": round(min(times), 5),
               "compile_sec": round(compile_s, 1), "loop": LOOP}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if want("beaver_mm_full"):
        # reference point: the full private matmul via compile_parties
        x = rng0.normal(size=(M, K))
        w = rng0.normal(size=(K, V)) * 0.02
        xe = curl_tpu.cryptensor(x)
        we = curl_tpu.cryptensor(w)

        def f(xm, wm):
            return xm.matmul(wm)

        def step_body(acc, inp):
            return acc, None

        step = curl_tpu.compile_parties(
            lambda xm, wm: _loop_mpc(f, xm, wm), 2
        )

        def _loop_mpc(fn, *args):
            from jax import lax as _lax

            def body(acc, i):
                with crng.fork(i + (29 << 20)):
                    out = fn(*args)
                return acc + out.share.reshape(-1)[:8].sum(), None

            acc, _ = _lax.scan(
                body, jnp.zeros((), jnp.uint64), jnp.arange(LOOP)
            )
            with crng.fork((29 << 20) + LOOP + 7):
                out = fn(*args)
            return out, acc

        t0 = time.time()
        out = step(jax.random.PRNGKey(7), xe.mpc, we.mpc)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[-1]))
        compile_s = time.time() - t0
        times = []
        for i in range(REPS):
            t0 = time.time()
            out = step(jax.random.PRNGKey(8 + i), xe.mpc, we.mpc)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[-1]))
            times.append((time.time() - t0) / LOOP)
        rec = {"stage": "beaver_mm_full", "latency_sec": round(min(times), 5),
               "compile_sec": round(compile_s, 1), "loop": LOOP}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "benchmarks",
        "results", "beaver_big_breakdown.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
