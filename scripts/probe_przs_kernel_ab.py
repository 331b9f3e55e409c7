#!/usr/bin/env python3
"""A/B the fused PRZS kernel under the REAL party-vmap wiring.

beaver_big probe (unbatched keys) measured the kernel przs at 1.37 ms,
but profile_breakdown's compile_parties wiring still shows 29.9 ms at
(768, 50257) — isolate whether the regression is the batched (grid P=2)
kernel itself, the u64 combine, or the wrapper.

Stages:
  kern_unbatched   direct pallas_przs_u64, P=1           [stage-1 repro]
  kern_vmap        vmap over 2 stacked seed pairs (rule -> grid P=2)
  kern_vmap_u32    same but checksum the raw kernel u32 planes (no u64
                   combine) — isolates the combine cost
  przs_auto        run_parties przs_arithmetic, przs_kernel=auto
  przs_null        run_parties przs_arithmetic, przs_kernel=null (select)

Usage: LOOP=16 python scripts/probe_przs_kernel_ab.py [stage ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOOP = int(os.environ.get("LOOP", "16"))
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
    from curl_tpu.ops import pallas_przs

    curl_tpu.init(world_size=2, seed=11)
    results = []

    def want(tag):
        return not only or tag in only

    def report(tag, prog, *args):
        t0 = time.time()
        np.asarray(jax.device_get(prog(*args)))
        compile_s = time.time() - t0
        times = []
        for _ in range(REPS):
            t0 = time.time()
            np.asarray(jax.device_get(prog(*args)))
            times.append((time.time() - t0) / LOOP)
        rec = {"stage": tag, "latency_sec": round(min(times), 5),
               "compile_sec": round(compile_s, 1), "loop": LOOP}
        print(json.dumps(rec), flush=True)
        results.append(rec)

    n = K * V
    rows = pallas_przs._rows_for(n)

    keys = crng.make_party_keys(11, 2, stacked=False)
    sp0 = pallas_przs.seed_pair_from_keys(
        jax.random.fold_in(keys["prev"][0], 3),
        jax.random.fold_in(keys["next"][0], 3),
    )
    sp1 = pallas_przs.seed_pair_from_keys(
        jax.random.fold_in(keys["prev"][1], 3),
        jax.random.fold_in(keys["next"][1], 3),
    )
    sps = jnp.stack([sp0, sp1])  # (2, 2, 2)

    if want("kern_unbatched"):
        @jax.jit
        def prog(sp):
            def body(acc, i):
                out = pallas_przs.pallas_przs_u64(
                    sp + i.astype(jnp.int32), (K, V)
                )
                return acc + out.reshape(-1)[:8].sum(), None

            acc, _ = lax.scan(body, jnp.zeros((), jnp.uint64),
                              jnp.arange(LOOP))
            return acc

        report("kern_unbatched", prog, sp0)

    if want("kern_vmap"):
        @jax.jit
        def prog(sp2):
            def lane(sp):
                def body(acc, i):
                    out = pallas_przs.pallas_przs_u64(
                        sp + i.astype(jnp.int32), (K, V)
                    )
                    return acc + out.reshape(-1)[:8].sum(), None

                acc, _ = lax.scan(body, jnp.zeros((), jnp.uint64),
                                  jnp.arange(LOOP))
                return acc

            return jax.vmap(lane)(sp2)

        report("kern_vmap", prog, sps)

    if want("kern_vmap_u32"):
        fused = pallas_przs._get_przs(rows)

        @jax.jit
        def prog(sp2):
            def lane(sp):
                def body(acc, i):
                    flat = fused(sp + i.astype(jnp.int32))
                    return acc + flat.reshape(-1)[:8].sum(), None

                acc, _ = lax.scan(body, jnp.zeros((), jnp.uint64),
                                  jnp.arange(LOOP))
                return acc

            return jax.vmap(lane)(sp2)

        report("kern_vmap_u32", prog, sps)

    from curl_tpu.parallel import runner

    def przs_loop():
        def body(acc, i):
            with crng.fork(i):
                out = crng.przs_arithmetic((K, V))
            return acc + out.reshape(-1)[:8].sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                              jnp.arange(LOOP))
        return acc

    if want("przs_auto"):
        prog = curl_tpu.compile_parties(lambda: przs_loop(), 2)
        report("przs_auto", prog, jax.random.PRNGKey(7))

    if want("przs_null"):
        with curl_tpu.cfg.temp_override({"mpc.przs_kernel": None}):
            prog = curl_tpu.compile_parties(lambda: przs_loop(), 2)
            report("przs_null", prog, jax.random.PRNGKey(7))

    if want("sum_u64"):
        # checksum-cost theory: a full u64 .sum() over the kernel output
        # cannot fuse into the custom call and the X64-pair reduce is slow
        def przs_sum_loop():
            def body(acc, i):
                with crng.fork(i):
                    out = crng.przs_arithmetic((K, V))
                return acc + out.sum().astype(jnp.uint64), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                  jnp.arange(LOOP))
            return acc

        prog = curl_tpu.compile_parties(lambda: przs_sum_loop(), 2)
        report("sum_u64", prog, jax.random.PRNGKey(7))

    if want("reveal_big"):
        # one u64 psum across the 2 lanes at the weight shape (the delta
        # reveal's collective cost in isolation)
        def reveal_loop():
            def body(acc, i):
                with crng.fork(i):
                    x = crng.przs_arithmetic((K, V))
                    r = comm.all_sum(x)
                return acc + r.reshape(-1)[:8].sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                  jnp.arange(LOOP))
            return acc

        prog = curl_tpu.compile_parties(lambda: reveal_loop(), 2)
        report("reveal_big", prog, jax.random.PRNGKey(7))

    if want("reveal_gather"):
        # hypothesis: the u64 psum lowers through a slow X64 reduce; an
        # all_gather + unrolled elementwise adds (the all_xor pattern)
        # should run at elementwise-add speed
        from jax import lax

        def reveal_loop():
            def body(acc, i):
                with crng.fork(i):
                    x = crng.przs_arithmetic((K, V))
                    g = lax.all_gather(x, comm.PARTY_AXIS)
                    r = g[0] + g[1]
                return acc + r.reshape(-1)[:8].sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                  jnp.arange(LOOP))
            return acc

        prog = curl_tpu.compile_parties(lambda: reveal_loop(), 2)
        report("reveal_gather", prog, jax.random.PRNGKey(7))

    if want("reveal_gather_null"):
        with curl_tpu.cfg.temp_override({"mpc.przs_kernel": None}):
            from jax import lax

            def reveal_loop():
                def body(acc, i):
                    with crng.fork(i):
                        x = crng.przs_arithmetic((K, V))
                        g = lax.all_gather(x, comm.PARTY_AXIS)
                        r = g[0] + g[1]
                    return acc + r.reshape(-1)[:8].sum(), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                      jnp.arange(LOOP))
                return acc

            prog = curl_tpu.compile_parties(lambda: reveal_loop(), 2)
            report("reveal_gather_null", prog, jax.random.PRNGKey(7))

    if want("reveal_kernel2d"):
        # the native-2-D-tiled kernel variant (no output relayout) + psum:
        # the number that decides whether the kernel default flips back on
        with curl_tpu.cfg.temp_override({"mpc.przs_kernel": "pallas_tpu"}):
            def reveal_loop():
                def body(acc, i):
                    with crng.fork(i):
                        x = crng.przs_arithmetic((K, V))
                        r = comm.all_sum(x)
                    return acc + r.reshape(-1)[:8].sum(), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                      jnp.arange(LOOP))
                return acc

            prog = curl_tpu.compile_parties(lambda: reveal_loop(), 2)
            report("reveal_kernel2d", prog, jax.random.PRNGKey(7))

    if want("mm_real_kernel2d"):
        with curl_tpu.cfg.temp_override({"mpc.przs_kernel": "pallas_tpu"}):
            rng0 = np.random.default_rng(0)
            x = rng0.normal(size=(64, K))
            w = rng0.normal(size=(K, V)) * 0.02
            xe = curl_tpu.cryptensor(x)
            we = curl_tpu.cryptensor(w)

            def mm_loop(xm, wm):
                def body(acc, i):
                    with crng.fork(i):
                        out = xm.matmul(wm)
                    return acc + out.share.reshape(-1)[:8].sum(), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                      jnp.arange(LOOP))
                return acc

            prog = curl_tpu.compile_parties(mm_loop, 2)
            report("mm_real_kernel2d", prog, jax.random.PRNGKey(7),
                   xe.mpc, we.mpc)

    if want("reveal_psum_null"):
        with curl_tpu.cfg.temp_override({"mpc.przs_kernel": None}):
            def reveal_loop():
                def body(acc, i):
                    with crng.fork(i):
                        x = crng.przs_arithmetic((K, V))
                        r = comm.all_sum(x)
                    return acc + r.reshape(-1)[:8].sum(), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                      jnp.arange(LOOP))
                return acc

            prog = curl_tpu.compile_parties(lambda: reveal_loop(), 2)
            report("reveal_psum_null", prog, jax.random.PRNGKey(7))

    if want("mm_real"):
        # the full private matmul under the REAL wiring with a cheap
        # checksum: the honest mm number (beaver_big's mpc_mm used shared
        # keys -> degenerate P=1 kernels; breakdown's mm_big pays the
        # full-sum checksum)
        from curl_tpu.mpc.mpc import MPCTensor
        from curl_tpu.mpc.primitives.arithmetic import ArithmeticSharedTensor

        rng0 = np.random.default_rng(0)
        x = rng0.normal(size=(64, K))
        w = rng0.normal(size=(K, V)) * 0.02
        xe = curl_tpu.cryptensor(x)
        we = curl_tpu.cryptensor(w)

        def mm_loop(xm, wm):
            def body(acc, i):
                with crng.fork(i):
                    out = xm.matmul(wm)
                return acc + out.share.reshape(-1)[:8].sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                  jnp.arange(LOOP))
            return acc

        prog = curl_tpu.compile_parties(mm_loop, 2)
        report("mm_real", prog, jax.random.PRNGKey(7), xe.mpc, we.mpc)

    if want("mm_real_null"):
        with curl_tpu.cfg.temp_override({"mpc.przs_kernel": None}):
            from curl_tpu.mpc.mpc import MPCTensor

            rng0 = np.random.default_rng(0)
            x = rng0.normal(size=(64, K))
            w = rng0.normal(size=(K, V)) * 0.02
            xe = curl_tpu.cryptensor(x)
            we = curl_tpu.cryptensor(w)

            def mm_loop(xm, wm):
                def body(acc, i):
                    with crng.fork(i):
                        out = xm.matmul(wm)
                    return acc + out.share.reshape(-1)[:8].sum(), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64),
                                      jnp.arange(LOOP))
                return acc

            prog = curl_tpu.compile_parties(mm_loop, 2)
            report("mm_real_null", prog, jax.random.PRNGKey(7), xe.mpc, we.mpc)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "benchmarks",
        "results", "przs_kernel_ab.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
