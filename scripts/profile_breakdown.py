#!/usr/bin/env python3
"""Component-level latency breakdown of the 2-party GPT-2 forward on TPU.

The full fused forward measures ~3.6 s (honest device-synchronized timing,
BENCH history). This script compiles each pipeline stage as its own program
and times it the same way, to locate the budget:

  embed      token embedding via the one-hot LUT protocol
  block      one transformer block (LN -> attn(softmax) -> LN -> FFN(gelu))
  lm_head    final LN + Linear(768 -> 50257)
  vocab_sm   softmax over the vocab axis (max tournament + nexp + recip)
plus isolated ops at GPT-2 shapes:
  gelu_ffn   gelu on (B, T, 3072)
  attn_sm    softmax on (B*12, T, T)
  layernorm  on (B, T, 768)
  ltz        comparison (A2B + SPK circuit) on (B, T, 3072)
  beaver_mm  private matmul (B*T, 768) @ (768, 768)

Usage: python scripts/profile_breakdown.py [stage ...]
Env: SEQ (default 64), BATCH (1), REPS (3), LOOP (1; >1 runs the stage N
times inside ONE compiled program — lax.scan with per-iteration forked
protocol randomness, checksum carried so no iteration is dead code — and
reports per-iteration time, isolating device time from the ~26 ms
remote-dispatch floor that single-call timings include)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ = int(os.environ.get("SEQ", "64"))
BATCH = int(os.environ.get("BATCH", "1"))
REPS = int(os.environ.get("REPS", "3"))
LOOP = int(os.environ.get("LOOP", "1"))

_LOOP_FORK_BASE = 29 << 20  # distinct from block/fold/seq fork salt ranges


def _jnp_u64(rng, shape):
    import jax.numpy as _jnp

    return _jnp.asarray(
        rng.integers(0, 1 << 63, size=shape, dtype=np.uint64)
    )


def _looped(f, n: int):
    """Wrap a stage fn so ONE compiled program runs it n times with fresh
    protocol randomness per iteration (masks are not elidable), carrying a
    checksum so XLA keeps every iteration."""
    import jax
    from jax import lax
    import jax.numpy as jnp

    from curl_tpu import random as crng

    def g(*args):
        def body(acc, i):
            with crng.fork(i + _LOOP_FORK_BASE):
                out = f(*args)
            # checksum EVERY output leaf: a partial checksum lets XLA
            # dead-code-eliminate the unchecked outputs' computation
            # (observed: triple_big timing only its first component)
            leaves = [out.share] if hasattr(out, "share") else \
                jax.tree_util.tree_leaves(out)
            s = jnp.zeros((), jnp.uint64)
            for sh in leaves:
                s = s + sh.sum().astype(jnp.uint64)
            return acc + s, None

        acc, _ = lax.scan(body, jnp.zeros((), jnp.uint64), jnp.arange(n))
        with crng.fork(_LOOP_FORK_BASE + n + 1):
            out = f(*args)
        return out, acc

    return g


def _sync_factory():
    import jax

    reduce_fn = jax.jit(lambda s: s.sum())

    def sync(out):
        import jax.tree_util as jtu

        leaves = jtu.tree_leaves(out)
        # fetch the LAST leaf too: in loop mode it is the scan checksum —
        # fetching it is what forces all n iterations to have executed
        if len(leaves) > 1:
            np.asarray(jax.device_get(leaves[-1]))
        return int(np.asarray(jax.device_get(reduce_fn(leaves[0]))))

    return sync


def _time(tag, step, *args, sync=None, results=None):
    import jax

    t0 = time.time()
    out = step(jax.random.PRNGKey(7), *args)
    sync(out)
    compile_s = time.time() - t0
    times = []
    for i in range(REPS):
        t0 = time.time()
        out = step(jax.random.PRNGKey(8 + i), *args)
        sync(out)
        times.append((time.time() - t0) / LOOP)
    rec = {"stage": tag, "latency_sec": round(min(times), 4),
           "compile_sec": round(compile_s, 1), "loop": LOOP,
           "all": [round(t, 4) for t in times]}
    print(json.dumps(rec), flush=True)
    results.append(rec)
    return rec


def main():
    only = set(sys.argv[1:])

    import jax

    import curl_tpu
    from curl_tpu import models, nn

    base = os.path.join(os.path.dirname(curl_tpu.__file__), "configs")
    curl_tpu.cfg.load_config(os.path.join(base, "default.yaml"))
    curl_tpu.cfg.set("functions.max_method", "scan_reduction")
    # mirror bench.py's knobs so stage profiles match the headline config
    if "BENCH_SCAN_WIDTH" in os.environ:
        curl_tpu.cfg.set(
            "functions.scan_fixed_width", int(os.environ["BENCH_SCAN_WIDTH"])
        )
    if os.environ.get("BENCH_FUSED_MAX", "1") == "1":
        import jax as _jax

        if _jax.default_backend() not in ("cpu",):
            curl_tpu.cfg.set("mpc.fused_max_step", "pallas_tpu")
    if os.environ.get("BENCH_FUSED_COMPARE", "1") == "1":
        import jax as _jax

        if _jax.default_backend() not in ("cpu",):
            curl_tpu.cfg.set("mpc.fused_compare", "pallas_tpu")
    if os.environ.get("BENCH_FUSED_MUL", "1") == "1":
        import jax as _jax

        if _jax.default_backend() not in ("cpu",):
            curl_tpu.cfg.set("mpc.fused_mul", "pallas_tpu")
    if "BENCH_RING_MM" in os.environ:
        curl_tpu.cfg.set("mpc.ring_mm_kernel", os.environ["BENCH_RING_MM"])
    # mirror bench.py: honor BENCH_BULK_RNG if set, else leave the config
    # "auto" default (rbg on TPU) so stage profiles match the headline run
    if "BENCH_BULK_RNG" in os.environ:
        curl_tpu.cfg.set("mpc.bulk_rng", os.environ["BENCH_BULK_RNG"])
    curl_tpu.init(world_size=2, seed=11)

    sync = _sync_factory()
    results = []

    _cp_orig = curl_tpu.compile_parties

    def _cp(f, ws, **kw):
        return _cp_orig(_looped(f, LOOP) if LOOP > 1 else f, ws, **kw)

    curl_tpu.compile_parties = _cp
    rng = np.random.default_rng(0)

    def want(tag):
        return not only or tag in only

    D, H, V = 768, 12, 50257

    if want("embed"):
        m = models.GPT2(seq_len=SEQ, full=True)
        m.encrypt(src=0)
        emb = m._modules["tok_embed"]
        w = emb._parameters["weight"]
        ids = rng.integers(0, 1000, size=(BATCH, SEQ)).astype(np.float64)
        ide = curl_tpu.cryptensor(ids, precision=0)

        def f(idm, wm):
            return idm.evaluate_embed(wm)

        step = curl_tpu.compile_parties(f, 2)
        _time("embed", step, ide.mpc, w.mpc, sync=sync, results=results)

    if want("block"):
        m = models.GPT(embed_dim=D, num_heads=H, num_blocks=1,
                       vocab_size=V, seq_len=SEQ, full=False)
        m.encrypt(src=0)
        apply_fn, params = m.functional()
        x = rng.normal(size=(BATCH, SEQ, D))
        xe = curl_tpu.cryptensor(x)
        step = curl_tpu.compile_parties(apply_fn, 2)
        _time("block", step, params, xe.mpc, sync=sync, results=results)

    if want("lm_head"):
        ln = nn.LayerNorm(D)
        fc = nn.Linear(D, V)
        ln.encrypt(src=0)
        fc.encrypt(src=0)
        lp = ln._parameters
        fp = fc._parameters
        x = rng.normal(size=(BATCH, SEQ, D))
        xe = curl_tpu.cryptensor(x)

        def f(xm, lw, lb, fw, fb):
            h = nn.module.layernorm(xm, lw, lb)
            return h.matmul(fw.t()).add(fb)

        step = curl_tpu.compile_parties(f, 2)
        _time("lm_head", step, xe.mpc,
              lp["weight"].mpc, lp["bias"].mpc,
              fp["weight"].mpc, fp["bias"].mpc, sync=sync, results=results)

    if want("vocab_sm"):
        x = rng.normal(size=(BATCH, SEQ, V))
        xe = curl_tpu.cryptensor(x)

        def f(xm):
            return xm.softmax(-1)

        step = curl_tpu.compile_parties(f, 2)
        _time("vocab_sm", step, xe.mpc, sync=sync, results=results)

    if want("vocab_max"):
        x = rng.normal(size=(BATCH, SEQ, V))
        xe = curl_tpu.cryptensor(x)
        step = curl_tpu.compile_parties(
            lambda xm: xm.max(-1, keepdim=True)[0], 2
        )
        _time("vocab_max", step, xe.mpc, sync=sync, results=results)

    if want("vocab_maxv"):
        # max VALUES only (what softmax's max-shift actually uses): the
        # cascade tournament without the argmax one-hot eq + tie-break
        x = rng.normal(size=(BATCH, SEQ, V))
        xe = curl_tpu.cryptensor(x)
        step = curl_tpu.compile_parties(
            lambda xm: xm.max_value(-1, keepdim=True), 2
        )
        _time("vocab_maxv", step, xe.mpc, sync=sync, results=results)

    if want("vocab_exp"):
        # exp_all_neg over the full vocab (the softmax numerator)
        x = -np.abs(rng.normal(size=(BATCH, SEQ, V))) - 0.1
        xe = curl_tpu.cryptensor(x)

        def f(xm):
            from curl_tpu.functions.approximations import exp

            with curl_tpu.cfg.temp_override({"functions.exp_all_neg": True}):
                return exp(xm)

        step = curl_tpu.compile_parties(f, 2)
        _time("vocab_exp", step, xe.mpc, sync=sync, results=results)

    if want("gelu_ffn"):
        x = rng.normal(size=(BATCH, SEQ, 4 * D))
        xe = curl_tpu.cryptensor(x)
        step = curl_tpu.compile_parties(lambda xm: xm.gelu(), 2)
        _time("gelu_ffn", step, xe.mpc, sync=sync, results=results)

    if want("attn_sm"):
        x = rng.normal(size=(BATCH * H, SEQ, SEQ))
        xe = curl_tpu.cryptensor(x)
        step = curl_tpu.compile_parties(lambda xm: xm.softmax(-1), 2)
        _time("attn_sm", step, xe.mpc, sync=sync, results=results)

    if want("layernorm"):
        ln = nn.LayerNorm(D)
        ln.encrypt(src=0)
        lp = ln._parameters
        x = rng.normal(size=(BATCH, SEQ, D))
        xe = curl_tpu.cryptensor(x)

        def f(xm, w, b):
            return nn.module.layernorm(xm, w, b)

        step = curl_tpu.compile_parties(f, 2)
        _time("layernorm", step, xe.mpc, lp["weight"].mpc, lp["bias"].mpc,
              sync=sync, results=results)

    if want("ltz"):
        x = rng.normal(size=(BATCH, SEQ, 4 * D))
        xe = curl_tpu.cryptensor(x)
        step = curl_tpu.compile_parties(lambda xm: xm.lt(0.0), 2)
        _time("ltz", step, xe.mpc, sync=sync, results=results)

    if want("beaver_mm"):
        a = rng.normal(size=(BATCH * SEQ, D))
        b = rng.normal(size=(D, D))
        ae = curl_tpu.cryptensor(a)
        be = curl_tpu.cryptensor(b)
        step = curl_tpu.compile_parties(lambda am, bm: am.matmul(bm), 2)
        _time("beaver_mm", step, ae.mpc, be.mpc, sync=sync, results=results)

    # ---- lm_head sub-stage isolation (the Beaver matmul against the
    # (D, V) weight costs ~10x its arithmetic-intensity floor; find where):
    if want("mm_big"):
        # full Beaver matmul at the lm_head shape
        a = rng.normal(size=(BATCH * SEQ, D))
        b = rng.normal(size=(D, V)) * 0.02
        ae = curl_tpu.cryptensor(a)
        be = curl_tpu.cryptensor(b)
        step = curl_tpu.compile_parties(lambda am, bm: am.matmul(bm), 2)
        _time("mm_big", step, ae.mpc, be.mpc, sync=sync, results=results)

    if want("mm_big_pub"):
        # ONE public ring matmul at the lm_head shape (the primitive the
        # Beaver protocol invokes ~3x)
        import jax as _jax
        import jax.numpy as _jnp

        from curl_tpu import ring as _ring

        am = _jnp.asarray(
            rng.integers(0, 1 << 63, size=(BATCH * SEQ, D), dtype=np.uint64)
        )
        bm = _jnp.asarray(
            rng.integers(0, 1 << 63, size=(D, V), dtype=np.uint64)
        )

        @_jax.jit
        def f(x, y):
            return _ring.matmul(x, y)

        class _W:  # shim for _time's (key, *args) signature
            pass

        step = lambda key, x, y: f(x, y)  # noqa: E731
        _time("mm_big_pub", step, am, bm, sync=sync, results=results)

    # ---- embed sub-stage isolation: the one-hot construction + rotation
    # gather vs the (N, V) @ (V, D) ring matmul against the table
    if want("embed_onehot"):
        import jax as _jax
        import jax.numpy as _jnp

        from curl_tpu import ring as _ring
        from curl_tpu import random as _crng

        N = BATCH * SEQ

        @_jax.jit
        def f(key):
            with _crng.KeyContext(
                {"local": key, "prev": key, "next": key, "global": key}
            ):
                r = _crng.random_ring((N,), "local")
                rc = _jnp.mod(_ring.to_signed(r), _jnp.int64(V))
                onehot = (
                    rc[:, None] == _jnp.arange(V, dtype=_jnp.int64)
                ).astype(_jnp.uint64)
                przs = _crng.random_ring((N, V), "prev")
                share = przs + onehot
                shift = _crng.random_ring((N,), "next")
                shift = _jnp.mod(_ring.to_signed(shift), _jnp.int64(V)).astype(
                    _jnp.int32
                )
                j = _jnp.arange(V, dtype=_jnp.int32)[None, :]
                idx = _jnp.mod(j - shift[:, None], V)
                rotated = _jnp.take_along_axis(share, idx, axis=1)
            return rotated

        step = lambda key: f(key)  # noqa: E731
        _time("embed_onehot", step, sync=sync, results=results)

    if want("embed_mm"):
        # the 3-product protocol matmul at embed shapes: (N, V) @ (V, D),
        # K = V too deep for one fused acc pass -> three kernel matmuls
        import jax as _jax

        from curl_tpu import ring as _ring

        N = BATCH * SEQ
        lhs = [
            _jnp_u64(rng, (N, V)) for _ in range(3)
        ]
        rhs = [
            _jnp_u64(rng, (V, D)) for _ in range(3)
        ]

        @_jax.jit
        def f3(ls, rs):
            return _ring.matmul_acc(list(zip(ls, rs)))

        step = lambda key: f3(lhs, rhs)  # noqa: E731
        _time("embed_mm", step, sync=sync, results=results)

    if want("rng_big"):
        # bulk protocol randomness at the weight-mask shape (D, V)
        import jax as _jax

        from curl_tpu import random as _crng

        @_jax.jit
        def f(key):
            with _crng.KeyContext(
                {"local": key, "prev": key, "next": key, "global": key}
            ):
                return _crng.random_ring((D, V), "local")

        step = lambda key: f(key)  # noqa: E731
        _time("rng_big", step, sync=sync, results=results)

    # ---- mm_big decomposition: where do the ~80 ms of Beaver wrapper
    # overhead (mm_big - mm_big_pub) actually live?
    if want("przs_big"):
        # one full PRZS share at the weight shape (what _share_from_local
        # pays per tuple component)
        def f():
            from curl_tpu import random as _crng

            return _crng.przs_arithmetic((D, V))

        step = curl_tpu.compile_parties(f, 2)
        _time("przs_big", step, sync=sync, results=results)

    if want("triple_big"):
        # full TFP triple generation at the lm_head matmul shapes:
        # dealer draws a, b + ring matmul c = a@b + 3x PRZS sharing
        def f():
            from curl_tpu.mpc import get_default_provider

            a, b, c = get_default_provider().generate_additive_triple(
                (BATCH * SEQ, D), (D, V), "matmul"
            )
            return a.share, b.share, c.share

        step = curl_tpu.compile_parties(f, 2)
        _time("triple_big", step, sync=sync, results=results)

    if want("trunc_big"):
        # the product rescale at the lm_head OUTPUT shape (the step that
        # follows the Beaver matmul inside .matmul)
        x = rng.normal(size=(BATCH * SEQ, V))
        xe = curl_tpu.cryptensor(x)

        def f(xm):
            from curl_tpu.config import cfg as _cfg

            if _cfg.encoder.trunc_method.prod == "crypten":
                return xm.div_trunc(xm.encoder.scale)
            return xm.egk_trunc_pr(62, xm.encoder.precision_bits)

        step = curl_tpu.compile_parties(f, 2)
        _time("trunc_big", step, xe.mpc, sync=sync, results=results)

    if want("mm_acc_big"):
        # the fused 3-pair matmul_acc at the protocol's exact shapes:
        # (eps @ b_plain) + (eps @ b_share) + (x @ delta) with the 2-D
        # operands SHARED (what the masked-operand Beaver runs online)
        import jax as _jax

        from curl_tpu import ring as _ring

        N = BATCH * SEQ
        lhs = [_jnp_u64(rng, (2, N, D)) for _ in range(3)]
        rhs = [_jnp_u64(rng, (D, V)) for _ in range(3)]

        @_jax.jit
        def f3(ls, rs):
            return _ring.matmul_acc(list(zip(ls, rs)))

        step = lambda key: f3(lhs, rhs)  # noqa: E731
        _time("mm_acc_big", step, sync=sync, results=results)

    out_path = os.environ.get("OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "benchmarks", "results", f"breakdown_seq{SEQ}_b{BATCH}.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
