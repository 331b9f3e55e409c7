#!/usr/bin/env python3
"""Headline benchmark: 2-party GPT-2 private-inference throughput.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tokens/sec", "vs_baseline": N}

Measures the compiled 2-party forward of the GPT-2 model (embedding via the
one-hot LUT protocol, 12 pre-LN blocks with private attention + GELU LUTs,
LM head + private softmax over the vocab) on the available accelerator,
simulated-party mode (both parties' programs fused into one XLA program).

vs_baseline compares against the reference Curl framework running the same
2-party GPT-2 forward on this machine's CPU (measured via
benchmarks/reference_baseline.py when available, else the stored value in
benchmarks/baseline_measured.json).
"""

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "1"))
SEQ = int(os.environ.get("BENCH_SEQ", "64"))
MODEL = os.environ.get("BENCH_MODEL", "GPT2")
FULL = os.environ.get("BENCH_FULL", "1") == "1"
REPS = int(os.environ.get("BENCH_REPS", "3"))
SANITY = os.environ.get("BENCH_SANITY", "1") == "1"


def _make_sync():
    """Timing must NOT trust jax.block_until_ready: on the remote 'axon'
    platform it returns before device execution completes (round-1 headline
    numbers were ~5,000x wrong because of this). Force completion by
    reducing the output ON DEVICE and fetching the scalar to host — the
    fetch cannot return until the whole program has run."""
    import jax
    import numpy as np

    reduce_fn = jax.jit(lambda s: s.sum())

    def sync(out):
        return int(np.asarray(jax.device_get(reduce_fn(out.share))))

    return sync


def _mxu_floor_sec(model, batch, seq, backend):
    """Arithmetic-intensity lower bound for the fused 2-party program.

    Every private matmul runs as balanced-int8-limb MXU contractions
    (curl_tpu/ring.py): 64x the plain MAC count, ~3 ring matmuls per Beaver
    product (a*delta, eps*b public-side + offline triple's a@b), x2 parties
    fused in one program. Any measured latency materially below this bound
    indicates broken timing, not a fast program."""
    macs = model.forward_macs(batch, seq) if hasattr(model, "forward_macs") else 0
    int8_ops = macs * 2 * 64 * 3 * 2  # MAC=2 ops, limb 64x, beaver 3x, parties 2x
    peak = 394e12 if backend != "cpu" else 200e9  # v5e int8 peak / CPU guess
    return int8_ops / peak


def _probe_device(timeout_sec=180):
    """Probe the accelerator in a subprocess with a hard timeout.

    The remote 'axon' TPU tunnel hangs jax.devices() indefinitely during
    outages; a hung benchmark produces nothing. If the probe can't reach a
    device in time, fall back to the CPU backend (recorded honestly in the
    output's detail.backend) so the harness always gets a number.
    """
    import subprocess

    if os.environ.get("CURL_TPU_PLATFORM"):
        return False  # explicit override, respect it
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_sec,
            capture_output=True,
        )
        if r.returncode == 0:
            return False
    except subprocess.TimeoutExpired:
        pass
    print(
        f"# accelerator probe failed/hung (> {timeout_sec}s or error); "
        "falling back to CPU backend",
        file=sys.stderr,
    )
    os.environ["CURL_TPU_PLATFORM"] = "cpu"
    return True


def main():
    # fail fast on configuration errors before entering the fallback chain
    cpu_fallback = _probe_device()
    import curl_tpu
    from curl_tpu import models

    if not hasattr(models, MODEL):
        raise SystemExit(
            f"unknown BENCH_MODEL={MODEL!r}; available: "
            f"{[n for n in dir(models) if n[0].isupper()]}"
        )

    # the remote TPU compiler can fail on the largest graphs (memory-bound,
    # service-side); fall back through smaller sequence lengths so a result
    # is always produced
    fallbacks = [SEQ] + [s for s in (32, 16, 8) if s < SEQ]
    if cpu_fallback and "BENCH_SEQ" not in os.environ:
        # emergency CPU run: the full seq-64 forward takes many minutes on
        # host; keep the outage-mode number cheap and honest
        fallbacks = [16, 8]
    for seq in fallbacks:
        try:
            _run(seq)
            return
        except Exception as e:  # noqa: BLE001
            import sys
            import traceback

            traceback.print_exc(file=sys.stderr)
            print(f"# seq={seq} failed ({type(e).__name__}); falling back",
                  file=sys.stderr)
    raise SystemExit("all benchmark configurations failed")


def _run(seq):
    import jax
    import numpy as np

    import curl_tpu
    from curl_tpu import models

    base = os.path.join(os.path.dirname(curl_tpu.__file__), "configs")
    curl_tpu.cfg.load_config(os.path.join(base, os.environ.get("BENCH_CONFIG", "default.yaml")))
    if os.environ.get("BENCH_SCAN_MAX", "1") == "1":
        # fixed-shape scan tournament: ~log2(n)x smaller XLA graph for the
        # vocab softmax (protocol-equivalent rounds; see functions/maximum.py)
        curl_tpu.cfg.set("functions.max_method", "scan_reduction")
    on_tpu = jax.default_backend() not in ("cpu",)
    if "BENCH_BULK_RNG" in os.environ:
        curl_tpu.cfg.set("mpc.bulk_rng", os.environ["BENCH_BULK_RNG"])
    # else: config default "auto" = rbg on TPU — measured fastest of the
    # three bulk-RNG backends (r4c sweep: rbg 0.167 s / pallas_tpu 0.233 s
    # / xla-threefry 0.245 s forward; validate_rbg_tpu.py on-device check)
    if "BENCH_FUSED_MAX" in os.environ:
        if os.environ["BENCH_FUSED_MAX"] == "1":
            curl_tpu.cfg.set("mpc.fused_max_step", "pallas_tpu")
    elif on_tpu:
        # fused tournament step: packed compare + B2A + select in one
        # kernel, all randomness from the hardware PRNG
        # (ops/pallas_max_step.py; validated by scripts/validate_fused_max.py)
        curl_tpu.cfg.set("mpc.fused_max_step", "pallas_tpu")
    if "BENCH_FUSED_COMPARE" in os.environ:
        if os.environ["BENCH_FUSED_COMPARE"] == "1":
            curl_tpu.cfg.set("mpc.fused_compare", "pallas_tpu")
    elif on_tpu:
        # every _ltz-derived comparison (relu/sign/gelu checks) as one
        # fused kernel (ops/pallas_max_step.fused_ltz_mpc)
        curl_tpu.cfg.set("mpc.fused_compare", "pallas_tpu")
    if "BENCH_FUSED_MUL" in os.environ:
        if os.environ["BENCH_FUSED_MUL"] == "1":
            curl_tpu.cfg.set("mpc.fused_mul", "pallas_tpu")
    elif on_tpu:
        # elementwise private mul/square + rescale as one fused kernel
        # (ops/pallas_mul.py; validated by scripts/validate_fused_mul.py)
        curl_tpu.cfg.set("mpc.fused_mul", "pallas_tpu")
    if "BENCH_FUSED_TRUNC" in os.environ:
        if os.environ["BENCH_FUSED_TRUNC"] == "1":
            curl_tpu.cfg.set("mpc.fused_trunc", "pallas_tpu")
    elif on_tpu:
        # standalone EGK truncation (per-LUT-call index trunc) as the same
        # fused kernel family (ops/pallas_mul.fused_trunc_mpc)
        curl_tpu.cfg.set("mpc.fused_trunc", "pallas_tpu")
    if "BENCH_RING_MM" in os.environ:
        curl_tpu.cfg.set("mpc.ring_mm_kernel", os.environ["BENCH_RING_MM"])
    if "BENCH_LUT_FASTPATH" in os.environ:
        curl_tpu.cfg.set("mpc.lut_fastpath", os.environ["BENCH_LUT_FASTPATH"] == "1")
    if "BENCH_SCAN_WIDTH" in os.environ:
        curl_tpu.cfg.set(
            "functions.scan_fixed_width", int(os.environ["BENCH_SCAN_WIDTH"])
        )
    elif on_tpu and seq >= 64:
        # the remote TPU compiler fails on the deep fold scan (W=2048 -> 31
        # fold steps) at seq>=64; W=16384 is the best measured width that
        # compiles there (1.14s/fwd vs 2.05s pure butterfly)
        curl_tpu.cfg.set("functions.scan_fixed_width", 16384)
    if "BENCH_CASCADE_MIN" in os.environ:
        curl_tpu.cfg.set(
            "functions.scan_cascade_min", int(os.environ["BENCH_CASCADE_MIN"])
        )
    if "BENCH_CASCADE_FACTOR" in os.environ:
        curl_tpu.cfg.set(
            "functions.scan_cascade_factor",
            int(os.environ["BENCH_CASCADE_FACTOR"]),
        )
    if "BENCH_HEAD_CHUNK" in os.environ:
        curl_tpu.cfg.set(
            "models.head_chunk_positions", int(os.environ["BENCH_HEAD_CHUNK"])
        )
    elif BATCH * seq > 64 or MODEL != "GPT2":
        # chunk the position-independent embedding/LM-head/vocab-softmax
        # stages so compiler + HBM footprint stays at 64 positions
        # regardless of batch and width (nn.module.scan_chunked)
        curl_tpu.cfg.set("models.head_chunk_positions", 64)
    curl_tpu.init(world_size=2, seed=11)

    model_cls = getattr(models, MODEL)
    if "BENCH_COMPRESS" in os.environ:
        compress = os.environ["BENCH_COMPRESS"] == "1"
    else:
        # Seed-compressed shares + streaming construction + vocab-chunked
        # head/embedding (models/gpt.py build_compressed). Mandatory for
        # GPT-Neo-scale weights (materialized shares are 21 GB > 16 GB HBM)
        # and measured FASTER for GPT-2 too (0.464s vs 0.519s: regenerating
        # party 1's share from the hardware PRNG beats reading it from HBM,
        # and the masked/chunked head removes weight-sized reveal traffic).
        compress = FULL and hasattr(getattr(models, MODEL, None), "GEOM")
    if compress and FULL and hasattr(model_cls, "GEOM"):
        model = models.GPT.build_compressed(
            **model_cls.GEOM, seq_len=seq,
            head_vocab_chunks=int(os.environ.get("BENCH_VOCAB_CHUNKS", "8")),
        )
    else:
        model = model_cls(seq_len=seq, full=FULL)
        model.encrypt(src=0, seed_compress=compress)
    apply_fn, params = model.functional()

    rng = np.random.default_rng(0)
    if FULL:
        x = rng.integers(0, 1000, size=(BATCH, seq)).astype(np.float64)
        xe = curl_tpu.cryptensor(x, precision=0)
    else:
        x = rng.normal(size=(BATCH, seq, model.embed_dim))
        xe = curl_tpu.cryptensor(x)

    cached_mode = os.environ.get("BENCH_CACHE", "0") == "1"
    offline_fill_sec = None
    if cached_mode:
        # offline/online split: tuple generation leaves the online program
        # (the reference's --with_cache mode). The reported latency is the
        # ONLINE phase only; the offline dealer time is measured separately
        # and recorded in detail.offline_fill_sec for honesty.
        online, fill = curl_tpu.compile_parties_cached(
            apply_fn, 2, 99, params, xe.mpc
        )
        from curl_tpu.utils.timing import device_sync

        cache = fill(jax.random.PRNGKey(97))
        device_sync(jax.tree_util.tree_leaves(cache)[0])  # compile + run
        t0 = time.time()
        cache = fill(jax.random.PRNGKey(98))
        device_sync(jax.tree_util.tree_leaves(cache)[0])
        offline_fill_sec = time.time() - t0
        step = lambda key, p, xm: online(key, cache, p, xm)  # noqa: E731
    else:
        step = curl_tpu.compile_parties(apply_fn, world_size=2)

    sync = _make_sync()

    t0 = time.time()
    out = step(jax.random.PRNGKey(100), params, xe.mpc)
    sync(out)
    compile_time = time.time() - t0

    times = []
    for i in range(REPS):
        t0 = time.time()
        out = step(jax.random.PRNGKey(101 + i), params, xe.mpc)
        sync(out)
        times.append(time.time() - t0)

    latency = min(times)
    tokens_per_sec = BATCH * seq / latency

    floor = _mxu_floor_sec(model, BATCH, seq, jax.default_backend())
    if floor and latency < 0.25 * floor and jax.default_backend() != "cpu":
        raise SystemExit(
            f"measured latency {latency:.4f}s is below 25% of the MXU "
            f"arithmetic-intensity floor {floor:.4f}s — timing is not "
            "waiting for device execution; refusing to report"
        )

    sanity_ratio = None
    # two resident models exceed HBM at GPT-Neo scale; sanity needs both
    too_big_for_two = (
        compress
        and hasattr(model_cls, "GEOM")
        and model_cls.GEOM["embed_dim"] >= 2048
        and jax.default_backend() != "cpu"
    )
    if SANITY and seq >= 16 and FULL and not too_big_for_two:
        # O(T^2) attention + O(T) everything else: halving seq must shrink
        # latency. A flat profile means timing is broken (round-1 artifact).
        # The half model MUST be built through the same path (compressed vs
        # materialized, cached vs direct) as the main model: the compressed
        # seq-64 forward is faster than a MATERIALIZED seq-32 one for
        # reasons unrelated to timing, which would invert the ratio.
        if compress and FULL and hasattr(model_cls, "GEOM"):
            half_model = models.GPT.build_compressed(
                **model_cls.GEOM, seq_len=seq // 2,
                head_vocab_chunks=int(os.environ.get("BENCH_VOCAB_CHUNKS", "8")),
            )
        else:
            half_model = model_cls(seq_len=seq // 2, full=FULL)
            half_model.encrypt(src=0, seed_compress=compress)
        h_apply, h_params = half_model.functional()
        hx = np.random.default_rng(0).integers(0, 1000, size=(BATCH, seq // 2))
        hxe = curl_tpu.cryptensor(hx.astype(np.float64), precision=0)
        if cached_mode:
            h_online, h_fill = curl_tpu.compile_parties_cached(
                h_apply, 2, 99, h_params, hxe.mpc
            )
            h_cache = h_fill(jax.random.PRNGKey(97))
            h_step = lambda key, p, xm: h_online(key, h_cache, p, xm)  # noqa: E731
        else:
            h_step = curl_tpu.compile_parties(h_apply, world_size=2)
        h_out = h_step(jax.random.PRNGKey(100), h_params, hxe.mpc)
        sync(h_out)  # compile
        h_times = []
        for i in range(REPS):
            t0 = time.time()
            h_out = h_step(jax.random.PRNGKey(101 + i), h_params, hxe.mpc)
            sync(h_out)
            h_times.append(time.time() - t0)
        sanity_ratio = latency / min(h_times)
        if sanity_ratio < 1.0:
            raise SystemExit(
                f"seq-scaling sanity failed: latency(seq={seq}) = "
                f"{latency:.4f}s <= latency(seq={seq//2}) = "
                f"{min(h_times):.4f}s — timing is suspect; refusing to report"
            )

    baseline_tps = None
    baseline_file = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks",
        "baseline_measured.json",
    )
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            stored = json.load(f)
        # prefer a baseline measured at the same sequence length
        baseline_tps = stored.get(
            f"{MODEL.lower()}_seq{seq}_2pc_tokens_per_sec_cpu"
        ) or stored.get(f"{MODEL.lower()}_2pc_tokens_per_sec_cpu")

    vs_baseline = (tokens_per_sec / baseline_tps) if baseline_tps else None

    record = (
            {
                "metric": f"{MODEL.lower()}_2pc_private_inference_throughput",
                "value": round(tokens_per_sec, 4),
                "unit": "tokens/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "detail": {
                    "batch": BATCH,
                    "seq_len": seq,
                    "latency_sec": round(latency, 4),
                    "compile_sec": round(compile_time, 1),
                    "full_model": FULL,
                    "tuple_cache": os.environ.get("BENCH_CACHE", "0") == "1",
                    "backend": jax.default_backend(),
                    "baseline_tokens_per_sec": baseline_tps,
                    "offline_fill_sec": (
                        round(offline_fill_sec, 4) if offline_fill_sec else None
                    ),
                    "timing": "on-device reduce + host scalar fetch "
                              "(block_until_ready is unreliable on axon)",
                    "mxu_floor_sec": round(floor, 4) if floor else None,
                    "seq_scaling_ratio_vs_half": (
                        round(sanity_ratio, 2) if sanity_ratio else None
                    ),
                },
            }
    )
    try:
        import datetime

        hist = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks", "results",
            "history.jsonl",
        )
        os.makedirs(os.path.dirname(hist), exist_ok=True)
        with open(hist, "a") as f:
            f.write(json.dumps({"ts": datetime.datetime.now().isoformat(), **record}) + "\n")
    except OSError:
        pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
