#!/usr/bin/env python3
"""North-star workload measurements on the available accelerator.

BASELINE.md's config list beyond GPT-2/GPT-Neo (covered by bench.py):
  * 2-party wavelet-LUT nonlinearity microbench (1x10 tensor)
  * 2-party mpc_linear_svm training (one epoch, compiled)
  * 2-party mpc_cifar LeNet inference
  * 2-party BERT-tiny inference

Each workload is compiled as ONE fused XLA program (compile_parties) and
timed with honest device synchronization (on-device reduce + host scalar
fetch — block_until_ready returns early on the axon platform). Results are
appended as JSON to benchmarks/results/workloads_tpu.json.

Usage: python scripts/tpu_workloads.py [name ...]
Env: REPS (default 3)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("REPS", "3"))


def _time(tag, step, *args, results):
    import jax

    from curl_tpu.utils.timing import device_sync

    t0 = time.time()
    out = step(jax.random.PRNGKey(7), *args)
    device_sync(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.time() - t0
    times = []
    for i in range(REPS):
        t0 = time.time()
        out = step(jax.random.PRNGKey(8 + i), *args)
        device_sync(jax.tree_util.tree_leaves(out)[0])
        times.append(time.time() - t0)
    rec = {
        "workload": tag,
        "latency_sec": round(min(times), 4),
        "compile_sec": round(compile_s, 1),
        "all": [round(t, 4) for t in times],
    }
    print(json.dumps(rec), flush=True)
    results.append(rec)


def main():
    only = set(sys.argv[1:])

    import jax

    import curl_tpu
    from curl_tpu import models, nn

    base = os.path.join(os.path.dirname(curl_tpu.__file__), "configs")
    curl_tpu.cfg.load_config(os.path.join(base, "default.yaml"))
    curl_tpu.cfg.set("functions.max_method", "scan_reduction")
    if jax.default_backend() not in ("cpu",):
        curl_tpu.cfg.set("mpc.bulk_rng", "pallas_tpu")
        curl_tpu.cfg.set("mpc.fused_max_step", "pallas_tpu")
    curl_tpu.init(world_size=2, seed=13)
    rng = np.random.default_rng(0)
    results = []

    def want(name):
        return not only or name in only

    # --- wavelet-LUT nonlinearity microbench (1x10) -------------------------
    if want("lut_micro"):
        x = curl_tpu.cryptensor(rng.normal(size=(1, 10)))
        step = curl_tpu.compile_parties(lambda t: t.sigmoid(), world_size=2)
        _time("lut_micro_sigmoid_1x10", step, x.mpc, results=results)

    # --- linear SVM: one compiled training epoch -----------------------------
    if want("linear_svm"):
        feats, examples = 20, 200
        w_true = rng.normal(size=(feats,))
        X = rng.normal(size=(examples, feats))
        y = np.sign(X @ w_true + rng.normal())
        xe = curl_tpu.cryptensor(X)
        ye = curl_tpu.cryptensor(y)
        w0 = curl_tpu.cryptensor(rng.normal(size=(feats,)))
        b0 = curl_tpu.cryptensor(np.zeros(()))

        def epoch(xm, ym, wm, bm):
            margin = ym.mul(xm.matmul(wm).add(bm))
            viol = margin.lt(1.0)
            vy = viol.mul(ym)
            gw = xm.transpose(0, 1).matmul(vy).div(examples).neg()
            gb = vy.mean().neg()
            return wm.sub(gw.mul(0.5)), bm.sub(gb.mul(0.5))

        step = curl_tpu.compile_parties(epoch, world_size=2)
        _time("linear_svm_epoch_200x20", step, xe.mpc, ye.mpc, w0.mpc, b0.mpc,
              results=results)

    # --- LeNet CIFAR inference (batch 2) -------------------------------------
    if want("lenet"):
        from examples.mpc_cifar import build_lenet

        model = build_lenet()
        model.encrypt(src=0)
        apply_fn, params = model.functional()
        x = curl_tpu.cryptensor(rng.normal(size=(2, 3, 32, 32)))
        step = curl_tpu.compile_parties(apply_fn, world_size=2)
        _time("lenet_cifar_inference_b2", step, params, x.mpc, results=results)

    # --- BertTiny inference (seq 32) -----------------------------------------
    if want("bert_tiny"):
        model = models.BertTiny(seq_len=32, full=True)
        model.encrypt(src=0)
        apply_fn, params = model.functional()
        tokens = rng.integers(0, 1000, size=(1, 32)).astype(np.float64)
        xe = curl_tpu.cryptensor(tokens, precision=0)
        step = curl_tpu.compile_parties(apply_fn, world_size=2)
        _time("bert_tiny_inference_seq32", step, params, xe.mpc, results=results)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "results", "workloads_tpu.json",
    )
    existing = []
    if os.path.exists(out_path):
        try:
            existing = json.load(open(out_path))
        except (json.JSONDecodeError, OSError):
            existing = []
    import datetime

    for r in results:
        r["ts"] = datetime.datetime.now().isoformat()
        r["backend"] = jax.default_backend()
    json.dump(existing + results, open(out_path, "w"), indent=1)
    print(f"wrote {len(results)} records to {out_path}")


if __name__ == "__main__":
    main()
