#!/usr/bin/env python3
"""Private LLM inference bench harness + CLI launcher.

Parity scope: reference examples/llms/{launcher.py,llm.py} — run 2-party
private inference of GPT-2/GPT-Neo/BERT models (or a tensor-size block-only
microbench), with/without the offline tuple cache, reporting latency and
communication stats.

Usage:
  python examples/llms.py --model GPT2 --seq_len 32
  python examples/llms.py --model BertTiny --seq_len 64 --communication
  python examples/llms.py --tensor_size 1,16,768 --model GPT2   # blocks only
  python examples/llms.py --model GPT2 --approximations          # no LUTs
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging
import time

import numpy as np


def get_config(args):
    import curl_tpu

    base = os.path.join(os.path.dirname(curl_tpu.__file__), "configs")
    if args.approximations:
        logging.info("Using approximations (iterative) config")
        return os.path.join(base, "approximations.yaml")
    if args.no_cmp:
        logging.info("Using LUT-only (no comparisons) config")
        return os.path.join(base, "llm_config.yaml")
    logging.info("Using default LUT config")
    return os.path.join(base, "default.yaml")


def run_llm(args):
    import jax
    import curl_tpu
    from curl_tpu import models

    curl_tpu.cfg.load_config(get_config(args))
    curl_tpu.init(world_size=args.world_size, seed=17)

    full = args.tensor_size is None
    model_cls = getattr(models, args.model)
    seq_len = args.seq_len
    if args.compress and full and hasattr(model_cls, "GEOM"):
        # seed-compressed shares + streaming construction + vocab-chunked
        # head/embedding: the GPT-Neo-on-one-chip memory path
        model = models.GPT.build_compressed(**model_cls.GEOM, seq_len=seq_len)
    else:
        model = model_cls(seq_len=seq_len, full=full)
        model.encrypt(src=0, seed_compress=args.compress)
    apply_fn, params = model.functional()

    rng = np.random.default_rng(0)
    if full:
        x = rng.integers(0, 1000, size=(args.batch, seq_len)).astype(np.float64)
        xe = curl_tpu.cryptensor(x, precision=0)
    else:
        shape = tuple(int(v) for v in args.tensor_size.split(","))
        x = rng.normal(size=shape)
        xe = curl_tpu.cryptensor(x)

    if args.communication:
        curl_tpu.reset_communication_stats()

    from curl_tpu.utils.timing import device_sync

    step = curl_tpu.compile_parties(apply_fn, world_size=args.world_size)
    t0 = time.time()
    out = step(jax.random.PRNGKey(0), params, xe.mpc)
    device_sync(out)  # block_until_ready returns early on the axon platform
    compile_time = time.time() - t0

    times = []
    for i in range(args.reps):
        t0 = time.time()
        out = step(jax.random.PRNGKey(i + 1), params, xe.mpc)
        device_sync(out)
        times.append(time.time() - t0)

    latency = min(times)
    tokens = args.batch * seq_len
    print(
        f"{args.model} world_size={args.world_size} seq={seq_len} "
        f"full={full}: compile {compile_time:.1f}s, latency {latency:.3f}s, "
        f"{tokens / latency:.2f} tokens/sec"
    )
    if args.communication:
        curl_tpu.print_communication_stats()
        stats = curl_tpu.comm.comm_stats
        print(f"rounds/step (trace): {stats.rounds}, bytes: {stats.bytes}")
    return tokens / latency


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="GPT2",
                        choices=["GPT2", "GPTNeo", "GPTNeoLarge",
                                 "BertTiny", "BertBase", "BertLarge"])
    parser.add_argument("--world_size", type=int, default=2)
    parser.add_argument("--seq_len", type=int, default=32)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--tensor_size", default=None,
                        help="run block-only microbench on this input shape")
    parser.add_argument("--approximations", action="store_true")
    parser.add_argument("--no_cmp", action="store_true")
    parser.add_argument("--communication", action="store_true")
    parser.add_argument("--compress", action="store_true",
                        help="seed-compressed parameter shares (halves "
                             "at-rest share memory; GPT classes also get "
                             "streaming construction + vocab-chunked "
                             "head/embedding)")
    args = parser.parse_args()
    logging.getLogger().setLevel(logging.INFO)
    run_llm(args)


if __name__ == "__main__":
    main()
