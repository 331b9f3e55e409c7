#!/usr/bin/env python3
"""Measure the reference Curl framework's 2-party GPT-2 forward on this
machine's CPU — the honest baseline for bench.py's vs_baseline.

Runs the reference unmodified from /root/reference with two dependency
shims (omegaconf, pywt) on the path. Uses the reference's own
MultiProcessLauncher + curl.init + GPT2.encrypt + forward, mirroring
examples/llms/llm.py timing. Writes benchmarks/baseline_measured.json.

Usage: python benchmarks/reference_baseline.py [--seq 64] [--model GPT2]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("CURL_REFERENCE", "/root/reference")
SHIMS = os.path.join(REPO, "benchmarks", "shims")


def _setup_path():
    for p in (SHIMS, REF, os.path.join(REF, "examples")):
        if p not in sys.path:
            sys.path.insert(0, p)
    os.environ["PYTHONPATH"] = os.pathsep.join(
        [SHIMS, REF, os.path.join(REF, "examples")]
        + [os.environ.get("PYTHONPATH", "")]
    )
    _shim_torch_onnx_registry()


def _shim_torch_onnx_registry():
    """torch 2.13 removed torch.onnx._internal.registration, which the
    reference imports at module load (never used on the model-bench path)."""
    import types

    name = "torch.onnx._internal.registration"
    if name not in sys.modules:
        try:
            import torch.onnx._internal.registration  # noqa: F401
        except Exception:
            mod = types.ModuleType(name)
            mod.registry = types.SimpleNamespace()
            sys.modules[name] = mod


def _run_experiment(args):
    import curl
    import torch

    sys.path.insert(0, os.path.join(REF, "examples", "llms"))
    from gpt import GPT2, GPTNeo  # noqa: F401
    from bert import BertTiny, BertBase  # noqa: F401

    model_cls = {"GPT2": GPT2, "GPTNeo": GPTNeo, "BertTiny": BertTiny,
                 "BertBase": BertBase}[args.model]
    with torch.no_grad():
        model = model_cls(args.seq, full=True)
        model.encrypt(src=0)
        x = torch.randint(0, 1000, (args.batch, args.seq)).float()
        x_enc = curl.cryptensor(x, precision=0)

        times = []
        for _ in range(args.reps):
            t0 = time.time()
            out = model(x_enc)
            times.append(time.time() - t0)
        del out
    rank = curl.communicator.get().get_rank()
    if rank == 0:
        result = {
            "model": args.model,
            "batch": args.batch,
            "seq": args.seq,
            "latency_sec": min(times),
            "tokens_per_sec": args.batch * args.seq / min(times),
        }
        with open(os.path.join(REPO, "benchmarks", "_baseline_tmp.json"), "w") as f:
            json.dump(result, f)


_setup_path()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seq", type=int, default=64)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--reps", type=int, default=1)
    parser.add_argument("--model", default="GPT2")
    args = parser.parse_args()

    from multiprocess_launcher import MultiProcessLauncher

    cfg_file = os.path.join(REF, "configs", "default.yaml")
    launcher = MultiProcessLauncher(2, _run_experiment, args, cfg_file=cfg_file)
    launcher.start()
    launcher.join()
    launcher.terminate()

    tmp = os.path.join(REPO, "benchmarks", "_baseline_tmp.json")
    with open(tmp) as f:
        result = json.load(f)
    os.remove(tmp)

    out_path = os.path.join(REPO, "benchmarks", "baseline_measured.json")
    stored = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            stored = json.load(f)
    key = f"{result['model'].lower()}_2pc_tokens_per_sec_cpu"
    stored[key] = result["tokens_per_sec"]
    stored[f"{result['model'].lower()}_seq{result['seq']}_2pc_tokens_per_sec_cpu"] = (
        result["tokens_per_sec"]
    )
    stored[f"{result['model'].lower()}_detail"] = result
    with open(out_path, "w") as f:
        json.dump(stored, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
