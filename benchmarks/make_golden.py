#!/usr/bin/env python3
"""Generate golden reference outputs for cross-framework parity tests.

Runs the actual reference framework (via the dependency shims) on fixed
inputs through the LUT nonlinearities under configs/default.yaml, and
stores decoded outputs in tests/golden/reference_outputs.npz. The parity
test (tests/test_reference_parity.py) asserts curl_tpu matches within the
approximation-method tolerance.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

import numpy as np

import reference_baseline  # noqa: E402  (sets up shims/paths)

FUNCS = {
    "gelu": (-3.5, 3.5),
    "silu": (-14, 14),
    "erf": (-3.5, 3.5),
    "sigmoid": (-14, 14),
    "tanh": (-7, 7),
    "relu": (-4, 4),
    "sqrt": (0.5, 200),
    "inv_sqrt": (0.5, 200),
    "reciprocal": (1.0, 60),
    "log": (1.0, 60),
    "exp": (-3, 2),
    "softmax": (-4, 4),
}
N = 64


def _run(args):
    import curl
    import torch

    outs = {}
    for name, (lo, hi) in FUNCS.items():
        xs = torch.tensor(np.linspace(lo, hi, N))
        enc = curl.cryptensor(xs)
        if name == "softmax":
            out = enc.reshape(4, 16).softmax(-1).get_plain_text().reshape(-1)
        elif name == "inv_sqrt":
            out = enc.inv_sqrt().get_plain_text()
        else:
            out = getattr(enc, name)().get_plain_text()
        outs[name] = out.numpy()
    rank = curl.communicator.get().get_rank()
    if rank == 0:
        os.makedirs(os.path.join(REPO, "tests", "golden"), exist_ok=True)
        np.savez(
            os.path.join(REPO, "tests", "golden", "reference_outputs.npz"),
            **outs,
            _inputs=np.array([list(FUNCS[k]) for k in FUNCS]),
            _names=np.array(list(FUNCS.keys())),
            _n=np.array([N]),
        )


def main():
    from multiprocess_launcher import MultiProcessLauncher

    import argparse

    args = argparse.Namespace()
    cfg_file = os.path.join(reference_baseline.REF, "configs", "default.yaml")
    launcher = MultiProcessLauncher(2, _run, args, cfg_file=cfg_file)
    launcher.start()
    launcher.join()
    launcher.terminate()
    print("golden outputs written")


if __name__ == "__main__":
    main()
