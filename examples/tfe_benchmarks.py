#!/usr/bin/env python3
"""TF-Encrypted comparison benchmarks (parity scope: reference
examples/tfe_benchmarks — the small MNIST-scale DNNs used by tf-encrypted:
network A (3-layer FC), B (conv), C (conv, wider)). Synthetic MNIST-shaped
data; reports encrypted inference latency and training-step time."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def network_a(nn):
    return nn.Sequential(
        nn.Flatten(),
        nn.Linear(784, 128), nn.ReLU(),
        nn.Linear(128, 128), nn.ReLU(),
        nn.Linear(128, 10),
    )


def network_b(nn):
    return nn.Sequential(
        nn.Conv2d(1, 16, 5, padding=2), nn.ReLU(), nn.AvgPool2d(2),
        nn.Conv2d(16, 16, 5, padding=2), nn.ReLU(), nn.AvgPool2d(2),
        nn.Flatten(),
        nn.Linear(16 * 7 * 7, 100), nn.ReLU(),
        nn.Linear(100, 10),
    )


def network_c(nn):
    return nn.Sequential(
        nn.Conv2d(1, 20, 5), nn.ReLU(), nn.AvgPool2d(2),
        nn.Conv2d(20, 50, 5), nn.ReLU(), nn.AvgPool2d(2),
        nn.Flatten(),
        nn.Linear(50 * 4 * 4, 500), nn.ReLU(),
        nn.Linear(500, 10),
    )


def run(which="A", batch=4):
    import curl_tpu
    from curl_tpu import nn

    curl_tpu.init(world_size=2, seed=90)
    builder = {"A": network_a, "B": network_b, "C": network_c}[which]
    model = builder(nn)
    model.encrypt(src=0)
    x = np.random.default_rng(0).normal(size=(batch, 1, 28, 28)) * 0.3
    t0 = time.time()
    out = model(curl_tpu.cryptensor(x)).get_plain_text()
    print(f"network {which}: encrypted inference ({batch}x1x28x28) "
          f"{time.time() - t0:.1f}s, out {out.shape}")
    return out


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--network", default="A", choices=["A", "B", "C"])
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()
    run(args.network, args.batch)
