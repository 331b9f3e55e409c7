#!/usr/bin/env python3
"""Function + model benchmark suite with CSV output.

Parity scope: reference benchmarks/benchmark.py:82-563 (FuncBenchmarks /
ModelBenchmarks) — runtimes and errors for the nonlinearities, layer
runtimes (conv1d/conv2d/pool/linear, reference benchmark.py:166-187),
inference AND per-epoch training time (reference benchmark.py:360-427) for
small models (logistic regression, FFNN, LeNet), plus `--advanced-models`
resnet inference (reference ModelBenchmarks advanced set), in plaintext vs
encrypted, written as CSVs.

CSV format note: columns are wide-format (one row per function/layer/model
with plaintext and encrypted columns side by side). The reference's
dashboard instead folds layer runtimes into the function dataframe and
stores model times long-format ('seconds per epoch' / 'is plain text');
benchmarks/dashboard.py in this repo consumes the wide format directly.

Usage: python benchmarks/benchmark.py [--path out_dir] [--world-size 2]
       [--only func|layer|model|all] [--advanced-models]
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


class LayerBenchmarks:
    """Per-layer runtimes (reference benchmark.py:166-187 get_layer_runtimes).

    Times one forward of each nn layer on fixed random inputs, plaintext
    (numpy/plain module path) vs encrypted.
    """

    def __init__(self, world_size=2):
        self.world_size = world_size
        self.data = []

    def _cases(self, nn):
        rng = np.random.default_rng(3)
        return [
            ("linear(64->64)", nn.Linear(64, 64), rng.normal(size=(16, 64))),
            ("conv1d(8ch,k5)", nn.Conv1d(8, 8, 5, padding=2),
             rng.normal(size=(4, 8, 32))),
            ("conv2d(8ch,k3)", nn.Conv2d(8, 8, 3, padding=1),
             rng.normal(size=(2, 8, 16, 16))),
            ("maxpool2d(2)", nn.MaxPool2d(2), rng.normal(size=(2, 4, 16, 16))),
            ("avgpool2d(2)", nn.AvgPool2d(2), rng.normal(size=(2, 4, 16, 16))),
            ("batchnorm2d(8)", nn.BatchNorm2d(8), rng.normal(size=(2, 8, 8, 8))),
        ]

    def run(self):
        import curl_tpu
        from curl_tpu import nn

        from curl_tpu.nn.plain import PlainTensor

        for name, layer, x in self._cases(nn):
            layer.eval()
            t0 = time.time()
            _ = layer(PlainTensor(x))  # unencrypted module path
            plain_t = time.time() - t0
            layer.encrypt(src=0)
            xe = curl_tpu.cryptensor(x)
            # lazy batching: the whole layer forward compiles as ONE program
            # instead of one dispatch per protocol op
            t0 = time.time()
            with curl_tpu.lazy():
                _ = layer(xe).get_plain_text()
            enc_t = time.time() - t0
            self.data.append(
                {"layer": name, "runtime": plain_t, "runtime crypten": enc_t}
            )
            print(f"# layer {name}: enc {enc_t*1000:.1f}ms", flush=True)
        return self.data

    def save(self, path):
        _write_csv(
            os.path.join(path, "layer_benchmarks.csv"),
            self.data,
            ["layer", "runtime", "runtime crypten"],
        )


class ModelBenchmarks:
    """Small-model inference/training benchmarks (reference benchmark.py:397)."""

    def __init__(self, world_size=2):
        self.world_size = world_size
        self.data = []
        self.train_data = []

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
        with curl_tpu.lazy():
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
        with curl_tpu.lazy():
            pred = ffnn(curl_tpu.cryptensor(X)).get_plain_text()
        enc_t = time.time() - t0
        acc = ((pred.squeeze() > 0.5) == y).mean()
        self.data.append(
            {"model": "feedforward neural network", "seconds": plain_t,
             "seconds crypten": enc_t, "inference accuracy": float(acc)}
        )
        return self.data

    @staticmethod
    def _plain_epochs(model, X, y, epochs, lr=0.1):
        """One numpy BCE-SGD epoch through the ACTUAL built model's math
        (reference benchmark.py:414-427 times the real plain model per
        entry, not a shared surrogate). Supports the two benchmark
        geometries: [Linear, Sigmoid] and [Linear, ReLU, Linear, Sigmoid]."""
        layers = [model[i] for i in range(len(list(model._modules)))]
        linears = [
            [np.array(m._parameters["weight"]), np.array(m._parameters["bias"])]
            for m in layers
            if type(m).__name__ == "Linear"
        ]
        has_relu = any(type(m).__name__ == "ReLU" for m in layers)
        n = len(X)
        yc = y[:, None]
        for _ in range(epochs):
            # forward
            acts = [X]
            z1 = acts[-1] @ linears[0][0].T + linears[0][1]
            if has_relu:
                h = np.maximum(z1, 0)
                z2 = h @ linears[1][0].T + linears[1][1]
                p = 1 / (1 + np.exp(-z2))
                # backward (BCE + sigmoid -> dz = p - y)
                dz2 = (p - yc) / n
                gW2 = dz2.T @ h
                gb2 = dz2.sum(0)
                dh = dz2 @ linears[1][0]
                dz1 = dh * (z1 > 0)
                gW1 = dz1.T @ X
                gb1 = dz1.sum(0)
                linears[1][0] -= lr * gW2
                linears[1][1] -= lr * gb2
                linears[0][0] -= lr * gW1
                linears[0][1] -= lr * gb1
            else:
                p = 1 / (1 + np.exp(-z1))
                dz1 = (p - yc) / n
                linears[0][0] -= lr * (dz1.T @ X)
                linears[0][1] -= lr * dz1.sum(0)
        return linears

    def time_training(self, epochs=2):
        """Per-epoch training time, plaintext vs encrypted (reference
        benchmark.py:414-427 time_training): forward + BCE loss + backward +
        SGD step on the Gaussian-cluster logreg task and the FFNN. The
        plaintext column times the same model's own numpy forward/backward;
        the encrypted epoch is warmed up once untimed (compile + trace cost
        excluded, as the reference's time_me averaging does) and runs under
        curl_tpu.lazy() so the epoch compiles as one program."""
        import curl_tpu
        from curl_tpu import nn, optim

        X, y = self._logreg_data()
        builders = {
            "logistic regression": lambda: nn.Sequential(
                nn.Linear(20, 1), nn.Sigmoid()
            ),
            "feedforward neural network": lambda: nn.Sequential(
                nn.Linear(20, 32), nn.ReLU(), nn.Linear(32, 1), nn.Sigmoid()
            ),
        }
        for name, build in builders.items():
            model = build()
            # plaintext epoch: this model's own numpy forward/backward
            self._plain_epochs(model, X, y, 1)  # warmup (BLAS init etc.)
            t0 = time.time()
            self._plain_epochs(model, X, y, epochs)
            plain_t = (time.time() - t0) / epochs

            model.encrypt(src=0)
            params = [p for _, p in model.named_parameters()]
            for p in params:
                p.requires_grad = True
            opt = optim.SGD(params, lr=0.1)
            criterion = nn.BCELoss()
            xe, ye = curl_tpu.cryptensor(X), curl_tpu.cryptensor(y[:, None])

            def epoch():
                with curl_tpu.lazy():
                    opt.zero_grad()
                    loss = criterion(model(xe), ye)
                    loss.backward()
                    opt.step()
                    return float(loss.get_plain_text())  # force completion

            epoch()  # untimed warmup: trace + JIT compile
            t0 = time.time()
            for _ in range(epochs):
                epoch()
            enc_t = (time.time() - t0) / epochs
            self.train_data.append(
                {"model": name, "seconds": plain_t, "seconds crypten": enc_t}
            )
        return self.train_data

    def run_advanced(self):
        """Advanced-model inference (reference ModelBenchmarks advanced set:
        resnet18/34): one encrypted CIFAR-shaped forward."""
        import curl_tpu
        from curl_tpu.models import resnet

        rng = np.random.default_rng(5)
        x = rng.normal(size=(1, 3, 32, 32))
        for name in ("resnet18", "resnet34"):
            model = getattr(resnet, name)(num_classes=10)
            model.eval()
            from curl_tpu.nn.plain import PlainTensor

            t0 = time.time()
            _ = model(PlainTensor(x))
            plain_t = time.time() - t0
            model.encrypt(src=0)
            xe = curl_tpu.cryptensor(x)
            t0 = time.time()
            with curl_tpu.lazy():
                _ = model(xe).get_plain_text()
            enc_t = time.time() - t0
            print(f"# advanced {name}: enc {enc_t:.2f}s", flush=True)
            self.data.append(
                {"model": name, "seconds": plain_t,
                 "seconds crypten": enc_t, "inference accuracy": float("nan")}
            )
        return self.data

    def save(self, path):
        _write_csv(
            os.path.join(path, "model_benchmarks.csv"),
            self.data,
            ["model", "seconds", "seconds crypten", "inference accuracy"],
        )
        if self.train_data:
            _write_csv(
                os.path.join(path, "model_training_benchmarks.csv"),
                self.train_data,
                ["model", "seconds", "seconds crypten"],
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
    parser.add_argument(
        "--only", choices=["func", "layer", "model", "all"], default="all"
    )
    parser.add_argument(
        "--advanced-models", action="store_true",
        help="include resnet inference (reference benchmark.py:18)",
    )
    parser.add_argument(
        "--skip-training", action="store_true",
        help="skip the per-epoch training benchmarks",
    )
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
    if args.only in ("layer", "all"):
        lb = LayerBenchmarks(args.world_size)
        lb.run()
        lb.save(args.path)
        for row in lb.data:
            print(f"{row['layer']:<18} enc {row['runtime crypten']*1000:9.1f}ms")
    if args.only in ("model", "all"):
        mb = ModelBenchmarks(args.world_size)
        mb.run()
        if not args.skip_training:
            mb.time_training()
        if args.advanced_models:
            mb.run_advanced()
        mb.save(args.path)
        for row in mb.data:
            acc = row["inference accuracy"]
            acc_s = "-" if acc != acc else f"{acc:.3f}"  # NaN for advanced models
            print(f"{row['model']:<28} enc {row['seconds crypten']:.3f}s "
                  f"acc {acc_s}")
        for row in mb.train_data:
            print(f"{row['model']:<28} train/epoch enc "
                  f"{row['seconds crypten']:.3f}s")
    print(f"CSVs written to {args.path}")


if __name__ == "__main__":
    main()
