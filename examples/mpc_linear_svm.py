#!/usr/bin/env python3
"""Private linear SVM training (parity scope: reference
examples/mpc_linear_svm). Hinge-loss SVM with manually-derived gradients,
trained entirely under encryption; reports accuracy vs the plaintext labels.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def run(epochs=10, examples=200, features=20, lr=0.5, skip_plaintext=False):
    import curl_tpu

    curl_tpu.init(world_size=2, seed=99)
    rng = np.random.default_rng(0)

    # random ground-truth hyperplane and labels (reference train script)
    w_true = rng.normal(size=(features,))
    b_true = rng.normal()
    X = rng.normal(size=(examples, features))
    y = np.sign(X @ w_true + b_true)

    xe = curl_tpu.cryptensor(X)
    ye = curl_tpu.cryptensor(y)

    w = curl_tpu.cryptensor(rng.normal(size=(features,)))
    b = curl_tpu.cryptensor(np.zeros(()))

    t0 = time.time()
    for epoch in range(epochs):
        # forward: margin = y * (Xw + b)
        yhat = xe.matmul(w).add(b)
        margin = ye.mul(yhat)
        # hinge indicator: margin < 1
        viol = margin.lt(1.0)
        # grads: dw = -mean(viol * y * x), db = -mean(viol * y)
        vy = viol.mul(ye)
        gw = xe.transpose(0, 1).matmul(vy).div(examples).neg()
        gb = vy.mean().neg()
        w = w.sub(gw.mul(lr))
        b = b.sub(gb.mul(lr))

        pred = np.sign(xe.matmul(w).add(b).get_plain_text())
        acc = (pred == y).mean()
        print(f"epoch {epoch}: accuracy {acc:.3f}")
    elapsed = time.time() - t0

    print(f"encrypted SVM training: {elapsed:.1f}s for {epochs} epochs")
    return acc


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--examples", type=int, default=200)
    parser.add_argument("--features", type=int, default=20)
    parser.add_argument("--lr", type=float, default=0.5)
    args = parser.parse_args()
    run(args.epochs, args.examples, args.features, args.lr)
