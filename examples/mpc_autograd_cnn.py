#!/usr/bin/env python3
"""End-to-end encrypted CNN training through autograd (parity scope:
reference examples/mpc_autograd_cnn). A small conv net is trained on
synthetic image data entirely under encryption — forward, loss, backward
and SGD all run as MPC protocols."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def run(epochs=2, batch=8, lr=0.05):
    import curl_tpu
    from curl_tpu import nn, optim

    curl_tpu.init(world_size=2, seed=77)
    rng = np.random.default_rng(0)

    model = nn.Sequential(
        nn.Conv2d(1, 4, 3, padding=1),
        nn.ReLU(),
        nn.AvgPool2d(2),
        nn.Flatten(),
        nn.Linear(4 * 4 * 4, 2),
    )
    model.encrypt(src=0)
    params = [p for _, p in model.named_parameters()]
    for p in params:
        p.requires_grad = True
    opt = optim.SGD(params, lr=lr)
    criterion = nn.CrossEntropyLoss()

    # synthetic task: detect bright left vs right half
    X = rng.normal(size=(batch * epochs, 1, 8, 8)) * 0.2
    labels = rng.integers(0, 2, batch * epochs)
    for i, lab in enumerate(labels):
        X[i, 0, :, : 4 if lab == 0 else None] += 0.8
    Y = np.eye(2)[labels]

    t0 = time.time()
    losses = []
    for epoch in range(epochs):
        sl = slice(epoch * batch, (epoch + 1) * batch)
        opt.zero_grad()
        out = model(curl_tpu.cryptensor(X[sl]))
        loss = criterion(out, Y[sl])
        losses.append(float(loss.get_plain_text()))
        loss.backward()
        opt.step()
        print(f"epoch {epoch}: loss {losses[-1]:.4f}")
    print(f"encrypted CNN training: {time.time() - t0:.1f}s")
    return losses


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch", type=int, default=8)
    args = parser.parse_args()
    run(args.epochs, args.batch)
