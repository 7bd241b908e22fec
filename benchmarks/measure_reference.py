"""Measure the PyTorch reference's training throughput on this host.

The reference publishes no numbers (SURVEY §6), so the comparison baseline
must be produced by executing it. Runs the reference VisionTransformer
(MNIST ctor shape, ``model.py:49``, with the train.py schedule: Adam, CE,
batch 128) on synthetic MNIST-shaped data and reports steady-state train
images/sec. Writes benchmarks/reference_baseline.json.

Usage: python benchmarks/measure_reference.py [--steps 20] [--model-type X]
"""

import argparse
import json
import os
import sys
import time

import torch

sys.path.insert(0, os.environ.get("KANVIT_REFERENCE", "/root/reference"))

from model import VisionTransformer  # noqa: E402


def measure(model_type: str, batch_size: int, steps: int, warmup: int = 3):
    torch.manual_seed(0)
    model = VisionTransformer(
        (1, 28, 28), n_patches=7, n_blocks=4, d_hidden=64, n_heads=2,
        out_d=10, type=model_type,
    )
    criterion = torch.nn.CrossEntropyLoss()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.randn(batch_size, 1, 28, 28)
    y = torch.randint(0, 10, (batch_size,))

    model.train()
    for _ in range(warmup):
        loss = criterion(model(x), y)
        opt.zero_grad(); loss.backward(); opt.step()
    t0 = time.perf_counter()
    for _ in range(steps):
        loss = criterion(model(x), y)
        opt.zero_grad(); loss.backward(); opt.step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument(
        "--model-types", nargs="+",
        default=["vanilla", "efficientkan", "fast", "sine", "flash-attn"],
    )
    args = p.parse_args()

    results = {}
    for mt in args.model_types:
        ips = measure(mt, args.batch_size, args.steps)
        results[mt] = round(ips, 2)
        print(f"{mt}: {ips:.1f} images/sec")

    out = {
        "description": "PyTorch reference train throughput, synthetic MNIST "
        "shape, batch 128, MNIST ctor config (model.py:49), this host",
        "device": "cpu",
        "torch_version": torch.__version__,
        "batch_size": args.batch_size,
        "images_per_sec": results,
    }
    path = os.path.join(os.path.dirname(__file__), "reference_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
