"""Dataset loading: MNIST (idx), CIFAR-100 (python pickle), synthetic.

The reference trains on torchvision CIFAR-100 with download=True
(reference ``train.py:113-114``) while its README describes MNIST
(SURVEY §2.9.3) — kanvit supports both, reading the standard on-disk formats
directly (no torchvision dependency, no network):

- MNIST: ``train-images-idx3-ubyte`` / ``t10k-images-idx3-ubyte`` (+labels),
  optionally ``.gz``, under ``<root>/MNIST/raw`` or ``<root>``.
- CIFAR-100: ``cifar-100-python/{train,test}`` pickle files under ``<root>``.

When no files are found, ``synthetic`` provides a deterministic stand-in with
the same shapes (CI, benchmarks, smoke tests) — loaders log loudly which
source was used. Data is returned as float32 ``(N, C, H, W)`` in [0, 1]
channel range (the ``ToTensor`` convention); normalization/augmentation live
in ``kanvit.data.pipeline``.
"""

from __future__ import annotations

import gzip
import logging
import os
import pickle
import struct
from typing import Tuple

import numpy as np

DATASETS = ("mnist", "cifar100", "digits", "synthetic")

_DEFAULT_ROOTS = (".", "./data", "./cifar100", "./mnist", "/root/data")


def _open_maybe_gz(path: str):
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    return open(path, "rb")


def _read_idx_images(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
        if magic != 2051:
            raise ValueError(f"bad MNIST image magic {magic} in {path}")
        data = np.frombuffer(f.read(n * rows * cols), dtype=np.uint8)
    return data.reshape(n, 1, rows, cols)


def _read_idx_labels(path: str) -> np.ndarray:
    with _open_maybe_gz(path) as f:
        magic, n = struct.unpack(">II", f.read(8))
        if magic != 2049:
            raise ValueError(f"bad MNIST label magic {magic} in {path}")
        data = np.frombuffer(f.read(n), dtype=np.uint8)
    return data.astype(np.int32)


def _find(root_hints, *relparts) -> str | None:
    for root in root_hints:
        p = os.path.join(root, *relparts)
        if os.path.exists(p) or os.path.exists(p + ".gz"):
            return p
    return None


def load_mnist(root: str | None = None, train: bool = True):
    roots = [root] if root else list(_DEFAULT_ROOTS)
    roots = roots + [os.path.join(r, "MNIST", "raw") for r in roots]
    stem = "train" if train else "t10k"
    img = _find(roots, f"{stem}-images-idx3-ubyte")
    lbl = _find(roots, f"{stem}-labels-idx1-ubyte")
    if img is None or lbl is None:
        raise FileNotFoundError(
            f"MNIST {stem} idx files not found under {roots}; "
            "pass --data-dir or use --dataset synthetic"
        )
    x = _read_idx_images(img).astype(np.float32) / 255.0
    y = _read_idx_labels(lbl)
    return x, y


def load_cifar100(root: str | None = None, train: bool = True):
    roots = [root] if root else list(_DEFAULT_ROOTS)
    roots = roots + [os.path.join(r, "cifar-100-python") for r in roots]
    name = "train" if train else "test"
    p = _find(roots, name)
    if p is None:
        raise FileNotFoundError(
            f"CIFAR-100 '{name}' pickle not found under {roots}; "
            "pass --data-dir or use --dataset synthetic"
        )
    with open(p, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    x = d[b"data"].reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
    y = np.asarray(d[b"fine_labels"], dtype=np.int32)
    return x, y


def load_synthetic(
    chw: Tuple[int, int, int] = (1, 28, 28),
    num_classes: int = 10,
    n_train: int = 4096,
    n_test: int = 1024,
    train: bool = True,
    seed: int = 0,
):
    """Deterministic class-structured fake data (each class gets a distinct
    mean image plus noise, so tiny models can actually learn it)."""
    n = n_train if train else n_test
    rng = np.random.default_rng(seed + (0 if train else 1))
    proto_rng = np.random.default_rng(seed + 12345)
    protos = proto_rng.normal(0.5, 0.25, size=(num_classes, *chw)).astype(np.float32)
    y = rng.integers(0, num_classes, size=n).astype(np.int32)
    x = protos[y] + rng.normal(0, 0.15, size=(n, *chw)).astype(np.float32)
    return np.clip(x, 0.0, 1.0), y


def load_digits_dataset(train: bool = True, upscale: int = 4):
    """sklearn's bundled 8x8 digits (1,797 samples, 10 classes) — the one
    real image dataset available without network access. Nearest-neighbor
    upscaled (kron) to ``(1, 8*upscale, 8*upscale)`` so the standard ViT
    patch geometries apply. Deterministic 80/20 split."""
    from sklearn.datasets import load_digits

    d = load_digits()
    x = (d.images / 16.0).astype(np.float32)[:, None]  # (N, 1, 8, 8) in [0,1]
    if upscale > 1:
        x = np.kron(x, np.ones((1, 1, upscale, upscale), np.float32))
    y = d.target.astype(np.int32)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(x))
    split = int(0.8 * len(x))
    idx = order[:split] if train else order[split:]
    return x[idx], y[idx]


def load_dataset(
    name: str,
    root: str | None = None,
    train: bool = True,
    num_classes: int | None = None,
    synthetic_chw: Tuple[int, int, int] | None = None,
):
    """Returns ``(images (N, C, H, W) float32 in [0,1], labels (N,) int32,
    num_classes)``. Falls back to synthetic with a loud warning when real
    data is absent (this environment has no network egress)."""
    log = logging.getLogger("kanvit.data")
    if name == "mnist":
        try:
            x, y = load_mnist(root, train)
            return x, y, 10
        except FileNotFoundError as e:
            log.warning("%s — falling back to synthetic MNIST-shaped data", e)
            x, y = load_synthetic((1, 28, 28), 10, train=train)
            return x, y, 10
    if name == "cifar100":
        try:
            x, y = load_cifar100(root, train)
            return x, y, 100
        except FileNotFoundError as e:
            log.warning("%s — falling back to synthetic CIFAR-shaped data", e)
            x, y = load_synthetic((3, 32, 32), 100, train=train)
            return x, y, 100
    if name == "digits":
        x, y = load_digits_dataset(train)
        return x, y, 10
    if name == "synthetic":
        chw = synthetic_chw or (1, 28, 28)
        nc = num_classes or 10
        x, y = load_synthetic(chw, nc, train=train)
        return x, y, nc
    raise ValueError(f"unknown dataset {name!r}; choose from {DATASETS}")
