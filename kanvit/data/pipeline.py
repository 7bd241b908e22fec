"""Host-side input pipeline: vectorized augmentation, normalization, batching.

The reference's data work happens in 8 torchvision DataLoader worker
processes doing per-sample PIL transforms (reference ``train.py:99-117``).
TPU-first, the equivalent is: keep the device hot path free of data work,
run *vectorized* whole-batch numpy transforms on host, and hand XLA fixed
static shapes (every batch identical; the trailing partial batch is dropped
exactly like static-shape training pipelines do).

Augmentation parity (reference ``train.py:100-105``): random horizontal flip
(p=0.5) + pad-4 reflect0/zero crop back to 32 + normalize with the CIFAR-100
mean/std. MNIST mode applies no augmentation and no normalization (the
README's "Transformations: None" setting, SURVEY §2.9.3).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

CIFAR100_MEAN = np.array([0.5071, 0.4867, 0.4408], np.float32)
CIFAR100_STD = np.array([0.2675, 0.2565, 0.2761], np.float32)


def normalize(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    return (x - mean[:, None, None]) / std[:, None, None]


def random_flip(x: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    flip = rng.random(x.shape[0]) < 0.5
    out = x.copy()
    out[flip] = out[flip, :, :, ::-1]
    return out


def random_pad_crop(x: np.ndarray, pad: int, rng: np.random.Generator) -> np.ndarray:
    """Whole-batch pad+random-crop (torchvision RandomCrop(32, padding=4)
    semantics: zero padding, uniform offset per sample)."""
    n, c, h, w = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oy = rng.integers(0, 2 * pad + 1, size=n)
    ox = rng.integers(0, 2 * pad + 1, size=n)
    # Gather crops via advanced indexing on a strided view (vectorized).
    idx_y = oy[:, None] + np.arange(h)[None, :]
    idx_x = ox[:, None] + np.arange(w)[None, :]
    return xp[np.arange(n)[:, None, None, None], np.arange(c)[None, :, None, None],
              idx_y[:, None, :, None], idx_x[:, None, None, :]]


class DataPipeline:
    """Shuffling, augmenting, fixed-shape batch iterator."""

    def __init__(
        self,
        images: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        *,
        shuffle: bool,
        augment: bool = False,
        normalize_stats: Tuple[np.ndarray, np.ndarray] | None = None,
        seed: int = 0,
        drop_remainder: bool = True,
    ):
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.stats = normalize_stats
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder
        if drop_remainder:
            self.num_batches = len(images) // batch_size
        else:
            self.num_batches = -(-len(images) // batch_size)

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.images)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for b in range(self.num_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            x = self.images[idx]
            y = self.labels[idx]
            if self.augment:
                x = random_flip(x, self.rng)
                x = random_pad_crop(x, 4, self.rng)
            if self.stats is not None:
                x = normalize(x, *self.stats)
            yield np.ascontiguousarray(x, np.float32), y
