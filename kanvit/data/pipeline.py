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


class DataPipeline:
    """Shuffling, augmenting, fixed-shape batch iterator.

    ``backend='auto'`` uses the native C++ fused pipeline
    (``kanvit.data.native``: one multithreaded gather+flip+crop+normalize
    pass) when its shared library loads, else vectorized numpy. Both
    backends draw randomness from the same generator in the same order, so
    batches are bit-identical for a given seed.
    """

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
        backend: str = "auto",
    ):
        self.images = np.ascontiguousarray(images, np.float32)
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = augment
        self.stats = normalize_stats
        self.rng = np.random.default_rng(seed)
        self.drop_remainder = drop_remainder
        if backend == "auto":
            from kanvit.data import native

            self.backend = "native" if native.available() else "numpy"
        else:
            self.backend = backend
        if drop_remainder:
            self.num_batches = len(images) // batch_size
        else:
            self.num_batches = -(-len(images) // batch_size)

    def __len__(self) -> int:
        return self.num_batches

    def _draw_aug(self, n: int):
        flip = self.rng.random(n) < 0.5
        oy = self.rng.integers(0, 9, size=n)  # pad=4 -> [0, 2*pad]
        ox = self.rng.integers(0, 9, size=n)
        return flip, oy, ox

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.images)
        order = self.rng.permutation(n) if self.shuffle else np.arange(n)
        for b in range(self.num_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            y = self.labels[idx]
            flip = oy = ox = None
            if self.augment:
                flip, oy, ox = self._draw_aug(len(idx))

            if self.backend == "native":
                from kanvit.data import native

                mean, std = self.stats if self.stats is not None else (None, None)
                x = native.augment_batch(
                    self.images, idx.astype(np.int64), flip, oy, ox, 4, mean, std
                )
            else:
                x = self.images[idx]
                if self.augment:
                    xf = x.copy()
                    xf[flip] = xf[flip, :, :, ::-1]
                    x = _pad_crop_at(xf, 4, oy, ox)
                if self.stats is not None:
                    x = normalize(x, *self.stats)
            yield np.ascontiguousarray(x, np.float32), y


def _pad_crop_at(x: np.ndarray, pad: int, oy: np.ndarray, ox: np.ndarray):
    n, c, h, w = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    idx_y = oy[:, None] + np.arange(h)[None, :]
    idx_x = ox[:, None] + np.arange(w)[None, :]
    return xp[np.arange(n)[:, None, None, None], np.arange(c)[None, :, None, None],
              idx_y[:, None, :, None], idx_x[:, None, None, :]]
