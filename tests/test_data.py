"""Data pipeline: shapes, augmentation, normalization, determinism."""

import numpy as np

from kanvit.data.datasets import load_dataset
from kanvit.data.pipeline import CIFAR100_MEAN, CIFAR100_STD, DataPipeline
from kanvit.ops.patchify import patchify, unpatchify


def test_synthetic_dataset_learnable_structure():
    x, y, nc = load_dataset("synthetic", train=True)
    assert x.shape[1:] == (1, 28, 28) and nc == 10
    assert x.min() >= 0 and x.max() <= 1
    # per-class means must differ (class signal exists)
    m0 = x[y == 0].mean(axis=0)
    m1 = x[y == 1].mean(axis=0)
    assert np.abs(m0 - m1).max() > 0.1


def test_pipeline_fixed_shapes_and_drop_remainder():
    x = np.random.rand(70, 3, 32, 32).astype(np.float32)
    y = np.zeros(70, np.int32)
    pipe = DataPipeline(x, y, 32, shuffle=True)
    batches = list(pipe)
    assert len(batches) == 2
    assert all(b[0].shape == (32, 3, 32, 32) for b in batches)


def test_augmentation_and_normalization():
    x = np.random.rand(16, 3, 32, 32).astype(np.float32)
    y = np.zeros(16, np.int32)
    pipe = DataPipeline(
        x, y, 16, shuffle=False, augment=True,
        normalize_stats=(CIFAR100_MEAN, CIFAR100_STD), seed=1,
    )
    (bx, _), = list(pipe)
    assert bx.shape == x.shape
    # normalized stats: not in [0,1] anymore
    assert bx.min() < -0.5
    # determinism per seed
    pipe2 = DataPipeline(
        x, y, 16, shuffle=False, augment=True,
        normalize_stats=(CIFAR100_MEAN, CIFAR100_STD), seed=1,
    )
    (bx2, _), = list(pipe2)
    assert np.array_equal(bx, bx2)


def test_patchify_roundtrip():
    import jax.numpy as jnp

    x = np.random.rand(2, 3, 32, 32).astype(np.float32)
    p = patchify(jnp.asarray(x), 4)
    back = unpatchify(p, 4, (3, 32, 32))
    assert np.abs(np.asarray(back) - x).max() < 1e-7


def test_native_pipeline_matches_numpy():
    """The C++ fused pipeline must produce bit-identical batches."""
    import pytest

    from kanvit.data import native

    if not native.available():
        pytest.skip("native dataloader not built")
    x = np.random.rand(128, 3, 32, 32).astype(np.float32)
    y = np.arange(128, dtype=np.int32)
    for aug in (False, True):
        a = DataPipeline(x, y, 64, shuffle=True, augment=aug,
                         normalize_stats=(CIFAR100_MEAN, CIFAR100_STD),
                         seed=3, backend="numpy")
        b = DataPipeline(x, y, 64, shuffle=True, augment=aug,
                         normalize_stats=(CIFAR100_MEAN, CIFAR100_STD),
                         seed=3, backend="native")
        for (xa, ya), (xb, yb) in zip(a, b):
            assert np.array_equal(ya, yb)
            assert np.abs(xa - xb).max() < 1e-6


def test_prefetch_preserves_order_and_errors():
    from kanvit.data.prefetch import prefetch

    assert list(prefetch(range(10), transform=lambda x: x * 2)) == list(range(0, 20, 2))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    import pytest

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_digits_dataset_real_data():
    from kanvit.data.datasets import load_dataset

    x_tr, y_tr, nc = load_dataset("digits", train=True)
    x_te, y_te, _ = load_dataset("digits", train=False)
    assert nc == 10
    assert x_tr.shape[1:] == (1, 32, 32)
    assert len(x_tr) + len(x_te) == 1797  # sklearn digits size
    # deterministic split, no overlap by construction, labels sane
    assert set(np.unique(y_tr)) == set(range(10))
    assert x_tr.min() >= 0 and x_tr.max() <= 1
