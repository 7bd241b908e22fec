"""Vectorized patch extraction.

The reference builds patches with a Python double loop of slice-copies
(reference ``model.py:111-126``): patch index runs row-major over the patch
grid and each patch is flattened channel-major (``patch.flatten(start_dim=1)``
over a ``(C, ph, pw)`` patch). Here the same layout is produced with a single
reshape/transpose — one XLA fusion, no loop, no intermediate zeros tensor.
"""

from __future__ import annotations

import jax.numpy as jnp


def patchify(images: jnp.ndarray, n_patches: int) -> jnp.ndarray:
    """``[B, C, H, W] -> [B, n_patches**2, C * ph * pw]``.

    Matches reference ``model.py:111-126``: patch ``idx = i * n_patches + j``
    (row-major over the patch grid) and per-patch flattening in ``(C, ph, pw)``
    C-order.
    """
    b, c, h, w = images.shape
    if h % n_patches or w % n_patches:
        raise ValueError(
            f"image size ({h}x{w}) not divisible by n_patches={n_patches}"
        )
    ph, pw = h // n_patches, w // n_patches
    x = images.reshape(b, c, n_patches, ph, n_patches, pw)
    # -> (B, grid_i, grid_j, C, ph, pw): patch grid row-major, patch body C-major
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, n_patches * n_patches, c * ph * pw)


def unpatchify(patches: jnp.ndarray, n_patches: int, chw: tuple) -> jnp.ndarray:
    """Inverse of :func:`patchify` — ``[B, P**2, C*ph*pw] -> [B, C, H, W]``."""
    c, h, w = chw
    ph, pw = h // n_patches, w // n_patches
    b = patches.shape[0]
    x = patches.reshape(b, n_patches, n_patches, c, ph, pw)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)
