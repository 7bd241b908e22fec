"""Sinusoidal positional embedding table.

Replicates reference ``model.py:128-140`` exactly, including its quirk: for
odd column ``j`` the exponent is ``j / d`` (NOT the canonical ``(j - 1) / d``),
i.e. ``pe[i, j] = sin(i / 10000**(j/d))`` for even ``j`` and
``cos(i / 10000**(j/d))`` for odd ``j``. The reference builds the table with a
Python double loop; here it is one vectorized expression evaluated once at
model init (registered as a constant, exactly like the reference's
non-persistent buffer at ``model.py:86-90``).
"""

from __future__ import annotations

import numpy as np


def sinusoidal_positional_embeddings(seq_length: int, d: int) -> np.ndarray:
    """``(seq_length, d)`` float32 table with reference quirk parity."""
    i = np.arange(seq_length, dtype=np.float64)[:, None]
    j = np.arange(d, dtype=np.float64)[None, :]
    angle = i / np.power(10000.0, j / d)
    table = np.where(j % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)
