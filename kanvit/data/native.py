"""ctypes bindings for the native (C++) host data pipeline.

Loads ``native/libkanvit_data.so``; builds it with the checked-in Makefile
on first use if missing (g++ is in the image, pybind11 is not — plain C ABI
via ctypes). Everything degrades gracefully to the numpy pipeline when the
toolchain is unavailable: ``available()`` gates the fast path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "native"
)


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = os.path.join(_NATIVE_DIR, "libkanvit_data.so")
        if not os.path.exists(so):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120,
                )
            except Exception as e:  # noqa: BLE001
                logging.getLogger("kanvit.data").info(
                    "native dataloader unavailable (%s); using numpy", e
                )
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            logging.getLogger("kanvit.data").info(
                "failed to load %s (%s); using numpy", so, e
            )
            return None
        lib.kanvit_augment_batch.restype = ctypes.c_int
        lib.kanvit_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # images
            ctypes.POINTER(ctypes.c_int64),   # indices
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),   # flip
            ctypes.POINTER(ctypes.c_int32),   # oy
            ctypes.POINTER(ctypes.c_int32),   # ox
            ctypes.c_int,                     # pad
            ctypes.POINTER(ctypes.c_float),   # mean
            ctypes.POINTER(ctypes.c_float),   # std
            ctypes.POINTER(ctypes.c_float),   # out
            ctypes.c_int,                     # n_threads
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype)) if arr is not None else None


def augment_batch(
    images: np.ndarray,
    indices: np.ndarray,
    flip: np.ndarray | None,
    oy: np.ndarray | None,
    ox: np.ndarray | None,
    pad: int,
    mean: np.ndarray | None,
    std: np.ndarray | None,
    n_threads: int = 0,
) -> np.ndarray:
    """Fused gather + flip + pad/crop + normalize over a batch.

    ``images``: full dataset ``(n_total, C, H, W)`` float32 C-contiguous;
    ``indices``: ``(n_batch,)`` int64. Returns ``(n_batch, C, H, W)``.
    """
    lib = _load()
    assert lib is not None, "native dataloader not available"
    n_batch = len(indices)
    _, c, h, w = images.shape
    out = np.empty((n_batch, c, h, w), np.float32)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)

    images = np.ascontiguousarray(images, np.float32)
    indices = np.ascontiguousarray(indices, np.int64)
    flip = np.ascontiguousarray(flip, np.uint8) if flip is not None else None
    oy = np.ascontiguousarray(oy, np.int32) if oy is not None else None
    ox = np.ascontiguousarray(ox, np.int32) if ox is not None else None
    mean = np.ascontiguousarray(mean, np.float32) if mean is not None else None
    std = np.ascontiguousarray(std, np.float32) if std is not None else None

    rc = lib.kanvit_augment_batch(
        _ptr(images, ctypes.c_float),
        _ptr(indices, ctypes.c_int64),
        n_batch, c, h, w,
        _ptr(flip, ctypes.c_uint8),
        _ptr(oy, ctypes.c_int32),
        _ptr(ox, ctypes.c_int32),
        pad,
        _ptr(mean, ctypes.c_float),
        _ptr(std, ctypes.c_float),
        _ptr(out, ctypes.c_float),
        n_threads,
    )
    assert rc == 0
    return out
