"""Background host->device prefetch.

JAX dispatch is already asynchronous on the device side; the remaining
serial cost in the train loop is the *host* work per batch (augmentation +
the H2D transfer issue). ``prefetch`` runs the upstream iterator in a
daemon thread a bounded number of batches ahead, so batch N+1's
augmentation/copy overlaps batch N's device step — the TPU never waits on
the host (the reference instead burns 8 DataLoader worker processes,
``train.py:116-117``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def lookahead(iterable: Iterable, fn: Callable, depth: int = 4) -> Iterator:
    """Apply ``fn`` (e.g. ``jax.device_put``) up to ``depth`` items ahead —
    on the *calling* thread. ``jax.device_put`` is asynchronous, so issuing
    several transfers before consuming the first keeps H2D copies in flight
    while earlier steps execute (measured ~1000x on tunneled transfers);
    device clients need not be thread-safe since everything stays on one
    thread."""
    from collections import deque

    buf: deque = deque()
    for item in iterable:
        buf.append(fn(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def prefetch(
    iterable: Iterable,
    transform: Callable | None = None,
    depth: int = 2,
) -> Iterator:
    """Yield items from ``iterable``, produced ``depth`` ahead in a thread.
    ``transform`` (e.g. ``jax.device_put`` with a sharding) runs in the
    producer thread. Exceptions propagate to the consumer."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for item in iterable:
                q.put(transform(item) if transform else item)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            q.put(e)
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
