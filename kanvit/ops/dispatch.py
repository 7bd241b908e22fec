"""Implementation dispatch: pure-JAX (``jnp``) vs Pallas TPU kernels.

Every hot op in kanvit has two implementations with identical semantics:
the pure-JAX ground truth in ``kanvit.ops`` and a fused Pallas kernel in
``kanvit.kernels``. Selection:

- ``"auto"`` (default): Pallas when the default JAX backend is TPU, else jnp.
- ``"jnp"`` / ``"pallas"``: force one side (tests force both and compare).
- env var ``KANVIT_IMPL`` overrides the initial default.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax

_VALID = ("auto", "jnp", "pallas")
_impl = os.environ.get("KANVIT_IMPL", "auto")
if _impl not in _VALID:
    raise ValueError(f"KANVIT_IMPL must be one of {_VALID}, got {_impl!r}")


def set_impl(impl: str) -> None:
    global _impl
    if impl not in _VALID:
        raise ValueError(f"impl must be one of {_VALID}, got {impl!r}")
    _impl = impl


def get_impl() -> str:
    return _impl


def use_pallas() -> bool:
    if _impl == "pallas":
        return True
    if _impl == "jnp":
        return False
    return jax.default_backend() == "tpu"


@contextmanager
def jnp_scope():
    """Force the jnp implementations for the dynamic extent of a trace
    region. Used where Pallas custom calls would be opaque to the SPMD
    partitioner (e.g. the vmapped per-head MSA path under a model-sharded
    mesh, ``kanvit.parallel.runtime``): the jnp twins lower to plain HLO
    that XLA partitions natively."""
    global _impl
    prev = _impl
    _impl = "jnp"
    try:
        yield
    finally:
        _impl = prev


def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (forced-pallas tests
    on the CPU CI mesh exercise the exact kernel code paths)."""
    return jax.default_backend() != "tpu"
