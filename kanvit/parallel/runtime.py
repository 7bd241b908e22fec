"""Active-mesh runtime: SPMD-safe dispatch of Pallas kernels.

XLA's SPMD partitioner cannot partition a Pallas custom call — it has no
sharding rule, so a kernel traced under ``jit`` with mesh-sharded operands
would at best be fed all-gathered inputs (every device computing the full
problem, silently defeating both the ``data``-axis batch sharding and the
``model``-axis head-parallelism) and at worst fail to lower. kanvit's rule:
**a multi-device program never contains a bare ``pallas_call``** — when a
mesh with more than one device is in play, every kernel entry point routes
through ``jax.shard_map`` so each device launches the kernel on its local
shard and XLA's collectives stay *outside* the kernel (the scaling-book
recipe: pick a mesh, annotate shardings, keep custom kernels per-shard).

The trainer activates its mesh here (``activate_mesh``); layer/kernel code
consults ``active_mesh()`` at trace time. Inside a ``shard_map`` body the
context reports no mesh (``local_region``) so nested kernel entries run
plain — shapes there are already per-device.

The reference has no working counterpart: its only parallelism is a
constructed-but-unused ``DataParallel`` plus a manual ``cuda:i`` scatter
that corrupts q (reference ``attention.py:56-57,91-97``, SURVEY §2.10).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_ACTIVE: Mesh | None = None
_LOCAL_DEPTH = 0  # >0 while tracing inside a shard_map body we emitted


def activate_mesh(mesh: Mesh | None) -> None:
    """Install ``mesh`` as the process-wide active mesh. A 1-device mesh
    (the single-chip bench / tests) deactivates — nothing needs wrapping."""
    global _ACTIVE
    _ACTIVE = mesh if mesh is not None and mesh.size > 1 else None


def active_mesh() -> Mesh | None:
    """The mesh kernels must partition over, or None (single device, no
    mesh installed, or currently tracing inside a shard_map body)."""
    if _LOCAL_DEPTH:
        return None
    return _ACTIVE


@contextmanager
def local_region():
    """Mark the dynamic extent of a shard_map body trace: nested kernel
    entries see ``active_mesh() is None`` and run on their local shard."""
    global _LOCAL_DEPTH
    _LOCAL_DEPTH += 1
    try:
        yield
    finally:
        _LOCAL_DEPTH -= 1


@contextmanager
def mesh_active(mesh: Mesh | None):
    """Temporarily install a mesh (tests; the trainer uses activate_mesh)."""
    global _ACTIVE
    prev = _ACTIVE
    activate_mesh(mesh)
    try:
        yield
    finally:
        _ACTIVE = prev


def _is_array(a) -> bool:
    return hasattr(a, "shape") and hasattr(a, "dtype")


def kan_op(pallas_fn, jnp_fn, x, *args):
    """Mesh-safe dispatch for a standalone KAN layer op.

    ``x`` is the activation (batch on axis 0, sharded over ``data``); every
    array in ``args`` is a parameter or constant table (replicated — the TP
    rules shard only attention head stacks and the FF pair). No mesh: the
    plain Pallas entry (which itself falls back to jnp below its fusion
    thresholds). Active mesh: the Pallas entry inside ``shard_map`` over
    the ``data`` axis. Batch not divisible by the data axis: the jnp twin,
    whose HLO the partitioner shards natively.
    """
    from kanvit.ops import dispatch

    if not dispatch.use_pallas():
        return jnp_fn(x, *args)
    mesh = active_mesh()
    if mesh is None:
        return pallas_fn(x, *args)
    nd = mesh.shape.get("data", 1)
    if nd <= 1 or x.shape[0] % nd:
        return jnp_fn(x, *args)

    arr_idx = tuple(i for i, a in enumerate(args) if _is_array(a))
    arrs = tuple(args[i] for i in arr_idx)

    def body(xl, *aa):
        full = list(args)
        for j, i in enumerate(arr_idx):
            full[i] = aa[j]
        with local_region():
            return pallas_fn(xl, *full)

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P("data"),) + tuple(P() for _ in arrs),
        out_specs=P("data"),
        check_vma=False,
    )(x, *arrs)
