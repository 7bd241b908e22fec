"""Multi-host initialization: DP over DCN, TP/DP over ICI within each pod.

The reference has no distributed backend at all (no torch.distributed /
NCCL / MPI anywhere — SURVEY §2.10). The TPU-native equivalent is
``jax.distributed.initialize`` + the same mesh/sharding code as single-host:
once initialized, ``jax.devices()`` spans all hosts and
``kanvit.parallel.mesh.create_mesh`` lays the ``(data, model)`` mesh across
them (XLA routes collectives over ICI within a slice and DCN across
slices).
"""

from __future__ import annotations

import logging
import os

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Idempotent multi-host init. With no args, relies on the TPU
    environment's auto-detection (GCE metadata / megascale env vars); args
    override for manual clusters. No-op for single-process runs."""
    log = logging.getLogger("kanvit.parallel")
    if num_processes in (None, 1) and "COORDINATOR_ADDRESS" not in os.environ \
            and coordinator_address is None:
        log.info("single-process run; skipping jax.distributed.initialize")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    log.info(
        "distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """(per-process batch, offset) for host-sharded data loading."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    return per, per * jax.process_index()
