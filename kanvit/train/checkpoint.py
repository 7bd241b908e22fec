"""Checkpoint / resume — a capability the reference lacks entirely.

The reference never persists anything but text logs (no ``torch.save``
anywhere, SURVEY §5). kanvit checkpoints the full train state (step, params,
Adam moments) as a single msgpack file via flax.serialization, with a
``latest`` pointer for ``--resume``.
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization


def save_checkpoint(ckpt_dir: str, state: Any, step: int) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))
    with open(os.path.join(ckpt_dir, "latest"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    pointer = os.path.join(ckpt_dir, "latest")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    path = os.path.join(ckpt_dir, name)
    return path if os.path.exists(path) else None


def restore_checkpoint(path: str, template_state: Any) -> Any:
    """Restore into a state pytree of the same structure (build the template
    with ``create_train_state`` on the same model config)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template_state, f.read())


def restore_params(path: str, template_params: Any) -> Any:
    """Restore ONLY the param tree from a full-state checkpoint — for
    consumers that don't know (or care) how the optimizer was configured
    (e.g. inference, torch export): the opt_state structure in the file may
    be any make_optimizer chain."""
    from flax.serialization import from_state_dict, msgpack_restore

    with open(path, "rb") as f:
        raw = msgpack_restore(f.read())
    return from_state_dict(template_params, raw["params"])
