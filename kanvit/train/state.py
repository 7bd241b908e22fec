"""Train state: params + Adam optimizer state as a flax TrainState.

The reference uses ``torch.optim.Adam(lr)`` with CE loss and no schedule,
weight decay, or clipping (reference ``train.py:22-23``; SURVEY §2.4) —
mirrored here with ``optax.adam`` (same update rule and default betas/eps).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def make_optimizer(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    """The canonical optimizer (reference ``torch.optim.Adam(lr)``,
    ``train.py:22-23``). Single factory shared with the pipeline layout
    (``parallel.pipeline.create_pp_state``) so the two cannot drift — the
    PP<->canonical checkpoint conversion maps moment trees leaf-for-leaf
    and silently corrupts optimizer state if the update rules differ."""
    return optax.adam(learning_rate)


def create_train_state(
    model: Any,
    rng: jax.Array,
    sample_input,
    learning_rate: float = 1e-3,
) -> TrainState:
    params = model.init(rng, sample_input)["params"]
    tx = make_optimizer(learning_rate)
    # Stateful B-spline grids (models built with stateful_grid=True) live in
    # the param tree so checkpointing/sharding see them, but they are knot
    # positions, not weights: zero their gradients ahead of Adam — only the
    # periodic update_grid refit (kanvit.train.grid_update) moves them.
    # A chained pre-transform (rather than optax.masked) keeps the Adam
    # moment trees mirroring the param tree exactly, which shard_state and
    # checkpoint restore both rely on.
    has_grid = any(
        str(getattr(path[-1], "key", path[-1])) == "grid"
        for path, _ in jax.tree_util.tree_leaves_with_path(params)
    )
    if has_grid:
        tx = optax.chain(_zero_grid_grads(), tx)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _zero_grid_grads() -> optax.GradientTransformation:
    import jax.numpy as jnp

    def update_fn(updates, opt_state, params=None):
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: jnp.zeros_like(u)
            if str(getattr(path[-1], "key", path[-1])) == "grid"
            else u,
            updates,
        )
        return updates, opt_state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)
