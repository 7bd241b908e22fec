"""Train state: params + Adam optimizer state as a flax TrainState.

The reference uses ``torch.optim.Adam(lr)`` with CE loss and no schedule,
weight decay, or clipping (reference ``train.py:22-23``; SURVEY §2.4) —
mirrored here with ``optax.adam`` (same update rule and default betas/eps).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


class EmaState(NamedTuple):
    """Shadow EMA of the params, carried INSIDE the optax state so
    checkpointing, sharding (``parallel.mesh.shard_state``) and the
    PP<->canonical conversion (``parallel.pipeline._map_moment_trees``)
    all see it as just another params-shaped optimizer tree."""

    ema: Any


def _ema_transform(decay: float) -> optax.GradientTransformation:
    """Appended LAST in the optimizer chain, so it sees the FINAL updates:
    it passes them through untouched and refreshes
    ``ema = decay * ema + (1 - decay) * (params + updates)`` — the
    post-step parameters, i.e. torch.optim.swa_utils.AveragedModel
    semantics applied on-device with zero extra dispatches."""
    import jax.numpy as jnp

    def init_fn(params):
        # A REAL copy, not an alias: the train step donates the whole
        # state, and donating the same underlying buffer twice (params +
        # an aliased ema) is a runtime error.
        return EmaState(ema=jax.tree.map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema transform needs params")
        new_ema = jax.tree.map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, EmaState(ema=new_ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params(state) -> Any | None:
    """The EMA param tree carried in ``state.opt_state``, or None if the
    optimizer was built without ``ema_decay``."""
    found = []

    def rec(o):
        if isinstance(o, EmaState):
            found.append(o.ema)
        elif isinstance(o, tuple):
            for i in o:
                rec(i)

    rec(state.opt_state)
    return found[0] if found else None


def make_optimizer(
    learning_rate: float = 1e-3,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int | None = None,
    weight_decay: float = 0.0,
    clip_grad_norm: float = 0.0,
    ema_decay: float = 0.0,
) -> optax.GradientTransformation:
    """The canonical optimizer (reference ``torch.optim.Adam(lr)``,
    ``train.py:22-23``). Single factory shared with the pipeline layout
    (``parallel.pipeline.create_pp_state``) so the two cannot drift — the
    PP<->canonical checkpoint conversion maps moment trees leaf-for-leaf
    and silently corrupts optimizer state if the update rules differ.

    Schedules (a kanvit extension; the reference trains at a fixed LR):
    ``constant`` with optional linear ``warmup_steps``, or ``cosine``
    (linear warmup then cosine decay to 0 over ``total_steps``). Scheduled
    runs add one ``ScaleByScheduleState`` count scalar to the opt state —
    params-shape independent, so the PP<->canonical moment-tree conversion
    passes it through untouched.

    ``weight_decay`` > 0 switches Adam to AdamW (decoupled decay, applied
    after the Adam normalization as in torch.optim.AdamW); ``clip_grad_norm``
    > 0 clips gradients by GLOBAL norm before the Adam moments see them.
    Both are stateless transforms (``EmptyState``), so the PP<->canonical
    opt_state conversion passes their slots through untouched.
    ``ema_decay`` > 0 maintains a shadow EMA of the post-step params inside
    the opt state (:class:`EmaState`; read it back with
    :func:`ema_params`) — the eval pass uses it when enabled."""
    if lr_schedule == "constant":
        if warmup_steps <= 0:
            lr = learning_rate
        else:
            lr = optax.join_schedules(
                [optax.linear_schedule(0.0, learning_rate, warmup_steps),
                 optax.constant_schedule(learning_rate)],
                [warmup_steps],
            )
    elif lr_schedule == "cosine":
        if not total_steps:
            raise ValueError("--lr-schedule cosine needs a known total step "
                             "count (epochs x steps/epoch)")
        if warmup_steps >= total_steps:
            raise ValueError(
                f"--warmup-steps ({warmup_steps}) must be < the total step "
                f"count ({total_steps}) under --lr-schedule cosine — there "
                "would be no decay phase left"
            )
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate,
            warmup_steps=max(0, warmup_steps),
            decay_steps=total_steps, end_value=0.0,
        )
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r} "
                         "(constant|cosine)")
    base = (optax.adamw(lr, weight_decay=weight_decay) if weight_decay > 0
            else optax.adam(lr))
    parts = [base]
    if clip_grad_norm > 0:
        parts.insert(0, optax.clip_by_global_norm(clip_grad_norm))
    if ema_decay > 0:
        parts.append(_ema_transform(ema_decay))
    return optax.chain(*parts) if len(parts) > 1 else base


def create_train_state(
    model: Any,
    rng: jax.Array,
    sample_input,
    learning_rate: float = 1e-3,
    lr_schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int | None = None,
    weight_decay: float = 0.0,
    clip_grad_norm: float = 0.0,
    ema_decay: float = 0.0,
) -> TrainState:
    params = model.init(rng, sample_input)["params"]
    tx = make_optimizer(learning_rate, lr_schedule, warmup_steps, total_steps,
                        weight_decay, clip_grad_norm, ema_decay)
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
