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


def create_train_state(
    model: Any,
    rng: jax.Array,
    sample_input,
    learning_rate: float = 1e-3,
) -> TrainState:
    params = model.init(rng, sample_input)["params"]
    tx = optax.adam(learning_rate)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
