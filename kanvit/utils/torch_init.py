"""Initializers matching PyTorch's distributions.

Trained-accuracy parity with the reference requires matching its parameter
*init distributions* (not values): ``nn.Linear``'s kaiming-uniform(a=sqrt(5)),
kaiming with per-layer scale knobs (reference ``models/effkan.py:74-97``),
trunc-normal (``models/fastkan.py:11-12``). Weight convention throughout
kanvit is the torch one — ``(out_features, in_features)`` — so reference
checkpoints map 1:1 (see ``kanvit.utils.torch_compat``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(a: float, fan_in_axis: int = -1):
    """torch ``kaiming_uniform_`` with negative-slope ``a`` (fan_in mode).

    ``bound = sqrt(2 / (1 + a^2)) * sqrt(3 / fan_in)``; U(-bound, bound).
    For torch-convention ``(out, in)`` weights fan_in is the last axis.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[fan_in_axis]
        gain = math.sqrt(2.0 / (1.0 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def linear_default_weight():
    """torch ``nn.Linear`` default weight init: kaiming_uniform(a=sqrt(5))."""
    return kaiming_uniform(math.sqrt(5.0))


def linear_default_bias(fan_in: int):
    """torch ``nn.Linear`` default bias init: U(-1/sqrt(fan_in), +)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal(std: float, mean: float = 0.0, lower: float = -2.0, upper: float = 2.0):
    """torch ``trunc_normal_`` (absolute cutoffs, defaults [-2, 2])."""

    def init(key, shape, dtype=jnp.float32):
        lo = (lower - mean) / std
        hi = (upper - mean) / std
        return jax.random.truncated_normal(key, lo, hi, shape, dtype) * std + mean

    return init


def uniform_symmetric(bound: float):
    """U(-bound, bound)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
