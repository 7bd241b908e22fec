"""jit-compiled train/eval steps with optional bf16 compute policy.

One fused XLA program per step: forward, CE loss, backward, Adam update.
Loss/logit outputs stay on device; the loop transfers them once per epoch
(the reference does a D2H sync every batch, ``train.py:37,42-44`` — a
throughput drag kanvit deliberately avoids, SURVEY §7 "hard parts").

Mixed precision is the TPU-native policy the reference only gestures at with
its unused autocast/GradScaler (``attention.py:58-59,99-103``, SURVEY §2.10):
bf16 compute with f32 params and f32 loss — no loss scaler needed since bf16
has f32's exponent range.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def _loss_and_logits(apply_fn, params, x, y, bf16: bool, reduce: bool = True):
    if bf16:
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
        )
        x = x.astype(jnp.bfloat16)
    logits = apply_fn({"params": params}, x).astype(jnp.float32)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, y)
    return (loss.mean() if reduce else loss), logits


def make_train_step(
    bf16: bool = False, donate: bool = True, out_shardings=None,
    grad_accum: int = 1,
) -> Callable:
    """Returns ``step(state, x, y) -> (state, loss, logits)`` (jitted).

    ``out_shardings`` (``(state_shardings, loss, logits)``) pins the output
    layout — required when the step is AOT-compiled with donated buffers and
    sharded params, so the returned state's shardings keep matching the
    executable's inputs across steps.

    ``grad_accum > 1`` splits the batch into that many chunks and runs
    them through a ``lax.scan``, accumulating gradients and applying ONE
    optimizer update — activation memory drops to one chunk's worth, so
    effective batches can exceed what HBM fits in a single backward. CE
    is a per-example mean, so the averaged chunk gradients equal the
    full-batch gradient exactly (same update, same loss, chunk-count
    invariant). The reference has no equivalent (constant batch 128,
    ``train.py:88-90``).
    """

    def train_step(state, x, y):
        if grad_accum <= 1:
            (loss, logits), grads = jax.value_and_grad(
                lambda p: _loss_and_logits(state.apply_fn, p, x, y, bf16),
                has_aux=True,
            )(state.params)
            return state.apply_gradients(grads=grads), loss, logits

        b = x.shape[0]
        if b % grad_accum:
            raise ValueError(
                f"batch {b} not divisible by grad_accum={grad_accum}"
            )
        xs = x.reshape(grad_accum, b // grad_accum, *x.shape[1:])
        ys = y.reshape(grad_accum, b // grad_accum)

        def body(acc, xy):
            xi, yi = xy
            (loss, logits), grads = jax.value_and_grad(
                lambda p: _loss_and_logits(state.apply_fn, p, xi, yi, bf16),
                has_aux=True,
            )(state.params)
            return (
                jax.tree.map(jnp.add, acc, grads),
                (loss, logits),
            )

        zero = jax.tree.map(jnp.zeros_like, state.params)
        acc, (losses, logits) = jax.lax.scan(body, zero, (xs, ys))
        grads = jax.tree.map(lambda g: g / grad_accum, acc)
        logits = logits.reshape(b, *logits.shape[2:])
        return state.apply_gradients(grads=grads), losses.mean(), logits

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(train_step, donate_argnums=(0,) if donate else (), **kw)


def make_train_scan(
    bf16: bool = False, donate: bool = True, out_shardings=None
) -> Callable:
    """Returns ``run(state, xs, ys) -> (state, losses, logits)`` (jitted):
    ``K`` optimizer steps in ONE device program via ``lax.scan`` over stacked
    batches ``xs (K, B, ...)`` / ``ys (K, B)``.

    Per-step dispatch costs nothing on a local host but milliseconds on a
    tunneled device transport — at the reference's tiny MNIST config
    (~1.5 ms of device work per step) it dominates the step time and its
    day-to-day variance swamps any real signal (measured 30.6k-44.9k img/s
    across identical code). Scanning K steps per call amortizes one dispatch
    over K batches; XLA compiles the scan body once, so compile time does
    not grow with K. Outputs stack per-step losses ``(K,)`` and logits
    ``(K, B, C)`` so epoch metrics keep working.
    """

    def train_scan(state, xs, ys):
        def body(st, xy):
            x, y = xy
            (loss, logits), grads = jax.value_and_grad(
                lambda p: _loss_and_logits(st.apply_fn, p, x, y, bf16),
                has_aux=True,
            )(st.params)
            return st.apply_gradients(grads=grads), (loss, logits)

        state, (losses, logits) = jax.lax.scan(body, state, (xs, ys))
        return state, losses, logits

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(train_scan, donate_argnums=(0,) if donate else (), **kw)


def make_eval_step(
    bf16: bool = False, out_shardings=None, per_example: bool = False
) -> Callable:
    """Returns ``step(state, x, y) -> (loss, logits)`` (jitted).

    ``per_example=True`` returns the unreduced ``(B,)`` CE vector instead of
    the scalar mean, so callers that pad the final batch to the compiled
    shape can slice the padding back out of the loss (full-test-set
    coverage; the reference evaluates every sample, ``train.py:58-84``).
    """

    def eval_step(state, x, y):
        loss, logits = _loss_and_logits(
            state.apply_fn, state.params, x, y, bf16, reduce=not per_example
        )
        return loss, logits

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(eval_step, **kw)
