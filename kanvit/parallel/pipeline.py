"""Pipeline parallelism: SPMD microbatch pipeline over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY §2.10: PP "absent"; its
only parallelism is the broken ``DataParallel`` vestige, reference
``attention.py:56-57,91-97``). This is the TPU-native PP design: the
transformer blocks — structurally identical per depth (reference
``model.py:93-103``) — are stacked on a leading block axis, that axis is
sharded across the ``pipe`` mesh axis so each device group holds one
*stage* of ``n_blocks / n_stages`` blocks, and a ``lax.scan`` over
``n_micro + n_stages - 1`` ticks streams microbatches through the stages
with one ``lax.ppermute`` ICI hop per tick (the GPipe schedule, expressed
SPMD: every device runs the same program, bubble ticks compute discarded
values). The backward pass needs no hand-written schedule — JAX transposes
the scan + ppermute into the reverse pipeline automatically, and
``jax.checkpoint`` around the per-tick stage keeps residuals at
O(ticks x microbatch) instead of O(ticks x microbatch x blocks_per_stage).

The embedding and head run outside the pipeline under plain ``jit`` (their
params are tiny and replicated over ``pipe``; batch stays sharded over
``data``) — the standard treatment for small non-repeated ends.

Composition: PP composes with DP (batch on ``data``, stages on ``pipe``).
PP does not compose with TP in this first cut — stage params enter the
``shard_map`` replicated over ``model`` (sharding them would require
manual TP collectives inside the stage body; the SPMD partitioner cannot
see through a shard_map). ``docs/ARCHITECTURE.md`` records the rule.

State layout: the PP train state holds ``{"outer": ..., "blocks": ...}``
where ``blocks`` leaves carry a leading ``n_blocks`` axis sharded
``P("pipe")``. ``split_params`` / ``merge_params`` convert to/from the
canonical per-block tree (``blocks_0`` ... ``blocks_{L-1}``), so
checkpoints can round-trip through the canonical layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kanvit.parallel import runtime
from kanvit.parallel.mesh import param_shardings

_BLOCK_PREFIX = "blocks_"


# ---------------------------------------------------------------------------
# Param layout: canonical (blocks_i subtrees) <-> stacked pipeline layout
# ---------------------------------------------------------------------------

def split_params(params, n_blocks: int):
    """Canonical param tree -> ``{"outer": ..., "blocks": stacked}`` where
    ``blocks`` leaves gain a leading ``n_blocks`` axis."""
    outer = {
        k: v for k, v in params.items() if not k.startswith(_BLOCK_PREFIX)
    }
    blocks = [params[f"{_BLOCK_PREFIX}{i}"] for i in range(n_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {"outer": outer, "blocks": stacked}


def merge_params(pp_params, n_blocks: int):
    """Inverse of ``split_params``."""
    params = dict(pp_params["outer"])
    stacked = pp_params["blocks"]
    for i in range(n_blocks):
        params[f"{_BLOCK_PREFIX}{i}"] = jax.tree.map(
            lambda a: a[i], stacked
        )
    return params


def _map_moment_trees(conv, opt_state):
    """Apply ``conv`` to every params-shaped tree inside an optax state
    (the Adam ``mu``/``nu`` moments). PP rejects stateful grids, so the
    chain is plain ``optax.adam`` — ScaleByAdamState is the only stateful
    element to rewrite."""

    def rec(o):
        if isinstance(o, optax.ScaleByAdamState):
            return o._replace(mu=conv(o.mu), nu=conv(o.nu))
        if isinstance(o, tuple):
            vals = [rec(i) for i in o]
            return type(o)(*vals) if hasattr(o, "_fields") else tuple(vals)
        return o

    return rec(opt_state)


def pp_state_to_canonical(state, n_blocks: int):
    """Pipeline-layout TrainState -> canonical layout (``blocks_i``
    subtrees) for checkpointing: a PP run's checkpoint must resume under
    DP/TP and vice versa (docs/ARCHITECTURE.md rule 6)."""
    conv = lambda t: merge_params(t, n_blocks)
    return state.replace(
        params=conv(state.params),
        opt_state=_map_moment_trees(conv, state.opt_state),
    )


def canonical_state_to_pp(state, n_blocks: int):
    """Inverse of ``pp_state_to_canonical`` (restore path)."""
    conv = lambda t: split_params(t, n_blocks)
    return state.replace(
        params=conv(state.params),
        opt_state=_map_moment_trees(conv, state.opt_state),
    )


def pp_param_shardings(pp_params, mesh: Mesh):
    """Shardings for the pipeline layout: ``blocks`` leaves split on their
    leading block axis over ``pipe``; ``outer`` follows the TP rules
    (in practice replicated — no rule matches the mapper/head)."""
    outer = param_shardings(pp_params["outer"], mesh)
    n_pipe = mesh.shape.get("pipe", 1)

    def blk(leaf):
        spec = P("pipe") if n_pipe > 1 and leaf.shape[0] % n_pipe == 0 else P()
        return NamedSharding(mesh, spec)

    return {"outer": outer, "blocks": jax.tree.map(blk, pp_params["blocks"])}


# ---------------------------------------------------------------------------
# The pipeline schedule
# ---------------------------------------------------------------------------

def _pipe_local(stage_fn, p_local, xs, *, axis, n_stages, n_micro):
    """Per-device pipeline body (inside shard_map over ``axis``).

    ``p_local``: this stage's block stack (leading dim blocks_per_stage).
    ``xs``: the full microbatch stream ``(M, mb, T, D)`` (replicated over
    the pipe axis; only stage 0 reads it). Returns ``(1, M, mb, T, D)`` —
    the collect buffer, real only on the last stage; the caller's
    ``out_specs`` stacks the per-stage buffers on the leading axis and the
    last one is sliced out. Keeping the gather in the out-spec (instead of
    a psum) makes the backward exact by construction: the slice's
    transpose routes the cotangent only into the last stage's scan, from
    which the transposed ppermutes walk it back up the pipeline.
    """
    s = lax.axis_index(axis)
    act = jnp.zeros(xs.shape[1:], xs.dtype)
    outs = jnp.zeros(xs.shape, xs.dtype)
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def tick(carry, t):
        act, outs = carry
        # Stage 0 ingests microbatch t; past the stream it re-reads the
        # last one (discarded — see the collect mask below). Other stages
        # consume what the previous tick's ppermute delivered.
        feed = lax.dynamic_index_in_dim(
            xs, jnp.minimum(t, n_micro - 1), 0, keepdims=False
        )
        inp = jnp.where(s == 0, feed, act)
        out = stage_fn(p_local, inp).astype(xs.dtype)
        # Microbatch j reaches the last stage at tick j + n_stages - 1.
        oidx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        prev = lax.dynamic_index_in_dim(outs, oidx, 0, keepdims=False)
        collect = jnp.logical_and(s == n_stages - 1, t >= n_stages - 1)
        outs = lax.dynamic_update_index_in_dim(
            outs, jnp.where(collect, out, prev), oidx, 0
        )
        act = lax.ppermute(out, axis, perm)
        return (act, outs), None

    (_, outs), _ = lax.scan(
        tick, (act, outs), jnp.arange(n_micro + n_stages - 1)
    )
    return outs[None]


def pipeline_blocks(
    block_apply,
    stacked,
    tokens: jnp.ndarray,
    mesh: Mesh | None,
    n_micro: int,
    *,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
    remat: bool = True,
):
    """Run ``tokens (B, T, D)`` through the stacked block params, pipelined
    over ``pipe_axis`` with ``n_micro`` microbatches. With no mesh (or a
    1-device pipe axis) this is a plain ``lax.scan`` over blocks."""
    n_blocks = jax.tree.leaves(stacked)[0].shape[0]
    n_stages = mesh.shape.get(pipe_axis, 1) if mesh is not None else 1

    def stage_fn(p_stack, x):
        def body(c, p):
            return block_apply(p, c), None

        out, _ = lax.scan(body, x, p_stack)
        return out

    if n_stages <= 1:
        return stage_fn(stacked, tokens)

    if n_blocks % n_stages:
        raise ValueError(
            f"pipeline: n_blocks={n_blocks} not divisible by "
            f"{n_stages} stages"
        )
    b = tokens.shape[0]
    if b % n_micro:
        raise ValueError(
            f"pipeline: batch {b} not divisible by n_micro={n_micro}"
        )
    if remat:
        stage_fn = jax.checkpoint(stage_fn)
    xs = tokens.reshape(n_micro, b // n_micro, *tokens.shape[1:])

    def local(p_local, xl):
        with runtime.local_region():
            return _pipe_local(
                stage_fn, p_local, xl,
                axis=pipe_axis, n_stages=n_stages, n_micro=n_micro,
            )

    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(None, data_axis)),
        out_specs=P(pipe_axis, None, data_axis),
        check_vma=False,
    )(stacked, xs)
    # Leading axis = stage; only the last stage's collect buffer is real.
    return out[-1].reshape(b, *tokens.shape[1:])


# ---------------------------------------------------------------------------
# Train / eval steps in the pipeline layout
# ---------------------------------------------------------------------------

def make_block_module(model):
    """A standalone block module whose param tree equals one ``blocks_i``
    subtree of ``model`` (``kanvit/models/vit.py`` block construction)."""
    if model.type == "flash-attn":
        from kanvit.layers.attention import FlashAttentionBlock

        return FlashAttentionBlock(dim=model.d_hidden, heads=model.n_heads)
    from kanvit.layers.transformer import TransformerBlock

    return TransformerBlock(
        d_model=model.d_hidden,
        n_heads=model.n_heads,
        feedforward_dim=4 * model.d_hidden,
        attn_type=model.type,
        stateful_grid=model.stateful_grid,
    )


def _pp_forward(model, block, mesh, n_micro, pp_params, x, bf16: bool):
    if bf16:
        pp_params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p,
            pp_params,
        )
        x = x.astype(jnp.bfloat16)
    outer = {"params": pp_params["outer"]}
    tokens = model.apply(outer, x, method="embed")
    out = pipeline_blocks(
        lambda p, t: block.apply({"params": p}, t),
        pp_params["blocks"], tokens, mesh, n_micro,
    )
    return model.apply(outer, out, method="head").astype(jnp.float32)


def make_pp_train_step(model, mesh, n_micro, bf16=False, donate=True,
                       out_shardings=None):
    """``step(state, x, y) -> (state, loss, logits)`` over the pipeline
    layout (state.params = ``{"outer", "blocks"}``)."""
    block = make_block_module(model)

    def train_step(state, x, y):
        def loss_fn(p):
            logits = _pp_forward(model, block, mesh, n_micro, p, x, bf16)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads=grads), loss, logits

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(train_step, donate_argnums=(0,) if donate else (), **kw)


def make_pp_eval_step(model, mesh, n_micro, bf16=False, out_shardings=None,
                      per_example: bool = False):
    block = make_block_module(model)

    def eval_step(state, x, y):
        logits = _pp_forward(
            model, block, mesh, n_micro, state.params, x, bf16
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return (loss if per_example else loss.mean()), logits

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(eval_step, **kw)


def create_pp_state(model, rng, sample_input, learning_rate: float = 1e-3):
    """A TrainState whose params (and Adam moments) live in the pipeline
    layout. ``apply_fn`` stays the model's (unused by the PP steps)."""
    if model.stateful_grid:
        raise NotImplementedError(
            "pipeline parallelism with stateful B-spline grids: the grid "
            "refit step operates on the canonical layout"
        )
    from kanvit.train.state import TrainState, make_optimizer

    params = model.init(rng, sample_input)["params"]
    pp = split_params(params, model.n_blocks)
    # Same factory as create_train_state (sans the grid-grad chain, which
    # PP rejects above) so the PP<->canonical opt_state conversion in
    # checkpoint restore can never drift from the canonical update rule.
    tx = make_optimizer(learning_rate)
    return TrainState.create(apply_fn=model.apply, params=pp, tx=tx)
