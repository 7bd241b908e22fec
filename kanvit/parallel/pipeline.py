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

Composition: PP composes with DP (batch on ``data``, stages on ``pipe``)
and — for the six TransformerBlock variants — with TP over ``model``: the
SPMD partitioner cannot see through a shard_map, so the stage body inserts
the TP collectives BY HAND (``_tp_block_fwd``). The variant MSA is
per-head-lane local (head h maps ``x[..., h*dh:(h+1)*dh]``, no output
projection — SURVEY §2.9.4), so head-parallel attention needs one lane
``all_gather``; the FF pair is the Megatron split (ff_0 row-sharded,
ff_2 column-sharded, one ``psum``). Replicated leaves (norms, ff_2 bias)
ride shard_map's unmentioned-axis transpose: each shard's cotangent is a
genuine partial, so the automatic psum over ``model`` reconstructs the
exact gradient. flash-attn blocks are excluded (its fused ``to_kv``
row-shards into a k-half and a v-half — no local attention is possible);
PP alone still covers them.

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
    """Apply ``conv`` to every params-shaped tree inside an optax state:
    the Adam ``mu``/``nu`` moments and the EMA shadow params
    (``train.state.EmaState``). Everything else (schedule counts, stateless
    EmptyStates) is layout-independent and passes through untouched."""
    from kanvit.train.state import EmaState

    def rec(o):
        if isinstance(o, optax.ScaleByAdamState):
            return o._replace(mu=conv(o.mu), nu=conv(o.nu))
        if isinstance(o, EmaState):
            return EmaState(ema=conv(o.ema))
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


def pp_block_specs(stacked, mesh: Mesh):
    """PartitionSpec tree for the stacked block params: leading block axis
    over ``pipe``; under PP x TP the attention head axes and FF pair
    additionally shard over ``model`` (the canonical TP_RULES shifted one
    axis right by the block stacking). One function feeds BOTH the at-rest
    shardings and the pipeline shard_map's in_specs, so they cannot
    disagree."""
    import re

    from kanvit.parallel.mesh import TP_RULES

    n_pipe = mesh.shape.get("pipe", 1)
    n_model = mesh.shape.get("model", 1)

    def one(path, leaf):
        p0 = "pipe" if n_pipe > 1 and leaf.shape[0] % n_pipe == 0 else None
        rest = ()
        if n_model > 1:
            keys = "blocks/" + "/".join(
                str(getattr(k, "key", k)) for k in path
            )
            for pat, s in TP_RULES:
                if re.fullmatch(pat, keys):
                    rest = tuple(s)
                    break
            for i, ax in enumerate(rest):
                if ax is not None and leaf.shape[i + 1] % n_model:
                    raise ValueError(
                        f"PP x TP: {keys} axis {i + 1} ({leaf.shape}) not "
                        f"divisible by model={n_model}"
                    )
        return P(p0, *rest)

    return jax.tree_util.tree_map_with_path(one, stacked)


def pp_param_shardings(pp_params, mesh: Mesh):
    """Shardings for the pipeline layout: ``blocks`` leaves per
    ``pp_block_specs``; ``outer`` follows the TP rules (in practice
    replicated — no rule matches the mapper/head)."""
    outer = param_shardings(pp_params["outer"], mesh)
    specs = pp_block_specs(pp_params["blocks"], mesh)
    return {
        "outer": outer,
        "blocks": jax.tree.map(lambda s: NamedSharding(mesh, s), specs),
    }


# ---------------------------------------------------------------------------
# PP x TP: manual tensor-parallel stage body
# ---------------------------------------------------------------------------

def pp_tp_reason(model_type: str, n_heads: int, d_hidden: int,
                 n_model: int) -> str | None:
    """None when PP x TP is supported for this geometry, else why not."""
    if n_model <= 1:
        return None
    if model_type == "flash-attn":
        return (
            "flash-attn blocks cannot ride the manual PP x TP stage body: "
            "row-sharding the fused to_kv weight splits it into a k-half "
            "and a v-half, so no shard can attend locally (use PP x DP)"
        )
    if n_heads % n_model:
        return f"n_heads={n_heads} not divisible by n_model={n_model}"
    if (4 * d_hidden) % n_model:
        return (
            f"feed-forward dim {4 * d_hidden} not divisible by "
            f"n_model={n_model}"
        )
    return None


def _ln(x, p, eps: float = 1e-5):
    """LayerNorm in flax's fast-variance form (matches TransformerBlock's
    ``nn.LayerNorm(epsilon=1e-5)``) — replicated compute on every model
    shard."""
    mu = x.mean(-1, keepdims=True)
    var = jnp.maximum((x * x).mean(-1, keepdims=True) - mu * mu, 0.0)
    return (x - mu) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _tp_block_fwd(model, n_model: int, model_axis: str = "model"):
    """One TransformerBlock forward per model shard, TP collectives by hand.

    The variant MSA has no output projection and head h reads only lanes
    ``h*dh:(h+1)*dh`` (reference ``model.py:14-37`` + SURVEY §2.9.4), so
    each shard slices its head lanes, runs the full local qkv/attention
    cascade (``_fused_attend_local`` — the same body ``_msa_sharded`` uses
    outside the pipeline), and one tiled ``all_gather`` reassembles the
    lane-concat MSA output. The FF pair is Megatron-split: ff_0 rows +
    bias local, ff_2 columns local, ``psum`` over ``model`` completes the
    contraction; ff_2's bias and both norms stay replicated (their partial
    cotangents are summed by shard_map's unmentioned-axis transpose)."""
    d = model.d_hidden
    d_head = d // model.n_heads
    hl = model.n_heads // n_model
    kind = model.type

    def fwd(p, x):
        from kanvit.layers.attention import _fused_attend_local

        i = lax.axis_index(model_axis)
        h = _ln(x, p["norm1"])
        xs = lax.dynamic_slice_in_dim(
            h, i * hl * d_head, hl * d_head, axis=2
        )
        a = _fused_attend_local(
            xs, p["attn"]["q_mappings"], p["attn"]["k_mappings"],
            p["attn"]["v_mappings"], kind=kind, d_head=d_head, n_heads=hl,
        )
        a = lax.all_gather(a, model_axis, axis=2, tiled=True)
        x = x + a.astype(x.dtype)
        h2 = _ln(x, p["norm2"])
        hh = jax.nn.relu(h2 @ p["ff_0"]["weight"].T + p["ff_0"]["bias"])
        y = lax.psum(hh @ p["ff_2"]["weight"].T, model_axis)
        return x + y + p["ff_2"]["bias"]

    return fwd


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
    model_axis: str = "model",
    remat: bool = True,
    tp_fwd=None,
):
    """Run ``tokens (B, T, D)`` through the stacked block params, pipelined
    over ``pipe_axis`` with ``n_micro`` microbatches. With no mesh (or a
    1-device pipe axis) this is a plain ``lax.scan`` over blocks.

    When the mesh's ``model`` axis exceeds 1 the caller must supply
    ``tp_fwd`` (``_tp_block_fwd``): the per-shard block forward with manual
    TP collectives, and the stacked params enter the shard_map sharded per
    ``pp_block_specs`` (heads/FF over ``model``)."""
    n_blocks = jax.tree.leaves(stacked)[0].shape[0]
    n_stages = mesh.shape.get(pipe_axis, 1) if mesh is not None else 1
    n_model = mesh.shape.get(model_axis, 1) if mesh is not None else 1
    if n_stages > 1 and n_model > 1 and tp_fwd is None:
        raise ValueError(
            "pipeline: mesh has a model axis > 1 — pass the manual-TP "
            "stage body (tp_fwd; see _tp_block_fwd / pp_tp_reason)"
        )
    apply_one = tp_fwd if (n_stages > 1 and n_model > 1) else block_apply

    def stage_fn(p_stack, x):
        def body(c, p):
            return apply_one(p, c), None

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

    block_specs = (
        pp_block_specs(stacked, mesh) if n_model > 1
        else jax.tree.map(lambda _: P(pipe_axis), stacked)
    )
    out = shard_map(
        local,
        mesh=mesh,
        in_specs=(block_specs, P(None, data_axis)),
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


def _pp_forward(model, block, mesh, n_micro, pp_params, x, bf16: bool,
                tp_fwd=None):
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
        pp_params["blocks"], tokens, mesh, n_micro, tp_fwd=tp_fwd,
    )
    return model.apply(outer, out, method="head").astype(jnp.float32)


def _pp_tp_fwd_or_raise(model, mesh):
    nm = mesh.shape.get("model", 1)
    if nm <= 1:
        return None
    reason = pp_tp_reason(model.type, model.n_heads, model.d_hidden, nm)
    if reason:
        raise ValueError(f"PP x TP unsupported: {reason}")
    return _tp_block_fwd(model, nm)


def make_pp_train_step(model, mesh, n_micro, bf16=False, donate=True,
                       out_shardings=None):
    """``step(state, x, y) -> (state, loss, logits)`` over the pipeline
    layout (state.params = ``{"outer", "blocks"}``)."""
    block = make_block_module(model)
    tp_fwd = _pp_tp_fwd_or_raise(model, mesh)

    def train_step(state, x, y):
        def loss_fn(p):
            logits = _pp_forward(model, block, mesh, n_micro, p, x, bf16,
                                 tp_fwd)
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
    tp_fwd = _pp_tp_fwd_or_raise(model, mesh)

    def eval_step(state, x, y):
        logits = _pp_forward(
            model, block, mesh, n_micro, state.params, x, bf16, tp_fwd
        )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        return (loss if per_example else loss.mean()), logits

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(eval_step, **kw)


def create_pp_state(model, rng, sample_input, learning_rate: float = 1e-3,
                    lr_schedule: str = "constant", warmup_steps: int = 0,
                    total_steps: int | None = None,
                    weight_decay: float = 0.0, clip_grad_norm: float = 0.0,
                    ema_decay: float = 0.0):
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
    # Schedule state (a count scalar) is layout-independent:
    # _map_moment_trees passes it through untouched.
    tx = make_optimizer(learning_rate, lr_schedule, warmup_steps, total_steps,
                        weight_decay, clip_grad_norm, ema_decay)
    return TrainState.create(apply_fn=model.apply, params=pp, tx=tx)
