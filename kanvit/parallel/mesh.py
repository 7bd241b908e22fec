"""Device mesh + sharding rules: DP over a ``data`` axis, TP over ``model``.

The reference has no working parallelism — only a constructed-but-unused
``torch.nn.DataParallel`` and a manual ``cuda:i`` scatter that corrupts q
(reference ``attention.py:56-57,91-97``, SURVEY §2.10). The TPU-native
replacement: a ``jax.sharding.Mesh`` over all chips, the batch sharded on
``data`` (gradient all-reduce rides ICI via XLA-inserted collectives), and
parameters optionally sharded on ``model``:

- per-head q/k/v projection stacks ``(n_heads, ...)``: heads split across
  ``model`` (head-parallel attention — the math is per-head until concat)
- feed-forward: ``ff_0 (4d, d)`` row-sharded / ``ff_2 (d, 4d)``
  column-sharded (Megatron-style pair, one all-reduce per block)
- flash-attention ``to_q``/``to_kv`` row-sharded, ``to_out`` column-sharded

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``;
the same code then lays DP across hosts over DCN. Tests simulate 8 devices
with ``--xla_force_host_platform_device_count=8`` on CPU (SURVEY §4.5).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (param-path regex, PartitionSpec) — first match wins; default replicated.
# Param paths look like "blocks_0/attn/q_mappings/weight".
TP_RULES: Sequence[tuple[str, P]] = (
    (r".*/(q|k|v)_mappings/.*", P("model")),  # head-stacked: axis 0 = heads
    (r".*/ff_0/(weight|bias)", P("model")),  # (4d, d) rows + (4d,) bias
    (r".*/ff_2/weight", P(None, "model")),  # (d, 4d) columns
    (r".*/to_q/weight", P("model")),  # (inner, dim) rows
    (r".*/to_kv/weight", P("model")),
    (r".*/to_out/weight", P(None, "model")),  # (dim, inner) columns
)


def create_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    n_pipe: int = 1,
    devices=None,
) -> Mesh:
    """``(data, model, pipe)`` mesh. Defaults to pure DP over all devices.

    ``model`` shards attention heads / the FF pair (TP rules above);
    ``pipe`` shards transformer-block stages for the microbatch pipeline
    (``kanvit.parallel.pipeline``). Size-1 axes are free: every consumer
    reads ``mesh.shape.get(axis, 1)``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_pipe)
    if n_data * n_model * n_pipe != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model}x{n_pipe} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model, n_pipe)
    return Mesh(arr, axis_names=("data", "model", "pipe"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading dim split across ``data``."""
    return NamedSharding(mesh, P("data"))


def _spec_for(path: str, rules) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def param_shardings(params, mesh: Mesh, rules=TP_RULES):
    """Pytree of NamedShardings for a param tree. Params matching no rule
    (or not divisible by the mesh axis) are replicated."""
    n_model = mesh.shape["model"]

    def to_sharding(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = P()
        if n_model > 1:
            spec = _spec_for(path_str, rules)
            # Fall back to replication when the axis doesn't divide the dim.
            for i, axis in enumerate(tuple(spec)):
                if axis is not None and (
                    i >= leaf.ndim or leaf.shape[i] % n_model != 0
                ):
                    spec = P()
                    break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_state(state, mesh: Mesh, rules=TP_RULES, p_shard=None):
    """Place a TrainState on the mesh: params/opt-state sharded per rules,
    scalars replicated. ``p_shard`` overrides the rule-derived param
    shardings with a precomputed pytree (the pipeline-parallel layout)."""
    import optax

    if p_shard is None:
        p_shard = param_shardings(state.params, mesh, rules)
    replicated = NamedSharding(mesh, P())

    def like_params(tree):
        # Adam mu/nu mirror the param tree structure.
        return jax.tree.map(lambda s, x: jax.device_put(x, s), p_shard, tree)

    from kanvit.train.state import EmaState

    def place_opt(node):
        if isinstance(node, optax.ScaleByAdamState):
            return node._replace(
                count=jax.device_put(node.count, replicated),
                mu=like_params(node.mu),
                nu=like_params(node.nu),
            )
        if isinstance(node, EmaState):
            # The EMA shadow mirrors the param tree: same shardings.
            return EmaState(ema=like_params(node.ema))
        return jax.tree.map(lambda x: jax.device_put(x, replicated), node)

    new_opt = jax.tree.map(
        place_opt,
        state.opt_state,
        is_leaf=lambda x: isinstance(
            x, (optax.ScaleByAdamState, optax.EmptyState, EmaState)
        ),
    )
    return state.replace(
        params=like_params(state.params),
        opt_state=new_opt,
        step=jax.device_put(state.step, replicated),
    )
