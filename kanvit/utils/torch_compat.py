"""Import reference (PyTorch) checkpoints into kanvit param pytrees.

Users switching from the reference can load a ``VisionTransformer``
state_dict (reference ``model.py:49``) directly: weight layouts are already
torch-convention throughout kanvit, so the mapping is pure renaming plus
stacking the reference's per-head ``ModuleList`` projections
(``attention.py:137-170``) into kanvit's ``(n_heads, ...)`` vmapped params.

Accepts ``{name: np.ndarray}`` dicts (e.g. ``torch.save``d state_dicts read
via ``numpy``, or an ``.npz``) — no torch dependency at load time.

Skipped reference entries (non-trainable buffers kanvit derives
deterministically): ``*.grid`` (B-spline knots / RBF centers), ``*.phase``
(SineKAN), ``*.arange`` (ChebyKAN), ``pos_embeddings``.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np

_SKIP = re.compile(r".*(\.grid|\.phase|\.arange|pos_embeddings)$")

# torch layer-local name -> kanvit param name (identity if absent)
_LEAF_RENAMES = {
    "layernorm.weight": "ln_weight",
    "layernorm.bias": "ln_bias",
    "spline_linear.weight": "spline_weight",
    "base_linear.weight": "base_weight",
    "base_linear.bias": "base_bias",
}


def _set(tree: dict, path: list, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _reshape_leaf(name: str, arr: np.ndarray) -> np.ndarray:
    if name == "freq":  # (1,1,1,g) -> (g,)
        return arr.reshape(-1)
    if name == "bias" and arr.ndim == 2 and arr.shape[0] == 1:  # (1,out) -> (out,)
        return arr.reshape(-1)
    return arr


def params_from_torch_state_dict(
    state_dict: Mapping[str, np.ndarray],
) -> Dict:
    """Convert a reference ``VisionTransformer.state_dict()`` into a kanvit
    ``params`` dict (pass as ``{"params": result}`` to ``model.apply``)."""
    params: Dict = {}
    # Collect per-head projections for stacking: {(block, proj): {head: {leaf: arr}}}
    heads: Dict = {}

    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        if _SKIP.fullmatch(key):
            continue

        m = re.fullmatch(
            r"blocks\.(\d+)\.attn\.([qkv]_mappings)\.(\d+)\.(.+)", key
        )
        if m:
            blk, proj, head, leaf = m.groups()
            leaf = _LEAF_RENAMES.get(leaf, leaf)
            heads.setdefault((blk, proj), {}).setdefault(int(head), {})[leaf] = arr
            continue

        if key == "v_class":
            _set(params, ["v_class"], arr)
            continue

        m = re.fullmatch(r"linear_mapper\.(.+)", key)
        if m:
            leaf = _LEAF_RENAMES.get(m.group(1), m.group(1))
            _set(params, ["linear_mapper", leaf], _reshape_leaf(leaf, arr))
            continue

        m = re.fullmatch(r"mlp_head\.0\.(weight|bias)", key)
        if m:  # LayerNorm -> flax names
            leaf = "scale" if m.group(1) == "weight" else "bias"
            _set(params, ["head_norm", leaf], arr)
            continue
        m = re.fullmatch(r"mlp_head\.1\.(weight|bias)", key)
        if m:
            _set(params, ["head_linear", m.group(1)], arr)
            continue

        m = re.fullmatch(r"blocks\.(\d+)\.(norm1|norm2)\.(weight|bias)", key)
        if m:
            blk, norm, leaf = m.groups()
            leaf = "scale" if leaf == "weight" else "bias"
            _set(params, [f"blocks_{blk}", norm, leaf], arr)
            continue

        m = re.fullmatch(r"blocks\.(\d+)\.ff\.([02])\.(weight|bias)", key)
        if m:
            blk, idx, leaf = m.groups()
            _set(params, [f"blocks_{blk}", f"ff_{idx}", leaf], arr)
            continue

        m = re.fullmatch(r"blocks\.(\d+)\.(to_q|to_kv|to_out)\.(weight|bias)", key)
        if m:  # flash-attn variant: raw blocks named blocks_N at top level
            blk, proj, leaf = m.groups()
            _set(params, [f"blocks_{blk}", proj, leaf], arr)
            continue

        raise ValueError(f"Unrecognized reference param: {key}")

    for (blk, proj), per_head in heads.items():
        n_heads = max(per_head) + 1
        leaves = per_head[0].keys()
        for leaf in leaves:
            stacked = np.stack(
                [_reshape_leaf(leaf, per_head[h][leaf]) for h in range(n_heads)]
            )
            _set(params, [f"blocks_{blk}", "attn", proj, leaf], stacked)

    return params
