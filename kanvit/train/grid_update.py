"""Periodic adaptive-grid refit for B-spline KAN layers during training.

The reference defines ``KANLinear.update_grid`` (``effkan.py:189-242``) but
never calls it; kanvit makes it a working training capability
(``--update-grid-every N``). The functional math lives in
``kanvit.ops.kan_bases.bspline_update_grid`` (golden-tested against the
executed reference); this module wires it to live training state:

1. Build the model with ``stateful_grid=True`` — every ``KANLinear`` keeps
   its knot grid in the param tree (masked out of the optimizer by
   ``create_train_state``).
2. ``make_update_grid_step(apply_fn)`` returns a jitted
   ``update(state, x) -> state`` that runs one forward pass with the
   ``kan_inputs`` collection mutable (each ``KANLinear`` sows its flattened
   input batch), then refits ``(grid, spline_weight)`` per layer — vmapped
   across the per-head stacked attention projections.
"""

from __future__ import annotations

import jax
from flax.traverse_util import flatten_dict, unflatten_dict

from kanvit.ops import kan_bases as K


def _refit(xin, grid, sw, sc):
    """One layer's refit; derives grid_size/spline_order from shapes."""
    spline_order = grid.shape[-1] - sw.shape[-1] - 1
    grid_size = sw.shape[-1] - spline_order
    new_grid, new_coeff = K.bspline_update_grid(
        xin, grid, sw, sc, grid_size, spline_order
    )
    return new_grid, new_coeff


def make_update_grid_step(apply_fn, out_shardings=None, donate: bool = True):
    """``update(state, x) -> state`` with refreshed grids + spline weights.

    ``out_shardings`` should be the same state-sharding tree pinned on the
    train step so the AOT-compiled step keeps accepting the updated state.
    """

    def update(state, x):
        _, mut = apply_fn(
            {"params": state.params}, x, mutable=["kan_inputs"]
        )
        inputs = flatten_dict(mut["kan_inputs"])
        flat = flatten_dict(state.params)
        for path, sown in inputs.items():
            xin = sown[0] if isinstance(sown, tuple) else sown
            mpath = path[:-1]
            gkey = mpath + ("grid",)
            if gkey not in flat:
                continue  # layer built without stateful_grid
            grid = flat[gkey]
            sw = flat[mpath + ("spline_weight",)]
            sc = flat.get(mpath + ("spline_scaler",))
            if grid.ndim == 2:
                new_grid, new_sw = _refit(xin, grid, sw, sc)
            else:  # head-stacked (H, ...) from the vmapped MSA projections
                if sc is None:
                    new_grid, new_sw = jax.vmap(
                        lambda a, b, c: _refit(a, b, c, None)
                    )(xin, grid, sw)
                else:
                    new_grid, new_sw = jax.vmap(_refit)(xin, grid, sw, sc)
            flat[gkey] = new_grid.astype(grid.dtype)
            flat[mpath + ("spline_weight",)] = new_sw.astype(sw.dtype)
        return state.replace(params=unflatten_dict(flat))

    kw = {}
    if out_shardings is not None:
        kw["out_shardings"] = out_shardings
    return jax.jit(update, donate_argnums=(0,) if donate else (), **kw)
