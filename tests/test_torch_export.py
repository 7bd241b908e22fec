"""Export round trip: kanvit params -> reference torch state_dict.

The goldens under tests/goldens/model_*.npz are EXECUTED reference
state_dicts (tools/make_goldens.py), so `import -> export` must reproduce
them key-for-key and byte-for-byte on every trainable parameter — the
skipped constructor-derived buffers (grid/phase/arange/pos_embeddings,
torch_compat._SKIP) are the only keys allowed to differ."""

import numpy as np
import pytest

from conftest import load_golden
from kanvit.utils.torch_compat import (
    _SKIP,
    params_from_torch_state_dict,
    torch_state_dict_from_params,
)

VARIANTS = ["vanilla", "efficientkan", "fast", "sine", "flash-attn"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_export_roundtrips_reference_state_dict(variant):
    _, sd = load_golden(f"model_{variant}")
    out = torch_state_dict_from_params(params_from_torch_state_dict(sd))
    want = {k: v for k, v in sd.items() if not _SKIP.fullmatch(k)}
    assert set(out) == set(want), (
        f"key mismatch: missing={sorted(set(want) - set(out))[:5]} "
        f"extra={sorted(set(out) - set(want))[:5]}"
    )
    for k in want:
        assert out[k].shape == want[k].shape, (
            f"{k}: shape {out[k].shape} != reference {want[k].shape}"
        )
        np.testing.assert_array_equal(out[k], want[k], err_msg=k)


def test_export_fresh_init_loads_into_reference_namespace():
    """A kanvit-initialized model (no torch provenance) must export a
    state_dict whose keys/shapes a reference constructor would accept —
    i.e. import(export(params)) is the identity on the kanvit side too."""
    import jax
    import jax.numpy as jnp

    from kanvit.models import create_model

    model = create_model(
        "sine", chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=64, n_heads=2, out_d=10,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28)))[
        "params"
    ]
    sd = torch_state_dict_from_params(jax.tree.map(np.asarray, params))
    back = params_from_torch_state_dict(sd)
    flat0 = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(params)
    }
    flat1 = {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(back)
    }
    assert set(flat0) == set(flat1)
    for k in flat0:
        np.testing.assert_array_equal(flat0[k], flat1[k], err_msg=k)
