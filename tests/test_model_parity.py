"""End-to-end logit parity: kanvit models with imported reference weights.

The strictest gate (SURVEY §4.1): load the executed reference's state_dict
through ``kanvit.utils.torch_compat`` and require logits within 1e-3
(BASELINE.json target; typically ~1e-5 observed at f32 on CPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conftest import load_golden
from kanvit.models import create_model
from kanvit.utils.torch_compat import params_from_torch_state_dict

VARIANTS = ["vanilla", "efficientkan", "fast", "sine", "flash-attn"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_model_logit_parity(variant):
    g, sd = load_golden(f"model_{variant}")
    model = create_model(
        variant, chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=64, n_heads=2, out_d=10,
    )
    params = params_from_torch_state_dict(sd)
    logits = model.apply({"params": params}, jnp.asarray(g["x"]))
    err = np.abs(np.asarray(logits) - g["y"]).max()
    assert err < 1e-3, f"{variant} logit err {err}"


@pytest.mark.parametrize(
    "variant", ["vanilla", "efficientkan", "fast", "sine", "cheby", "fourier"]
)
def test_msa_parity(variant):
    """MSA-level parity incl. the fourier-uses-Linear dispatch quirk
    (reference attention.py:136-142)."""
    import flax.linen as nn

    from kanvit.layers.attention import MSA

    g, sd = load_golden(f"msa_{variant}")
    msa = MSA(16, n_heads=2, type=variant)
    params = params_from_torch_state_dict(
        {f"blocks.0.attn.{k}": v for k, v in sd.items()}
    )["blocks_0"]["attn"]
    out = msa.apply({"params": params}, jnp.asarray(g["x"]))
    err = np.abs(np.asarray(out) - g["y"]).max()
    assert err < 1e-4, f"msa {variant} err {err}"


@pytest.mark.slow
def test_all_seven_variants_train_construct():
    """The cheby and fourier ViT variants crash in the reference
    (SURVEY §2.9.1-2); kanvit must construct and run all seven."""
    import jax

    for vt in ["vanilla", "efficientkan", "fast", "sine", "fourier", "cheby",
               "flash-attn"]:
        m = create_model(vt, chw=(1, 28, 28), n_patches=7, n_blocks=1,
                         d_hidden=32, n_heads=2, out_d=10)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 1, 28, 28)))["params"]
        logits = m.apply({"params": params}, jnp.zeros((2, 1, 28, 28)))
        assert logits.shape == (2, 10)
        assert bool(jnp.isfinite(logits).all())


def test_unknown_variant_raises():
    with pytest.raises(ValueError, match="Unknown transformer type"):
        m = create_model("bogus")
        import jax

        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))


@pytest.mark.slow
def test_remat_matches_no_remat():
    """Rematerialized blocks must produce identical logits and grads."""
    import jax
    import optax

    m1 = create_model("vanilla", chw=(1, 28, 28), n_patches=7, n_blocks=2,
                      d_hidden=32, n_heads=2, out_d=10)
    m2 = create_model("vanilla", chw=(1, 28, 28), n_patches=7, n_blocks=2,
                      d_hidden=32, n_heads=2, out_d=10, remat=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 28, 28))
    y = jnp.zeros(4, jnp.int32)
    params = m1.init(jax.random.PRNGKey(0), x)["params"]

    def loss(m, p):
        logits = m.apply({"params": p}, x)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(params)
    assert np.allclose(float(l1), float(l2), atol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert np.abs(np.asarray(a - b)).max() < 1e-5


def test_sinekan_amp_init_broadcast_structure():
    """The reference draws amplitudes as (out, in, 1) and broadcasts the
    SAME sample across the grid axis before the per-harmonic norm division
    (sinekan.py:49-57) — so amp * grid_norm must be constant along grid."""
    import jax

    from kanvit.layers.kan import SineKANLayer

    layer = SineKANLayer(input_dim=16, output_dim=8, grid_size=5)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))["params"]
    amp = np.asarray(params["amplitudes"])  # (out, in, grid)
    grid_norm = np.arange(1, 6, dtype=np.float32)
    unscaled = amp * grid_norm  # undo the per-harmonic division
    assert np.allclose(unscaled, unscaled[..., :1], atol=1e-6)
    # and the samples are not degenerate
    assert np.std(unscaled[..., 0]) > 0.01
