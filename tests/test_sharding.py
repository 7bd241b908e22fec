"""Multi-device sharding on the simulated 8-CPU mesh (SURVEY §2.10, §4.5).

DP: batch sharded over the ``data`` axis, gradients all-reduced by XLA.
TP: head-parallel attention + Megatron-style FF pair over ``model``.
Both must produce the same math as single-device execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanvit.models import create_model
from kanvit.parallel.mesh import batch_sharding, create_mesh, param_shardings, shard_state
from kanvit.train.state import create_train_state
from kanvit.train.steps import make_train_step


def _setup(model_type="vanilla"):
    model = create_model(
        model_type, chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=32, n_heads=4, out_d=10,
    )
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 1, 28, 28))
    y = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)
    return state, x, y


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_matches_single_device():
    state, x, y = _setup()
    step = make_train_step(donate=False)
    _, loss_single, _ = step(state, x, y)

    mesh = create_mesh()  # (8, 1)
    sstate = shard_state(state, mesh)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    new_state, loss_dp, logits = step(sstate, sx, sy)
    assert np.allclose(float(loss_single), float(loss_dp), atol=1e-5)
    assert bool(jnp.isfinite(logits).all())


def test_tp_train_step_runs_and_matches():
    state, x, y = _setup()
    step = make_train_step(donate=False)
    _, loss_single, _ = step(state, x, y)

    mesh = create_mesh(n_model=2)  # (4, 2)
    # verify at least one param actually gets a model-sharded spec
    shardings = param_shardings(state.params, mesh)
    specs = [s.spec for s in jax.tree.leaves(shardings)]
    assert any("model" in str(s) for s in specs)

    sstate = shard_state(state, mesh)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    _, loss_tp, _ = step(sstate, sx, sy)
    assert np.allclose(float(loss_single), float(loss_tp), atol=1e-5)


def test_tp_with_kan_projections():
    state, x, y = _setup("efficientkan")
    mesh = create_mesh(n_model=2)
    sstate = shard_state(state, mesh)
    step = make_train_step(donate=False)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    _, loss, _ = step(sstate, sx, sy)
    assert np.isfinite(float(loss))
