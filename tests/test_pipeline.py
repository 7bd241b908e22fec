"""Pipeline parallelism on the simulated 8-CPU mesh (SURVEY §2.10).

The SPMD microbatch pipeline (``kanvit.parallel.pipeline``) must be
value-equal to single-device execution: same logits, same loss, same
updated params after one optimizer step. The reference has no PP at all
(SURVEY §2.10 table) — these tests pin kanvit's extension.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanvit.models import create_model
from kanvit.parallel.mesh import batch_sharding, create_mesh, shard_state
from kanvit.parallel.pipeline import (
    create_pp_state,
    make_pp_eval_step,
    make_pp_train_step,
    merge_params,
    pp_param_shardings,
    split_params,
)
from kanvit.train.state import create_train_state
from kanvit.train.steps import make_train_step


def _model(model_type="vanilla", n_blocks=4):
    return create_model(
        model_type, chw=(1, 28, 28), n_patches=7, n_blocks=n_blocks,
        d_hidden=32, n_heads=4, out_d=10,
    )


def _data(batch=16):
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 1, 28, 28))
    y = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 10)
    return x, y


def _pp_setup(model, mesh, lr=1e-3):
    state = create_pp_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28)), lr
    )
    return shard_state(
        state, mesh, p_shard=pp_param_shardings(state.params, mesh)
    )


def test_split_merge_roundtrip():
    model = _model(n_blocks=3)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28)))[
        "params"
    ]
    pp = split_params(params, 3)
    back = merge_params(pp, 3)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, back,
    )


@pytest.mark.parametrize(
    "n_pipe,n_micro",
    [
        (4, 4),
        pytest.param(2, 2, marks=pytest.mark.slow),
        pytest.param(4, 8, marks=pytest.mark.slow),
    ],
)
def test_pp_train_step_matches_single_device(n_pipe, n_micro):
    """One PP train step == one single-device step: loss, logits, and the
    raw GRADIENTS all match. Gradients (not Adam-updated params) are the
    rigorous check: Adam's g/sqrt(nu) normalization is nearly invariant to
    a uniform gradient scale — the exact signature of a collective-
    transpose bug — while amplifying benign f32 reduction-order noise."""
    import optax

    from kanvit.parallel.pipeline import make_block_module, _pp_forward

    model = _model(n_blocks=4)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
    x, y = _data()
    _, ref_loss, ref_logits = make_train_step(donate=False)(state, x, y)

    def ref_loss_fn(p):
        logits = model.apply({"params": p}, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()

    ref_grads = jax.jit(jax.grad(ref_loss_fn))(state.params)

    mesh = create_mesh(n_pipe=n_pipe)  # (8/n_pipe, 1, n_pipe)
    pstate = _pp_setup(model, mesh)
    step = make_pp_train_step(model, mesh, n_micro, donate=False)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    _, loss, logits = step(pstate, sx, sy)

    assert np.allclose(float(ref_loss), float(loss), atol=1e-5)
    assert np.allclose(
        np.asarray(ref_logits), np.asarray(logits), atol=1e-4
    )

    block = make_block_module(model)

    def pp_loss_fn(p):
        logits = _pp_forward(model, block, mesh, n_micro, p, sx, False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, sy
        ).mean()

    pp_grads = merge_params(
        jax.device_get(jax.jit(jax.grad(pp_loss_fn))(pstate.params)), 4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        ),
        jax.device_get(ref_grads), pp_grads,
    )


@pytest.mark.parametrize(
    "kind",
    ["efficientkan", pytest.param("flash-attn", marks=pytest.mark.slow)],
)
def test_pp_variant_forward_parity(kind):
    """KAN-projection blocks and the raw flash-attn block stack both run
    through the pipeline with single-device logits."""
    model = _model(kind, n_blocks=2)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
    x, y = _data(8)
    ref_logits = jax.jit(
        lambda p, xx: model.apply({"params": p}, xx)
    )(state.params, x)

    mesh = create_mesh(n_pipe=2)  # (4, 1, 2)
    pstate = _pp_setup(model, mesh)
    eval_step = make_pp_eval_step(model, mesh, n_micro=2)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    _, logits = eval_step(pstate, sx, sy)
    assert np.allclose(
        np.asarray(ref_logits), np.asarray(logits), atol=1e-4
    )


def test_pp_composes_with_dp():
    """(2, 1, 4) mesh: DP over data x PP over pipe, loss matches."""
    model = _model(n_blocks=4)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
    x, y = _data()
    _, ref_loss, _ = make_train_step(donate=False)(state, x, y)

    mesh = create_mesh(n_data=2, n_pipe=4)
    pstate = _pp_setup(model, mesh)
    step = make_pp_train_step(model, mesh, n_micro=4, donate=False)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    _, loss, _ = step(pstate, sx, sy)
    assert np.allclose(float(ref_loss), float(loss), atol=1e-5)


def test_pp_stage_params_actually_sharded():
    mesh = create_mesh(n_pipe=4)
    model = _model(n_blocks=4)
    pstate = _pp_setup(model, mesh)
    leaf = jax.tree.leaves(pstate.params["blocks"])[0]
    assert "pipe" in str(leaf.sharding.spec)
    # Each device holds 1 of the 4 stacked blocks.
    shard = leaf.addressable_shards[0]
    assert shard.data.shape[0] == 1


@pytest.mark.slow  # interpret-mode kernels inside the pipeline: ~40s
def test_pp_forced_pallas_parity():
    """KANVIT_IMPL=pallas under the PP mesh: stage bodies run inside the
    pipeline shard_map with ``runtime.local_region`` active, so kernel
    entries launch bare per-device pallas_calls on local shards — the
    code path a real pipe-sharded TPU mesh runs. Values and grads must
    match the unsharded jnp ground truth (the TP analogue is
    test_sharding.py::test_msa_sharded_forced_pallas_parity)."""
    from kanvit.ops import dispatch
    from kanvit.parallel.pipeline import make_block_module, _pp_forward

    model = _model("efficientkan", n_blocks=2)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
    x, y = _data(8)

    prev = dispatch.get_impl()
    try:
        import optax

        dispatch.set_impl("jnp")
        ref_logits = jax.jit(
            lambda p, xx: model.apply({"params": p}, xx)
        )(state.params, x)

        def ref_loss_fn(p):
            logits = model.apply({"params": p}, x)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        ref_grads = jax.jit(jax.grad(ref_loss_fn))(state.params)

        dispatch.set_impl("pallas")
        mesh = create_mesh(n_pipe=2)
        pstate = _pp_setup(model, mesh)
        block = make_block_module(model)
        sx = jax.device_put(x, batch_sharding(mesh))
        sy = jax.device_put(y, batch_sharding(mesh))

        def pp_loss_fn(p):
            logits = _pp_forward(model, block, mesh, 2, p, sx, False)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, sy
            ).mean()

        logits = jax.jit(
            lambda p: _pp_forward(model, block, mesh, 2, p, sx, False)
        )(pstate.params)
        assert np.abs(np.asarray(logits) - np.asarray(ref_logits)).max() < 1e-4
        pp_grads = merge_params(
            jax.device_get(jax.jit(jax.grad(pp_loss_fn))(pstate.params)), 2
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
            ),
            jax.device_get(ref_grads), pp_grads,
        )
    finally:
        dispatch.set_impl(prev)


def test_pp_state_canonical_roundtrip():
    """Checkpoints are saved canonical (ARCHITECTURE rule 6): converting a
    stepped PP state (nonzero Adam moments) to canonical and back must be
    exact, and the canonical view must structurally match a single-device
    state."""
    from kanvit.parallel.pipeline import (
        canonical_state_to_pp,
        pp_state_to_canonical,
    )

    model = _model(n_blocks=4)
    mesh = create_mesh(n_pipe=2)
    pstate = _pp_setup(model, mesh)
    x, y = _data()
    step = make_pp_train_step(model, mesh, n_micro=2, donate=False)
    pstate, _, _ = step(
        pstate,
        jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(y, batch_sharding(mesh)),
    )
    host = jax.device_get(pstate)

    canon = pp_state_to_canonical(host, 4)
    ref = create_train_state(model, jax.random.PRNGKey(0), jnp.zeros((1, 1, 28, 28)))
    assert jax.tree.structure(canon.params) == jax.tree.structure(ref.params)
    assert jax.tree.structure(canon.opt_state) == jax.tree.structure(
        jax.device_get(ref.opt_state)
    )

    back = canonical_state_to_pp(canon, 4)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        (host.params, host.opt_state), (back.params, back.opt_state),
    )


def test_pp_divisibility_errors():
    model = _model(n_blocks=3)
    mesh = create_mesh(n_pipe=2)
    pstate = _pp_setup(model, mesh)
    x, y = _data(8)
    step = make_pp_train_step(model, mesh, n_micro=2, donate=False)
    with pytest.raises(ValueError, match="not divisible"):
        step(pstate, jax.device_put(x, batch_sharding(mesh)),
             jax.device_put(y, batch_sharding(mesh)))


@pytest.mark.parametrize(
    "kind",
    ["vanilla", pytest.param("efficientkan", marks=pytest.mark.slow)],
)
def test_pp_tp_train_step_matches_single_device(kind):
    """PP x TP on a true 3-axis (2, 2, 2) data x model x pipe mesh: the
    manual TP collectives inside the pipeline stage body (lane all_gather
    after the per-head MSA, psum after the Megatron FF pair) must
    reproduce the single-device loss, logits, and raw gradients."""
    import optax

    from kanvit.parallel.pipeline import (
        _pp_forward, _pp_tp_fwd_or_raise, make_block_module,
    )

    model = _model(kind, n_blocks=4)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 1, 28, 28)))
    x, y = _data()
    _, ref_loss, ref_logits = make_train_step(donate=False)(state, x, y)

    def ref_loss_fn(p):
        logits = model.apply({"params": p}, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y
        ).mean()

    ref_grads = jax.jit(jax.grad(ref_loss_fn))(state.params)

    mesh = create_mesh(n_data=2, n_model=2, n_pipe=2)
    pstate = _pp_setup(model, mesh)
    step = make_pp_train_step(model, mesh, n_micro=2, donate=False)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    _, loss, logits = step(pstate, sx, sy)
    assert np.allclose(float(ref_loss), float(loss), atol=1e-5)
    assert np.allclose(np.asarray(ref_logits), np.asarray(logits), atol=1e-4)

    block = make_block_module(model)
    tp_fwd = _pp_tp_fwd_or_raise(model, mesh)

    def pp_loss_fn(p):
        logits = _pp_forward(model, block, mesh, 2, p, sx, False, tp_fwd)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, sy
        ).mean()

    pp_grads = merge_params(
        jax.device_get(jax.jit(jax.grad(pp_loss_fn))(pstate.params)), 4
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        ),
        jax.device_get(ref_grads), pp_grads,
    )


def test_pp_tp_flash_attn_rejected():
    model = _model("flash-attn", n_blocks=4)
    mesh = create_mesh(n_data=2, n_model=2, n_pipe=2)
    with pytest.raises(ValueError, match="flash-attn"):
        make_pp_train_step(model, mesh, n_micro=2, donate=False)
