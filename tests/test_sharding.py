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
from kanvit.parallel import runtime
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


@pytest.mark.parametrize(
    "kind", ["efficientkan", "fast", "sine", "fourier", "cheby"]
)
def test_tp_with_kan_projections(kind):
    """Every KAN param family (spline stacks, LN affines, freq/phase
    tables, coeff tensors) executes a sharded TP+DP train step."""
    state, x, y = _setup(kind)
    mesh = create_mesh(n_model=2)
    sstate = shard_state(state, mesh)
    step = make_train_step(donate=False)
    sx = jax.device_put(x, batch_sharding(mesh))
    sy = jax.device_put(y, batch_sharding(mesh))
    with runtime.mesh_active(mesh):
        _, loss, _ = step(sstate, sx, sy)
    assert np.isfinite(float(loss))


# --- Mesh-aware Pallas dispatch (kanvit.parallel.runtime) ---------------
#
# The SPMD partitioner cannot shard a Pallas custom call, so under an
# active mesh every kernel entry must run per-shard inside shard_map.
# These tests pin the rule: with the mesh activated, MSA's shard-mapped
# fused path (and the jnp fallbacks where it cannot engage) must be value-
# and grad-equal to the unsharded single-device math — on the jnp dispatch
# (fast) and with KANVIT_IMPL=pallas interpret-mode kernels (slow), which
# exercises the exact kernel code a real multi-chip TPU pod would launch.

MSA_TP_KINDS = ("vanilla", "efficientkan", "cheby", "fast", "sine", "fourier")


def _msa_setup(kind):
    from kanvit.layers.attention import MSA

    msa = MSA(d=128, n_heads=4, type=kind)
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (8, 6, 128)))
    params = {"params": msa.init(jax.random.PRNGKey(1), x)["params"]}

    def loss(p, xx):
        return (msa.apply(p, xx) ** 2).sum()

    return msa, params, x, loss


def _shard_msa(params, mesh):
    from kanvit.parallel.mesh import param_shardings

    shardings = param_shardings(params["params"], mesh)
    return {
        "params": jax.tree.map(
            lambda a, s: jax.device_put(a, s), params["params"], shardings
        )
    }


@pytest.mark.parametrize("kind", MSA_TP_KINDS)
def test_msa_sharded_path_matches_single_device(kind):
    msa, params, x, loss = _msa_setup(kind)
    y0 = msa.apply(params, x)
    g0 = jax.grad(loss)(params, x)

    mesh = create_mesh(n_model=2)  # (4, 2)
    sp = _shard_msa(params, mesh)
    sx = jax.device_put(x, batch_sharding(mesh))
    with runtime.mesh_active(mesh):
        y1 = jax.jit(msa.apply)(sp, sx)
        g1 = jax.jit(jax.grad(loss))(sp, sx)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-5
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.abs(np.asarray(a - b)).max() < 1e-4


@pytest.mark.slow  # interpret-mode kernels under the mesh: ~20-35s/kind
@pytest.mark.parametrize("kind", ["efficientkan", "fast", "sine"])
def test_msa_sharded_forced_pallas_parity(kind):
    """KANVIT_IMPL=pallas under the (4, 2) mesh: the fused slot-grouped /
    shared-basis kernels launch per shard in interpret mode and must match
    the unsharded jnp ground truth (values + grads) — the code path a real
    model-sharded TPU mesh runs."""
    from kanvit.ops import dispatch

    prev = dispatch.get_impl()
    try:
        dispatch.set_impl("jnp")
        msa, params, x, loss = _msa_setup(kind)
        y0 = msa.apply(params, x)
        g0 = jax.grad(loss)(params, x)

        dispatch.set_impl("pallas")
        mesh = create_mesh(n_model=2)
        sp = _shard_msa(params, mesh)
        sx = jax.device_put(x, batch_sharding(mesh))
        with runtime.mesh_active(mesh):
            y1 = msa.apply(sp, sx)
            g1 = jax.grad(loss)(sp, sx)
        assert np.abs(np.asarray(y1 - y0)).max() < 1e-4
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            assert np.abs(np.asarray(a - b)).max() < 1e-3
    finally:
        dispatch.set_impl(prev)


@pytest.mark.slow  # full-model interpret-mode kernels under the mesh: ~30s
def test_train_step_sharded_forced_pallas_matches_jnp():
    """End-to-end TP+DP train step with forced-pallas kernels (embedder
    kan_op shard_map over data + MSA shard_map over data x model) equals
    the unsharded jnp loss."""
    from kanvit.ops import dispatch

    prev = dispatch.get_impl()
    try:
        dispatch.set_impl("jnp")
        model = create_model(
            "efficientkan", chw=(1, 28, 28), n_patches=7, n_blocks=2,
            d_hidden=128, n_heads=4, out_d=10,
        )
        rng = jax.random.PRNGKey(0)
        state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 1, 28, 28))
        y = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)
        step = make_train_step(donate=False)
        _, loss0, _ = step(state, x, y)

        dispatch.set_impl("pallas")
        mesh = create_mesh(n_model=2)
        sstate = shard_state(state, mesh)
        sx = jax.device_put(x, batch_sharding(mesh))
        sy = jax.device_put(y, batch_sharding(mesh))
        with runtime.mesh_active(mesh):
            _, loss1, _ = step(sstate, sx, sy)
        assert abs(float(loss0) - float(loss1)) < 1e-5
    finally:
        dispatch.set_impl(prev)


@pytest.mark.slow  # ~27 s: full train-and-refit under the mesh
def test_stateful_grid_trains_and_refits_under_mesh():
    """Adaptive B-spline grids under the (4, 2) mesh: the fused shard-map
    path declines (stateful grids keep the module path so kan_inputs sow),
    and both the train step and the grid-refit step must run sharded with
    finite outputs and a changed grid."""
    from kanvit.train.grid_update import make_update_grid_step

    model = create_model(
        "efficientkan", chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=32, n_heads=4, out_d=10, stateful_grid=True,
    )
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.zeros((1, 1, 28, 28)))
    mesh = create_mesh(n_model=2)
    sstate = shard_state(state, mesh)
    x = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), (8, 1, 28, 28)),
        batch_sharding(mesh),
    )
    y = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10),
        batch_sharding(mesh),
    )
    step = make_train_step(donate=False)
    update = make_update_grid_step(model.apply, donate=False)
    with runtime.mesh_active(mesh):
        sstate, loss, _ = step(sstate, x, y)
        grids0 = [
            np.asarray(g) for p, g in
            jax.tree_util.tree_leaves_with_path(sstate.params)
            if str(getattr(p[-1], "key", p[-1])) == "grid"
        ]
        sstate = update(sstate, x)
        sstate, loss2, _ = step(sstate, x, y)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    grids1 = [
        np.asarray(g) for p, g in
        jax.tree_util.tree_leaves_with_path(sstate.params)
        if str(getattr(p[-1], "key", p[-1])) == "grid"
    ]
    assert any(np.abs(a - b).max() > 0 for a, b in zip(grids0, grids1))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_flash(causal):
    """Sequence-parallel ring attention (k/v chunks rotate via ppermute,
    online-softmax accumulation per device) must equal single-device
    flash_attention in values and grads with T sharded 8-way."""
    from kanvit.kernels.flash_attention import flash_attention
    from kanvit.parallel.ring_attention import ring_attention

    b, h, t, dh = 2, 2, 256, 16
    ks = jax.random.split(jax.random.PRNGKey(70), 4)
    q = jax.random.normal(ks[0], (b, h, t, dh))
    k = jax.random.normal(ks[1], (b, h, t, dh))
    v = jax.random.normal(ks[2], (b, h, t, dh))

    def loss_ref(q, k, v):
        return (flash_attention(q, k, v, causal=causal) ** 2).sum()

    y0 = flash_attention(q, k, v, causal=causal)
    g0 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    mesh = create_mesh()  # (8, 1): 8-way seq sharding on 'data'

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh=mesh, causal=causal) ** 2).sum()

    y1 = jax.jit(
        lambda q, k, v: ring_attention(q, k, v, mesh=mesh, causal=causal)
    )(q, k, v)
    g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-5
    for a, b_ in zip(g0, g1):
        assert np.abs(np.asarray(a - b_)).max() < 1e-3


def test_flash_block_seq_parallel_training_step():
    """A causal FlashAttentionBlock with seq_axis set trains with T
    sharded over the mesh (ring attention inside) and matches the
    unsharded block's values and grads."""
    from kanvit.layers.attention import FlashAttentionBlock

    b, t, d = 2, 64, 32
    x = jax.random.normal(jax.random.PRNGKey(80), (b, t, d))

    blk0 = FlashAttentionBlock(dim=d, heads=2, dim_head=16, causal=True)
    params = {"params": blk0.init(jax.random.PRNGKey(81), x)["params"]}

    def loss0(p, xx):
        return (blk0.apply(p, xx) ** 2).sum()

    y0 = blk0.apply(params, x)
    g0 = jax.grad(loss0)(params, x)

    blk1 = FlashAttentionBlock(dim=d, heads=2, dim_head=16, causal=True,
                               seq_axis="data")
    mesh = create_mesh()  # (8, 1)
    from jax.sharding import NamedSharding, PartitionSpec as PS

    sx = jax.device_put(x, NamedSharding(mesh, PS(None, "data")))

    def loss1(p, xx):
        return (blk1.apply(p, xx) ** 2).sum()

    with runtime.mesh_active(mesh):
        y1 = jax.jit(blk1.apply)(params, sx)
        g1 = jax.jit(jax.grad(loss1))(params, sx)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-5
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.abs(np.asarray(a - b_)).max() < 1e-3


def test_ring_attention_no_mesh_is_flash():
    from kanvit.kernels.flash_attention import flash_attention
    from kanvit.parallel.ring_attention import ring_attention

    ks = jax.random.split(jax.random.PRNGKey(71), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 64, 16)) for kk in ks)
    y0 = flash_attention(q, k, v)
    y1 = ring_attention(q, k, v)  # no mesh -> flash path
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-6


def test_msa_sharded_indivisible_heads_falls_back():
    """heads % model-axis != 0: the shard-mapped path must decline and the
    partitioner-safe fallback still produce single-device values."""
    from kanvit.layers.attention import MSA

    msa = MSA(d=96, n_heads=3, type="efficientkan")
    x = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (8, 6, 96)))
    params = {"params": msa.init(jax.random.PRNGKey(1), x)["params"]}
    y0 = msa.apply(params, x)

    mesh = create_mesh(n_model=2)
    sp = _shard_msa(params, mesh)  # 3 heads: rules fall back to replicated
    sx = jax.device_put(x, batch_sharding(mesh))
    with runtime.mesh_active(mesh):
        y1 = jax.jit(msa.apply)(sp, sx)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-5


def test_causal_decoder_ring_matches_single_device():
    """The CausalDecoder model with seq_axis='data' (T sharded 8-way, ring
    attention in every block) must match the unsharded decoder's logits
    and grads — the user-facing SP surface over the layer-level ring."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from kanvit.models import CausalDecoder

    vocab, seq = 32, 64
    toks = jax.random.randint(jax.random.PRNGKey(90), (2, seq), 0, vocab)
    dec0 = CausalDecoder(vocab=vocab, dim=32, heads=2, n_blocks=2)
    params = {"params": dec0.init(jax.random.PRNGKey(91), toks)["params"]}
    y0 = dec0.apply(params, toks)
    g0 = jax.grad(lambda p: (dec0.apply(p, toks) ** 2).sum())(params)

    dec1 = CausalDecoder(vocab=vocab, dim=32, heads=2, n_blocks=2,
                         seq_axis="data")
    mesh = create_mesh()  # (8, 1)
    st = jax.device_put(toks, NamedSharding(mesh, PS(None, "data")))
    with runtime.mesh_active(mesh):
        y1 = jax.jit(dec1.apply)(params, st)
        g1 = jax.jit(jax.grad(lambda p: (dec1.apply(p, st) ** 2).sum()))(params)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-4
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.abs(np.asarray(a - b)).max() < 1e-2 * max(
            1.0, float(np.abs(np.asarray(a)).max())
        )
