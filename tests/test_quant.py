"""int8 serving quantization: accuracy of qdot, the trace-time switch, and
the Predictor surface (kanvit/ops/quant.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from kanvit.layers.kan import TorchLinear
from kanvit.ops import quant


def test_qdot_matches_float_dot_closely():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 384))
    w = jax.random.normal(jax.random.PRNGKey(1), (768, 384)) * 0.05
    exact = np.asarray(x @ w.T)
    q = np.asarray(quant.qdot(x, w))
    # W8A8 with per-tensor activation scale: error bounded by the two
    # rounding steps — ~1% of the output dynamic range for gaussian data.
    scale = np.abs(exact).max()
    assert np.abs(q - exact).max() < 0.02 * scale
    # and well-correlated elementwise
    corr = np.corrcoef(q.ravel(), exact.ravel())[0, 1]
    assert corr > 0.9999


def test_qdot_rowwise_matches_float_dot_closely():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 384))
    w = jax.random.normal(jax.random.PRNGKey(1), (768, 384)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (768,))
    exact = np.asarray(x @ w.T + b)
    q = np.asarray(quant.qdot_rowwise(x, w, bias=b))
    scale = np.abs(exact).max()
    # Per-row scales are finer than qdot's per-tensor scale: same 2%-of-
    # range bound holds with margin.
    assert np.abs(q - exact).max() < 0.02 * scale
    corr = np.corrcoef(q.ravel(), exact.ravel())[0, 1]
    assert corr > 0.9999
    # leading-dims preserved
    x3 = x.reshape(4, 16, 384)
    q3 = np.asarray(quant.qdot_rowwise(x3, w, bias=b))
    np.testing.assert_array_equal(q3.reshape(64, 768), q)


def _quant_step_bound(x, w):
    """Max output perturbation from ONE rounding-tie flip (see below)."""
    sx = np.abs(np.asarray(x, np.float32)).max(axis=-1).max() / 127.0
    sw = np.abs(np.asarray(w, np.float32)).max(axis=-1).max() / 127.0
    return 3.0 * sx * sw * 127.0


def test_int8_kernel_matches_qdot_rowwise():
    """The fused Pallas kernel (kanvit/kernels/int8_matmul.py) against its
    jnp twin, multi-block grid with a padded row tail, with and without
    bias, f32 and bf16 inputs.

    Tolerance is tie-aware: the scale division rounds differently by 1 ulp
    across compilation paths, flipping quantization of elements that land
    exactly on .5 boundaries — each flip moves one output by at most
    sx*sw*|wq| <= sx*sw*127.
    """
    from kanvit.kernels import int8_matmul as IM
    from kanvit.ops import dispatch

    dispatch.set_impl("pallas")
    try:
        prev_bn, prev_bo = IM._BN, IM._BO
        prev_wres = IM._W_RESIDENT_BYTES
        IM._BN, IM._BO = 64, 128  # force a (2+, 3) grid at test shapes
        IM._W_RESIDENT_BYTES = 0  # disable the resident-weight fast path
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(100, 256)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(384, 256)).astype(np.float32) * 0.05
        )
        b = jnp.asarray(rng.normal(size=(384,)).astype(np.float32))
        for dt in (jnp.float32, jnp.bfloat16):
            xd, wd = x.astype(dt), w.astype(dt)
            for bias in (b, None):
                y = IM.int8_linear(xd, wd, bias=bias)
                assert y is not None
                ref = quant.qdot_rowwise(xd, wd, bias=bias)
                bound = _quant_step_bound(xd, wd)
                assert np.abs(np.asarray(y) - np.asarray(ref)).max() \
                    <= bound, dt
        # resident-weight path (bo = out, x read once) matches too
        IM._W_RESIDENT_BYTES = prev_wres
        y = IM.int8_linear(x, w, bias=b)
        ref = quant.qdot_rowwise(x, w, bias=b)
        assert np.abs(np.asarray(y) - np.asarray(ref)).max() \
            <= _quant_step_bound(x, w)
        # ineligible shapes fall back (K not a lane multiple)
        assert IM.int8_linear(x[:, :100], w[:, :100]) is None
    finally:
        IM._BN, IM._BO = prev_bn, prev_bo
        IM._W_RESIDENT_BYTES = prev_wres
        dispatch.set_impl("auto")


def test_torchlinear_int8_uses_kernel_under_forced_pallas():
    from kanvit.kernels import int8_matmul as IM
    from kanvit.ops import dispatch

    lin = TorchLinear(128, 256)
    x = jax.random.normal(jax.random.PRNGKey(0), (48, 128))
    params = lin.init(jax.random.PRNGKey(1), x)["params"]
    dispatch.set_impl("pallas")
    try:
        with quant.int8_serving():
            y = lin.apply({"params": params}, x)
        ref = quant.qdot_rowwise(x, params["weight"], bias=params["bias"])
        bound = _quant_step_bound(x, params["weight"])
        assert np.abs(np.asarray(y) - np.asarray(ref)).max() <= bound
    finally:
        dispatch.set_impl("auto")
    # and on the auto/CPU path the XLA qdot remains in charge
    with quant.int8_serving():
        y2 = lin.apply({"params": params}, x)
    np.testing.assert_array_equal(
        np.asarray(y2),
        np.asarray(quant.qdot(x, params["weight"]) + params["bias"]),
    )


def test_int8_context_switches_torchlinear():
    lin = TorchLinear(16, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    params = lin.init(jax.random.PRNGKey(1), x)["params"]

    y_f32 = lin.apply({"params": params}, x)

    with quant.int8_serving():
        y_q = lin.apply({"params": params}, x)
    # The quantized path must be the EXACT qdot result...
    np.testing.assert_array_equal(
        np.asarray(y_q),
        np.asarray(quant.qdot(x, params["weight"])
                   + params["bias"]),
    )
    # ...different from (but close to) the float path.
    assert not np.array_equal(np.asarray(y_q), np.asarray(y_f32))
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f32),
                               atol=0.05, rtol=0.1)
    # Outside the context the float path is restored bit-for-bit.
    np.testing.assert_array_equal(
        np.asarray(lin.apply({"params": params}, x)), np.asarray(y_f32)
    )


def test_int8_trace_time_capture_in_jit():
    """A program jitted (traced) inside the context stays quantized for its
    lifetime; one traced outside stays float — the contextvar is read at
    trace time only."""
    lin = TorchLinear(16, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    params = lin.init(jax.random.PRNGKey(1), x)["params"]

    f_float = jax.jit(lambda p, x: lin.apply({"params": p}, x))
    y_float = np.asarray(f_float(params, x))  # traced outside

    with quant.int8_serving():
        f_quant = jax.jit(lambda p, x: lin.apply({"params": p}, x))
        y_quant = np.asarray(f_quant(params, x))  # traced inside

    # Re-invoking after the context closed keeps each program's behavior.
    assert np.array_equal(np.asarray(f_quant(params, x)), y_quant)
    assert np.array_equal(np.asarray(f_float(params, x)), y_float)
    assert not np.array_equal(y_quant, y_float)


def test_predictor_int8_end_to_end():
    from kanvit.infer import Predictor
    from kanvit.models import create_model

    model = create_model(
        "vanilla", chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=32, n_heads=4, out_d=10,
    )
    x = np.random.default_rng(0).normal(size=(32, 1, 28, 28)).astype(
        np.float32
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]

    p_f32 = Predictor(model, params, batch_size=16)
    p_int8 = Predictor(model, params, batch_size=16, quant="int8")
    lab_f, prob_f = p_f32.predict(x)
    lab_q, prob_q = p_int8.predict(x)
    # Logits drift by quantization noise; the decision function must
    # survive it on all but borderline examples.
    agree = (lab_f == lab_q).mean()
    assert agree >= 0.9, f"top-1 agreement {agree}"
    assert np.abs(prob_f - prob_q).max() < 0.2


def test_calibrated_static_scales_end_to_end():
    """calibrate() captures one amax per TorchLinear scope, the re-jitted
    forward uses static scales (no dynamic max in the program), and the
    predictions stay accurate."""
    from kanvit.infer import Predictor
    from kanvit.models import create_model

    model = create_model(
        "vanilla", chw=(1, 28, 28), n_patches=7, n_blocks=2,
        d_hidden=32, n_heads=4, out_d=10,
    )
    x = np.random.default_rng(0).normal(size=(32, 1, 28, 28)).astype(
        np.float32
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]

    p_f32 = Predictor(model, params, batch_size=16)
    p_q = Predictor(model, params, batch_size=16, quant="int8")
    scales = p_q.calibrate(x, max_batches=1)
    # One scale per TorchLinear call site: mapper, 2 blocks x (q/k/v heads
    # vmapped as single scopes + 2 FF linears), head linear.
    assert len(scales) >= 6
    assert all(s > 0 for s in scales.values())
    assert any("ff_0" in k for k in scales)

    lab_f, prob_f = p_f32.predict(x)
    lab_q, prob_q = p_q.predict(x)
    agree = (lab_f == lab_q).mean()
    assert agree >= 0.9, f"top-1 agreement {agree} with static scales"
    assert np.abs(prob_f - prob_q).max() < 0.2
