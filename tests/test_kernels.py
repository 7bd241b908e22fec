"""Pallas kernels vs pure-JAX ground truth — run in interpreter mode on the
CPU CI mesh (exact same kernel code paths as TPU; SURVEY §4.2).

Shapes are kept tiny: interpret mode executes the grid serially.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kanvit.ops import dispatch
from kanvit.ops import kan_bases as K
from kanvit.ops.attention import flash_attention_reference


@pytest.fixture(autouse=True)
def force_pallas():
    dispatch.set_impl("pallas")
    yield
    dispatch.set_impl("auto")


def test_flash_attention_kernel_fwd_bwd():
    from kanvit.kernels.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 20, 8))
    k = jax.random.normal(kk, (1, 2, 20, 8))
    v = jax.random.normal(kv, (1, 2, 20, 8))

    o = flash_attention(q, k, v, False, 16, 16)
    ref, _ = flash_attention_reference(q, k, v, False, 16, 16)
    assert np.abs(np.asarray(o - ref)).max() < 1e-5

    f_pal = lambda q, k, v: (flash_attention(q, k, v, False, 16, 16) ** 2).sum()
    f_ref = lambda q, k, v: (
        flash_attention_reference(q, k, v, False, 16, 16)[0] ** 2
    ).sum()
    gp = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        assert np.abs(np.asarray(a - b)).max() < 1e-4


def test_flash_attention_kernel_causal():
    from kanvit.kernels.flash_attention import flash_attention

    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 1, 24, 8))
    k = jax.random.normal(kk, (1, 1, 24, 8))
    v = jax.random.normal(kv, (1, 1, 24, 8))
    o = flash_attention(q, k, v, True, 16, 16)
    ref, _ = flash_attention_reference(q, k, v, True, 16, 16)
    assert np.abs(np.asarray(o - ref)).max() < 1e-5


@pytest.mark.slow  # interpret-mode single-tile sweep (~14s CPU); fwd_bwd/causal cover the family fast
def test_flash_attention_small_single_tile_path():
    """With bucket sizes covering the whole (short) sequence, the fully
    fused single-tile kernels engage (joint dq/dk/dv backward, one program
    per batch item looping heads) — values and grads must match the
    reference, causal included."""
    from kanvit.kernels import flash_attention as FA

    assert FA._use_small(20, 20, 8, 2, 512, 1024, 4)
    assert not FA._use_small(20, 20, 8, 2, 16, 16, 4)  # explicit buckets

    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 2, 20, 8))
    k = jax.random.normal(kk, (2, 2, 20, 8))
    v = jax.random.normal(kv, (2, 2, 20, 8))
    for causal in (False, True):
        o = FA.flash_attention(q, k, v, causal, 512, 1024)
        ref, _ = flash_attention_reference(q, k, v, causal, 512, 1024)
        assert np.abs(np.asarray(o - ref)).max() < 1e-5

        f_pal = lambda q, k, v: (
            FA.flash_attention(q, k, v, causal, 512, 1024) ** 2
        ).sum()
        f_ref = lambda q, k, v: (
            flash_attention_reference(q, k, v, causal, 512, 1024)[0] ** 2
        ).sum()
        gp = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gp, gr):
            assert np.abs(np.asarray(a - b)).max() < 1e-4

    # Key-padding mask through the small path (reference's (B, Tk) mask,
    # utils.py:154-164), values + grads.
    mask = jnp.array([[True] * 15 + [False] * 5, [True] * 20])
    o = FA.flash_attention(q, k, v, False, 512, 1024, mask=mask)
    ref, _ = flash_attention_reference(q, k, v, False, 512, 1024, mask=mask)
    assert np.abs(np.asarray(o - ref)).max() < 1e-5
    g_pal = jax.grad(lambda q, k, v: (
        FA.flash_attention(q, k, v, False, 512, 1024, mask=mask) ** 2
    ).sum(), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: (
        flash_attention_reference(q, k, v, False, 512, 1024, mask=mask)[0] ** 2
    ).sum(), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        assert np.abs(np.asarray(a - b)).max() < 1e-4


N, IN, OUT = 24, 8, 16


@pytest.fixture
def x():
    return jax.random.normal(jax.random.PRNGKey(2), (N, IN)) * 0.8


def _check_grads(f_pal, f_ref, args, tol=1e-4):
    gp = jax.grad(lambda *a: (f_pal(*a) ** 2).sum(), argnums=tuple(range(len(args))))(*args)
    gr = jax.grad(lambda *a: (f_ref(*a) ** 2).sum(), argnums=tuple(range(len(args))))(*args)
    for a, b in zip(gp, gr):
        assert np.abs(np.asarray(a - b)).max() < tol


def test_fused_bspline(x):
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    grid = K.make_bspline_grid(IN, 5, 3)
    bw = jax.random.normal(k1, (OUT, IN)) * 0.1
    sw = jax.random.normal(k2, (OUT, IN, 8)) * 0.1
    sc = jax.random.normal(k3, (OUT, IN)) * 0.1
    f_pal = lambda x, bw, sw, sc: FB.bspline_kan(x, grid, bw, sw, sc, 3)
    f_ref = lambda x, bw, sw, sc: K.bspline_kan_forward(x, grid, bw, sw, sc, 3)
    assert np.abs(np.asarray(f_pal(x, bw, sw, sc) - f_ref(x, bw, sw, sc))).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, bw, sw, sc))


def test_fused_fastkan(x):
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    lg, lb = jnp.ones(IN), jnp.zeros(IN)
    rg, den = jnp.linspace(-2, 2, 8), 4.0 / 7.0
    spw = jax.random.normal(k1, (OUT, IN * 8)) * 0.1
    bw = jax.random.normal(k2, (OUT, IN)) * 0.1
    bb = jax.random.normal(k3, (OUT,)) * 0.1
    f_pal = lambda x, s, w, b: FB.fastkan(x, lg, lb, rg, den, s, w, b)
    f_ref = lambda x, s, w, b: K.fastkan_forward(x, lg, lb, rg, den, s, w, b)
    assert np.abs(np.asarray(f_pal(x, spw, bw, bb) - f_ref(x, spw, bw, bb))).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, spw, bw, bb))


@pytest.mark.slow  # LN-fused variant full VJP (~8s CPU); plain fastkan covers the family fast
def test_fused_fastkan_ln_in_kernel(x):
    """The LN-fused single-input op (`_rbf_ln_base_op`): segment-wise
    LayerNorm over packed lane groups + LN VJP in-kernel. Non-trivial
    gamma/beta so the dgamma/dbeta accumulators and the packed-group
    fold-back are exercised (values + grads vs K.fastkan_forward)."""
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    lg = 1.0 + 0.3 * jax.random.normal(k4, (IN,))
    lb = 0.2 * jax.random.normal(k5, (IN,))
    rg, den = jnp.linspace(-2, 2, 8), 4.0 / 7.0
    spw = jax.random.normal(k1, (OUT, IN * 8)) * 0.1
    bw = jax.random.normal(k2, (OUT, IN)) * 0.1
    bb = jax.random.normal(k3, (OUT,)) * 0.1
    f_pal = lambda x, lg, lb, s, w, b: FB.fastkan(x, lg, lb, rg, den, s, w, b)
    f_ref = lambda x, lg, lb, s, w, b: K.fastkan_forward(
        x, lg, lb, rg, den, s, w, b
    )
    assert np.abs(np.asarray(
        f_pal(x, lg, lb, spw, bw, bb) - f_ref(x, lg, lb, spw, bw, bb)
    )).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, lg, lb, spw, bw, bb))


@pytest.mark.slow  # opt-in recurrence hatch, extreme-tail sweep (~11s CPU)
def test_fused_fastkan_recurrence_extremes(x, monkeypatch):
    """Opt-in uniform-grid RBF recurrence (`_rbf_recur`: 2 exps + carried
    multiplies instead of ng exps; KANVIT_RBF_RECUR=1 — measured negative
    end-to-end on v5e, kept as a hatch). Must match the per-slice exps
    everywhere, including the far tail where the clamped carry flushes to
    zero exactly as the direct exps underflow. Mixed LN gammas push |ln(x)|
    from the grid interior through the representable tail (|u| up to ~9)
    into the clamp region (|u| in the hundreds)."""
    from kanvit.kernels import fused_basis as FB

    monkeypatch.setenv("KANVIT_RBF_RECUR", "1")
    key = jax.random.PRNGKey(12)
    k1, k2, k3 = jax.random.split(key, 3)
    lg = jnp.asarray([1.0, 2.5, 8.0, 40.0, 1.0, 2.5, 8.0, 40.0])
    lb = jnp.asarray([0.0, -1.0, 2.0, 0.5, 0.0, 1.0, -2.0, -0.5])
    rg, den = jnp.linspace(-2, 2, 8), 4.0 / 7.0
    spw = jax.random.normal(k1, (OUT, IN * 8)) * 0.1
    bw = jax.random.normal(k2, (OUT, IN)) * 0.1
    bb = jax.random.normal(k3, (OUT,)) * 0.1
    f_pal = lambda x, lg, lb, s, w, b: FB.fastkan(x, lg, lb, rg, den, s, w, b)
    f_ref = lambda x, lg, lb, s, w, b: K.fastkan_forward(
        x, lg, lb, rg, den, s, w, b
    )
    y_pal = f_pal(x, lg, lb, spw, bw, bb)
    assert bool(jnp.all(jnp.isfinite(y_pal)))
    assert np.abs(np.asarray(y_pal - f_ref(x, lg, lb, spw, bw, bb))).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, lg, lb, spw, bw, bb))

    # ng < 3 takes the direct per-slice path with an unaugmented grid row
    # (_rbf_aug is a no-op there) — cover the degenerate geometry too.
    rg2, den2 = jnp.linspace(-1, 1, 2), 2.0
    spw2 = spw[:, : IN * 2]
    f_pal2 = lambda x: FB.fastkan(x, lg, lb, rg2, den2, spw2, bw, bb)
    f_ref2 = lambda x: K.fastkan_forward(x, lg, lb, rg2, den2, spw2, bw, bb)
    assert np.abs(np.asarray(f_pal2(x) - f_ref2(x))).max() < 1e-5


def test_fused_ffn_pre_ln(x, monkeypatch):
    """Fused pre-LN feed-forward (`kernels/fused_ffn`): LN2 + both FF
    Linears + ReLU + residual in one kernel, all six parameter grads
    accumulated in-kernel. Row block shrunk so the grid runs multiple
    steps (accumulator init/finish paths exercised); values + VJP vs
    K.ffn_pre_ln for every argument."""
    from kanvit.kernels import fused_ffn as FFN

    monkeypatch.setenv("KANVIT_FF", "1")
    monkeypatch.setenv("KANVIT_FF_BN", "8")
    key = jax.random.PRNGKey(13)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    d, f = IN, 2 * IN
    gam = 1.0 + 0.3 * jax.random.normal(k1, (d,))
    bet = 0.2 * jax.random.normal(k2, (d,))
    w1 = jax.random.normal(k3, (f, d)) * 0.3
    b1 = jax.random.normal(k4, (f,)) * 0.3
    w2 = jax.random.normal(k5, (d, f)) * 0.3
    b2 = jax.random.normal(k6, (d,)) * 0.3
    args = (x, gam, bet, w1, b1, w2, b2)
    y = FFN.ffn_pre_ln(*args)
    assert y is not None  # forced-pallas fixture bypasses the thresholds
    assert np.abs(np.asarray(y - K.ffn_pre_ln(*args))).max() < 1e-5
    _check_grads(FFN.ffn_pre_ln, K.ffn_pre_ln, args)


def test_fused_sine(x):
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(5)
    freq = jnp.arange(1, 5.0) / 5
    phase = K.sinekan_phase_init(IN, 4)
    amp = jax.random.normal(key, (OUT, IN, 4)) * 0.1
    bias = jnp.ones(OUT) / OUT
    f_pal = lambda x, f, a, b: FB.sinekan(x, f, phase, a, b)
    f_ref = lambda x, f, a, b: K.sinekan_forward(x, f, phase, a, b)
    assert np.abs(
        np.asarray(f_pal(x, freq, amp, bias) - f_ref(x, freq, amp, bias))
    ).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, freq, amp, bias))


def test_fused_fourier(x):
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(6)
    k1, k2 = jax.random.split(key)
    co = jax.random.normal(k1, (2, OUT, IN, 5)) * 0.05
    bias = jax.random.normal(k2, (OUT,)) * 0.1
    f_pal = lambda x, c, b: FB.fourierkan(x, c, b)
    f_ref = lambda x, c, b: K.fourierkan_forward(x, c, b)
    assert np.abs(np.asarray(f_pal(x, co, bias) - f_ref(x, co, bias))).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, co, bias))


@pytest.mark.slow  # kb streaming tier, 3 backward strategies (~8s CPU)
def test_kb_streaming_sine(x):
    """K-blocked streaming tier, sine: fwd/dx/dw/dfreq vs the closed-form
    reference at tiny forced (gb, bn). Covers the k-innermost y/dx
    accumulators, the transposed dw grid, and the in-kernel dfreq."""
    from kanvit.kernels import fused_basis as FB

    ng, gb, bn = 4, 2, 8
    key = jax.random.PRNGKey(21)
    k1, k2 = jax.random.split(key)
    freq2d = (jnp.arange(1, ng + 1.0) / ng).reshape(1, -1)
    phase = jax.random.normal(k1, (ng, IN)) * 0.3
    w3d = jax.random.normal(k2, (ng, IN, OUT)) * 0.1
    fam = FB.sine_family(ng)
    specs = (FB._smem_spec(freq2d), FB._full_vmem_spec(phase))
    axes = (1, 0)

    def ref(x, w3d, freq2d):
        b = jnp.sin(x[:, :, None] * freq2d[0] + phase.T[None])  # (N, in, ng)
        return jnp.einsum("nig,gio->no", b, w3d)

    y = FB._fused_fwd_kb(x, w3d, (freq2d, phase), specs, axes, fam, gb, bn)
    assert np.abs(np.asarray(y - ref(x, w3d, freq2d))).max() < 1e-5

    g = jax.random.normal(jax.random.PRNGKey(22), (N, OUT)) * 0.5
    dx, dw, dfreq = FB._fused_bwd_kb(
        x, w3d, g, (freq2d, phase), specs, axes, fam, gb, bn, bn,
        sine_freq_phase=(freq2d, phase),
    )
    rx, rw, rf = jax.grad(
        lambda x, w, f: (ref(x, w, f) * g).sum(), argnums=(0, 1, 2)
    )(x, w3d, freq2d)
    assert np.abs(np.asarray(dx - rx)).max() < 1e-4
    assert np.abs(np.asarray(dw - rw)).max() < 1e-4
    assert np.abs(np.asarray(dfreq - rf)).max() < 1e-3

    # Split-residual strategy: the basis-emitting forward matches, and the
    # residual-streaming dw + cos-only dfreq backward matches the same
    # references (the sine embedder path; KANVIT_SINE_SPLIT gates it).
    y2, basis = FB._fused_fwd_kb_basis(
        x, w3d, (freq2d, phase), specs, axes, fam, gb, bn
    )
    assert np.abs(np.asarray(y2 - ref(x, w3d, freq2d))).max() < 1e-5
    dx2, dw2, df2 = FB._fused_bwd_kb_sine_res(
        x, w3d, g, basis, freq2d, phase, fam, gb, bn, bn
    )
    assert np.abs(np.asarray(dx2 - rx)).max() < 1e-4
    assert np.abs(np.asarray(dw2 - rw)).max() < 1e-4
    assert np.abs(np.asarray(df2 - rf)).max() < 1e-3

    # Decoupled dw slab (gb_dw != gb): the dw/dfreq kernel runs its own
    # (k, rows) grid geometry while dx keeps the fwd slab — values must
    # not move (_pick_kb sizes these independently; the dw pass is
    # step-overhead bound and wants the widest slab that fits).
    dx3, dw3, df3 = FB._fused_bwd_kb(
        x, w3d, g, (freq2d, phase), specs, axes, fam, gb, bn, bn,
        sine_freq_phase=(freq2d, phase), gb_dw=ng,
    )
    assert np.abs(np.asarray(dx3 - rx)).max() < 1e-4
    assert np.abs(np.asarray(dw3 - rw)).max() < 1e-4
    assert np.abs(np.asarray(df3 - rf)).max() < 1e-3


@pytest.mark.slow  # plain-tier joint bwd + vmapped VJP (~8s CPU); fused_sine covers the family fast
def test_sine_plain_joint_bwd(x):
    """Plain-tier sine joint backward (_bwd_kernel_sine): dx/dw and the
    in-kernel SMEM-accumulated dfreq vs jax.grad of the closed form —
    direct, through the _sine_op custom VJP, and vmapped over a head axis
    (the MSA layout, where each head carries its own trainable freq)."""
    from kanvit.kernels import fused_basis as FB

    ng = 4
    key = jax.random.PRNGKey(31)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    freq2d = (jnp.arange(1, ng + 1.0) / (ng + 1)).reshape(1, -1)
    phase = jax.random.normal(k1, (ng, IN)) * 0.3
    w3d = jax.random.normal(k2, (ng, IN, OUT)) * 0.1
    g = jax.random.normal(k3, (N, OUT)) * 0.5

    def ref(x, w3d, freq2d):
        b = jnp.sin(x[:, :, None] * freq2d[0] + phase.T[None])
        return jnp.einsum("nig,gio->no", b, w3d)

    out = FB._fused_bwd_sine_plain(x, w3d, g, freq2d, phase)
    assert out is not None
    dx, dw, dfreq = out
    rx, rw, rf = jax.grad(
        lambda x, w, f: (ref(x, w, f) * g).sum(), argnums=(0, 1, 2)
    )(x, w3d, freq2d)
    assert np.abs(np.asarray(dx - rx)).max() < 1e-4
    assert np.abs(np.asarray(dw - rw)).max() < 1e-4
    assert np.abs(np.asarray(dfreq - rf)).max() < 1e-3

    # vmapped over heads through the custom VJP (per-head freq/weights)
    H = 3
    xh = jnp.stack([x, x * 0.5, x + 0.1])
    wh = jnp.stack([w3d, w3d * 0.9, w3d + 0.01])
    fh = jnp.stack([freq2d, freq2d * 1.1, freq2d * 0.8])
    gh = jax.random.normal(k4, (H, N, OUT)) * 0.5

    def loss_op(args):
        xh, wh, fh = args
        y = jax.vmap(lambda a, b, c: FB._sine_op(a, b, c, phase, ng))(xh, wh, fh)
        return (y * gh).sum()

    def loss_ref(args):
        xh, wh, fh = args
        y = jax.vmap(lambda a, b, c: ref(a, b, c))(xh, wh, fh)
        return (y * gh).sum()

    go = jax.grad(loss_op)((xh, wh, fh))
    gr = jax.grad(loss_ref)((xh, wh, fh))
    for a, b in zip(go, gr):
        assert np.abs(np.asarray(a - b)).max() < 1e-3


@pytest.mark.slow  # interpret-mode at real qkv dims: ~90s on CPU
def test_slice_dot_pack_qkv_shape():
    """Pack-aware slice dots at the shared-basis qkv GEOMETRY (in=64 ->
    pack=2, out=192 = 1.5 MXU lane tiles): values + full VJP vs the jnp
    ground truth. The tiny-dim tests (IN=8 -> pack=16, OUT=16) never write
    y slices at non-128-aligned lane offsets; this shape does."""
    from kanvit.kernels import fused_basis as FB

    n, nin, out = 40, 64, 192
    key = jax.random.PRNGKey(33)
    k1, k2, k3 = jax.random.split(key, 3)
    xq = jnp.tanh(jax.random.normal(k1, (n, nin)))
    grid = K.make_bspline_grid(nin, 5, 3)
    bw = jax.random.normal(k2, (out, nin)) * 0.1
    sw = jax.random.normal(k3, (out, nin, 8)) * 0.1
    sc = jnp.ones((out, nin)) * 0.5

    f_pal = lambda x, bw, sw, sc: FB.bspline_kan(x, grid, bw, sw, sc, 3)
    f_ref = lambda x, bw, sw, sc: K.bspline_kan_forward(x, grid, bw, sw, sc, 3)
    assert np.abs(np.asarray(
        f_pal(xq, bw, sw, sc) - f_ref(xq, bw, sw, sc))).max() < 1e-5
    g = jax.random.normal(jax.random.PRNGKey(34), (n, out)) * 0.5
    gp = jax.grad(lambda a: (f_pal(*a) * g).sum())((xq, bw, sw, sc))
    gr = jax.grad(lambda a: (f_ref(*a) * g).sum())((xq, bw, sw, sc))
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        assert np.abs(np.asarray(a - b)).max() < 1e-4


@pytest.mark.slow  # slot-grouped tier, 2 families x full VJP (~30s CPU)
def test_grouped_qkv_slot_kernels():
    """Slot-grouped qkv tier (heads as slots, per-slot weights, lane-block
    indexing into the (N, H*dh) activation): values + full VJP vs the
    per-head jnp ground truth, at a geometry with q < H so the head-group
    grid axis and the (q*F, out) weight blocks are exercised."""
    from kanvit.kernels import fused_basis as FB

    n, h, dh = 32, 8, 32
    out, d = 3 * dh, h * dh
    assert FB._sg_slots(h, dh) == 4
    key = jax.random.PRNGKey(40)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    x2d = jnp.tanh(jax.random.normal(k1, (n, d)))
    grid = K.make_bspline_grid(dh, 5, 3)
    bw = jax.random.normal(k2, (h, out, dh)) * 0.1
    sw = jax.random.normal(k3, (h, out, dh, 8)) * 0.1
    sc = jnp.ones((h, out, dh)) * 0.5
    g = jax.random.normal(k4, (n, h * out)) * 0.5

    def ref(x2d, bw, sw, sc):
        return jnp.concatenate([
            K.bspline_kan_forward(
                x2d[:, i * dh : (i + 1) * dh], grid, bw[i], sw[i], sc[i], 3
            )
            for i in range(h)
        ], axis=1)

    f_sg = lambda x2d, bw, sw, sc: FB.bspline_qkv_grouped(
        x2d, grid, bw, sw, sc, 3
    )
    y = f_sg(x2d, bw, sw, sc)
    assert y is not None
    assert np.abs(np.asarray(y - ref(x2d, bw, sw, sc))).max() < 1e-5
    gp = jax.grad(lambda a: (f_sg(*a) * g).sum())((x2d, bw, sw, sc))
    gr = jax.grad(lambda a: (ref(*a) * g).sum())((x2d, bw, sw, sc))
    for a_, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        assert np.abs(np.asarray(a_ - b_)).max() < 1e-4

    # cheby through the same tier
    cc = jax.random.normal(k5, (h, dh, out, 5)) * 0.1

    def ref_c(x2d, cc):
        return jnp.concatenate([
            K.chebykan_forward(x2d[:, i * dh : (i + 1) * dh], cc[i])
            for i in range(h)
        ], axis=1)

    yc = FB.cheby_qkv_grouped(x2d, cc)
    assert yc is not None
    assert np.abs(np.asarray(yc - ref_c(x2d, cc))).max() < 1e-5
    gp = jax.grad(lambda a: (FB.cheby_qkv_grouped(*a) * g).sum())((x2d, cc))
    gr = jax.grad(lambda a: (ref_c(*a) * g).sum())((x2d, cc))
    for a_, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        assert np.abs(np.asarray(a_ - b_)).max() < 1e-4


@pytest.mark.slow  # 3 configs x full VJP in interpret mode (~14s CPU)
def test_lanes_attention_parity():
    """Lanes-layout single-tile attention ((B, T, H*dh) in and out, heads as
    lane slices): values + grads vs the reference on the transposed layout,
    incl. causal and the (B, Tk) key mask; inapplicable shapes return None."""
    from kanvit.kernels import flash_attention as FA

    b, h, t, dh = 2, 3, 20, 16
    key = jax.random.PRNGKey(60)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h * dh))
    k = jax.random.normal(kk, (b, t, h * dh))
    v = jax.random.normal(kv, (b, t, h * dh))
    g = jax.random.normal(jax.random.PRNGKey(61), (b, t, h * dh))
    mask = jnp.array([[True] * 15 + [False] * 5, [True] * 20])

    def ref(q, k, v, causal, m):
        to_h = lambda a: a.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        o = flash_attention_reference(
            to_h(q), to_h(k), to_h(v), causal, 512, 1024, mask=m
        )[0]
        return o.transpose(0, 2, 1, 3).reshape(b, t, h * dh)

    for causal, m in ((False, None), (True, None), (False, mask)):
        f_l = lambda q, k, v: FA.flash_attention_lanes(
            q, k, v, h, causal=causal, mask=m
        )
        o = f_l(q, k, v)
        assert o is not None
        assert np.abs(np.asarray(o - ref(q, k, v, causal, m))).max() < 1e-5
        gp = jax.grad(
            lambda a: (f_l(*a) * g).sum()
        )((q, k, v))
        gr = jax.grad(
            lambda a: (ref(*a, causal, m) * g).sum()
        )((q, k, v))
        for a_, b_ in zip(gp, gr):
            assert np.abs(np.asarray(a_ - b_)).max() < 1e-4

    # Guards: head dim not sublane-aligned, cross-attention (tq != tk),
    # explicit small buckets, and the env hatch all decline the path.
    assert FA.flash_attention_lanes(q[..., : h * 12], k[..., : h * 12],
                                    v[..., : h * 12], h) is None
    assert FA.flash_attention_lanes(q, k[:, :10], v[:, :10], h) is None
    assert FA.flash_attention_lanes(q, k, v, h, q_block=16) is None
    import os

    os.environ["KANVIT_ATTN_LANES"] = "0"
    try:
        assert FA.flash_attention_lanes(q, k, v, h) is None
    finally:
        os.environ["KANVIT_ATTN_LANES"] = "1"


@pytest.mark.slow  # slot-grouped RBF+LN full VJP (~20s CPU)
def test_grouped_fastkan_projection():
    """Slot-grouped FastKAN projection (per-head LN segments + slot slice
    dots): values + full VJP (incl. dgamma/dbeta) vs the per-head jnp
    ground truth."""
    from kanvit.kernels import fused_basis as FB

    n, h, dh, ng = 24, 8, 32, 8
    out, d = dh, h * dh
    key = jax.random.PRNGKey(50)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    x2d = jax.random.normal(k1, (n, d))
    gam = 1.0 + 0.1 * jax.random.normal(k2, (h, dh))
    bet = 0.1 * jax.random.normal(k3, (h, dh))
    sw = jax.random.normal(k4, (h, out, dh * ng)) * 0.1
    bw = jax.random.normal(k5, (h, out, dh)) * 0.1
    bb = jax.random.normal(k6, (h, out)) * 0.1
    grid = jnp.linspace(-2.0, 2.0, ng)
    den = 4.0 / (ng - 1)
    g = jax.random.normal(jax.random.PRNGKey(51), (n, h * out)) * 0.5

    def ref(x2d, gam, bet, sw, bw, bb):
        return jnp.concatenate([
            K.fastkan_forward(
                x2d[:, i * dh : (i + 1) * dh], gam[i], bet[i], grid, den,
                sw[i], bw[i], bb[i],
            )
            for i in range(h)
        ], axis=1)

    f_sg = lambda x2d, gam, bet, sw, bw, bb: FB.fastkan_qkv_grouped(
        x2d, gam, bet, grid, den, sw, bw, bb
    )
    y = f_sg(x2d, gam, bet, sw, bw, bb)
    assert y is not None
    assert np.abs(np.asarray(y - ref(x2d, gam, bet, sw, bw, bb))).max() < 1e-5
    args = (x2d, gam, bet, sw, bw, bb)
    gp = jax.grad(lambda a: (f_sg(*a) * g).sum())(args)
    gr = jax.grad(lambda a: (ref(*a) * g).sum())(args)
    for a_, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        assert np.abs(np.asarray(a_ - b_)).max() < 1e-4


@pytest.mark.slow  # slot-grouped sine full VJP incl. dfreq (~10s CPU)
def test_grouped_sinekan_projection():
    """Slot-grouped SineKAN projection (per-slot freq rows + in-kernel
    dfreq): values + full VJP (incl. dfreq) vs the per-head jnp ground
    truth."""
    from kanvit.kernels import fused_basis as FB

    n, h, dh, ng = 24, 4, 32, 4
    out, d = dh, h * dh
    key = jax.random.PRNGKey(70)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x2d = jax.random.normal(k1, (n, d))
    freq = 0.5 + jax.random.uniform(k2, (h, ng))
    amps = jax.random.normal(k3, (h, out, dh, ng)) * 0.1
    bias = jax.random.normal(k4, (h, out)) * 0.1
    phase = K.sinekan_phase_init(dh, ng)
    g = jax.random.normal(jax.random.PRNGKey(71), (n, h * out)) * 0.5

    def ref(x2d, freq, amps, bias):
        return jnp.concatenate([
            K.sinekan_forward(
                x2d[:, i * dh : (i + 1) * dh], freq[i], phase, amps[i],
                bias[i],
            )
            for i in range(h)
        ], axis=1)

    f_sg = lambda x2d, freq, amps, bias: FB.sinekan_qkv_grouped(
        x2d, freq, phase, amps, bias
    )
    y = f_sg(x2d, freq, amps, bias)
    assert y is not None
    assert np.abs(np.asarray(y - ref(x2d, freq, amps, bias))).max() < 1e-5
    args = (x2d, freq, amps, bias)
    gp = jax.grad(lambda a: (f_sg(*a) * g).sum())(args)
    gr = jax.grad(lambda a: (ref(*a) * g).sum())(args)
    for a_, b_ in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        assert np.abs(np.asarray(a_ - b_)).max() < 1e-4


@pytest.mark.parametrize(
    "kind",
    [
        # vanilla (the BD-lanes path) stays in the fast set; the KAN kinds
        # each run full interpret-mode MSA fwd+bwd twice (~25-40s apiece).
        "vanilla",
        pytest.param("cheby", marks=pytest.mark.slow),
        pytest.param("fast", marks=pytest.mark.slow),
        pytest.param("sine", marks=pytest.mark.slow),
    ],
)
def test_grouped_qkv_msa_wiring(monkeypatch, kind):
    """MSA with the slot-grouped qkv path (KANVIT_QKV_SG=1, default) must be
    value- and grad-equal to the vmapped per-head path (=0): validates the
    weight concat order, lane slicing, and output head layout end-to-end."""
    from kanvit.layers.attention import MSA

    key = jax.random.PRNGKey(41)
    xb = jnp.tanh(jax.random.normal(key, (2, 6, 128)))
    msa = MSA(d=128, n_heads=4, type=kind)
    params = msa.init(jax.random.PRNGKey(42), xb)

    def loss(p, xb):
        return (msa.apply(p, xb) ** 2).sum()

    monkeypatch.setenv("KANVIT_QKV_SG", "0")
    monkeypatch.setenv("KANVIT_QKV_BD", "0")
    y0 = msa.apply(params, xb)
    g0 = jax.grad(loss)(params, xb)
    monkeypatch.setenv("KANVIT_QKV_SG", "1")
    monkeypatch.setenv("KANVIT_QKV_BD", "1")
    y1 = msa.apply(params, xb)
    g1 = jax.grad(loss)(params, xb)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-4
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.abs(np.asarray(a - b)).max() < 1e-3


@pytest.mark.slow  # full MSA fwd+bwd through interpret-mode kernels: ~150s
def test_sine_qkv_hatch_parity(x, monkeypatch):
    """KANVIT_SINE_QKV=1 (block-diagonal fused q/k/v launch, off by default
    after the end-to-end A/B loss) must stay value- and grad-equal to the
    default per-projection path."""
    from kanvit.layers.attention import MSA

    monkeypatch.setenv("KANVIT_SINE_QKV", "0")
    xb = jnp.tanh(x[: 2 * 12].reshape(2, 12, IN))
    msa = MSA(d=IN, n_heads=2, type="sine")
    params = msa.init(jax.random.PRNGKey(5), xb)

    def loss(p, xb):
        return (msa.apply(p, xb) ** 2).sum()

    y0 = msa.apply(params, xb)
    g0 = jax.grad(loss)(params, xb)
    monkeypatch.setenv("KANVIT_SINE_QKV", "1")
    y1 = msa.apply(params, xb)
    g1 = jax.grad(loss)(params, xb)
    assert np.abs(np.asarray(y1 - y0)).max() < 1e-4
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert np.abs(np.asarray(a - b)).max() < 1e-3


@pytest.mark.slow  # kb streaming tier, 3 backward strategies (~11s CPU)
def test_kb_streaming_fourier(x):
    """K-blocked streaming tier, fourier: the interleaved slice order keeps
    local parity == global parity; dw is un-permuted back to the
    [cos..., sin...] layout."""
    from kanvit.kernels import fused_basis as FB

    G, gb, bn = 3, 2, 8
    ng = 2 * G
    w3d = jax.random.normal(jax.random.PRNGKey(23), (ng, IN, OUT)) * 0.1
    fam = FB.fourier_family_kb(G)
    perm = FB._fourier_interleave(G)
    hk = FB._fourier_hk(G)
    specs = (FB._smem_spec(hk),)
    axes = (1,)

    def ref(x, w3d):  # [cos 1..G | sin 1..G] slice order
        ks = jnp.arange(1, G + 1.0)
        b = jnp.concatenate(
            [jnp.cos(x[:, :, None] * ks), jnp.sin(x[:, :, None] * ks)], axis=2
        )  # (N, in, 2G)
        return jnp.einsum("nig,gio->no", b.transpose(0, 1, 2), w3d)

    y = FB._fused_fwd_kb(x, w3d[perm], (hk,), specs, axes, fam, gb, bn)
    assert np.abs(np.asarray(y - ref(x, w3d))).max() < 1e-5

    g = jax.random.normal(jax.random.PRNGKey(24), (N, OUT)) * 0.5
    dx, dwi = FB._fused_bwd_kb(x, w3d[perm], g, (hk,), specs, axes, fam, gb,
                               bn, bn)
    dw = dwi[jnp.argsort(perm)]
    rx, rw = jax.grad(
        lambda x, w: (ref(x, w) * g).sum(), argnums=(0, 1)
    )(x, w3d)
    assert np.abs(np.asarray(dx - rx)).max() < 1e-4
    assert np.abs(np.asarray(dw - rw)).max() < 1e-4

    # Harmonic-recurrence kernels (recur=True): cos/sin(kx) built by angle
    # addition from one direct cos/sin(x) pair — must match the direct
    # evaluation to recurrence-drift precision.
    yr = FB._fused_fwd_kb(x, w3d[perm], (hk,), specs, axes, fam, gb, bn,
                          recur=True)
    assert np.abs(np.asarray(yr - ref(x, w3d))).max() < 1e-5
    dxr, dwir = FB._fused_bwd_kb(x, w3d[perm], g, (hk,), specs, axes, fam,
                                 gb, bn, bn, recur=True)
    dwr = dwir[jnp.argsort(perm)]
    assert np.abs(np.asarray(dxr - rx)).max() < 1e-4
    assert np.abs(np.asarray(dwr - rw)).max() < 1e-4

    # Decoupled dw slab (gb_dw != gb, even for parity): both the direct
    # and recurrence dw kernels must match at a wider slab.
    for rec in (False, True):
        dx4, dwi4 = FB._fused_bwd_kb(x, w3d[perm], g, (hk,), specs, axes,
                                     fam, gb, bn, bn, recur=rec, gb_dw=ng)
        dw4 = dwi4[jnp.argsort(perm)]
        assert np.abs(np.asarray(dx4 - rx)).max() < 1e-4
        assert np.abs(np.asarray(dw4 - rw)).max() < 1e-4


def test_kb_strategy_engages_at_mapper_shapes():
    """Dispatch: the ViT-S sine/fourier grid-28 mappers route to the kb
    tier (weight exceeds the resident tiers); the in-MSA grid-4 projections
    do not."""
    from kanvit.kernels import fused_basis as FB

    xm = jnp.zeros((50176, 768), jnp.bfloat16)
    wm = jnp.zeros((28, 768, 384), jnp.bfloat16)
    assert FB._kb_strategy(xm, wm) is not None
    wf = jnp.zeros((56, 768, 384), jnp.bfloat16)
    kbf = FB._kb_strategy(xm, wf, pair=True)
    assert kbf is not None
    assert kbf[0] % 2 == 0              # fourier parity needs even gb
    assert kbf[4] % 2 == 0              # ... and even gb_dw
    assert min(kbf[1:4]) >= 32          # per-kernel row blocks
    xs = jnp.zeros((50176, 128), jnp.bfloat16)
    ws = jnp.zeros((4, 128, 256), jnp.bfloat16)
    assert FB._kb_strategy(xs, ws) is None
    assert FB._kb_eligible(768, 28, 384, jnp.bfloat16, jnp.bfloat16)


def test_kb_wide_out_relaxed_picks():
    """Wide-out mappers (ViT-B/L, out >= 768): the relaxed retry must give
    the EXECUTION tier a pick (forced-pallas otherwise falls to the
    out-blocked per-slab transcendental recompute, 118.6 vs 57.4 ms at
    out=768), fourier must advertise it to the auto DISPATCH (kb wins
    43.5 vs 74.5 ms there), and sine must NOT (kb measures ~5% behind XLA
    at wide out — tools/tpu_probe_kb_wide.py)."""
    from kanvit.kernels import fused_basis as FB

    bf = jnp.bfloat16
    for out, n in ((768, 25088), (1024, 12544)):
        x = jnp.zeros((n, 768), bf)
        ws = jnp.zeros((28, 768, out), bf)
        wf = jnp.zeros((56, 768, out), bf)
        kbs = FB._kb_strategy(x, ws, sine=True)
        kbf = FB._kb_strategy(x, wf, pair=True, recur=True)
        assert kbs is not None and kbf is not None, out
        assert min(kbs[1:4]) >= 32 and min(kbf[1:4]) >= 32, out
        assert kbf[0] % 2 == 0 and kbf[4] % 2 == 0, out
        assert 28 % kbs[4] == 0 and 56 % kbf[4] == 0, out
        assert FB._kb_eligible(768, 56, out, bf, bf, pair=True, recur=True)
        assert not FB._kb_eligible(768, 28, out, bf, bf, sine=True)
    # The ViT-S joint-fit shapes are untouched by the relaxed branch:
    # sine stays auto-eligible at out=384.
    assert FB._kb_eligible(768, 28, 384, bf, bf, sine=True)


def test_kb_sine_dw_slab_divides_grid():
    """Regression: the sine dw-slab candidates (4, 2) must be filtered by
    ng-divisibility — a grid-6 sine mapper at kb scale used to pick
    gb_dw=4, leaving ng %% 4 tail dw rows unwritten and crashing the
    (1, ng) dfreq reshape at trace time."""
    from kanvit.kernels import fused_basis as FB

    xm = jnp.zeros((50176, 768), jnp.bfloat16)
    for ng in (6, 10, 12, 14, 28):
        wm = jnp.zeros((ng, 768, 384), jnp.bfloat16)
        kb = FB._kb_strategy(xm, wm, sine=True)
        assert kb is not None, ng
        assert ng % kb[4] == 0, (ng, kb[4])


def test_sg_gate_amortizes_over_heads(monkeypatch):
    """The slot-grouped qkv gate must amortize fixed launch costs over rows
    x heads, not rows alone (the round-4 ViT-B regression: 25,216 rows at
    12 heads fell back to jnp where Pallas wins 29/32 crossover cells,
    benchmarks/sg_crossover_probe.json)."""
    from kanvit.kernels import fused_basis as FB
    from kanvit.ops import dispatch

    # Forced impls win regardless of shape.
    monkeypatch.setattr(dispatch, "_impl", "pallas")
    assert FB._should_fuse_sg(8, 2)
    monkeypatch.setattr(dispatch, "_impl", "jnp")
    assert not FB._should_fuse_sg(10**9, 16)

    # Auto on a non-TPU backend never fuses.
    monkeypatch.setattr(dispatch, "_impl", "auto")
    assert not FB._should_fuse_sg(10**9, 16)

    # Auto on TPU: the head-rows floor decides.
    monkeypatch.setattr(dispatch, "use_pallas", lambda: True)
    assert FB._should_fuse_sg(128 * 197, 12)     # ViT-B batch 128
    assert FB._should_fuse_sg(256 * 197, 6)      # ViT-S batch 256
    assert not FB._should_fuse_sg(128 * 50, 2)   # reference MNIST ctor
    assert not FB._should_fuse_sg(1576, 12)      # below the 32768 floor


def test_fused_cheby(x):
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(7)
    cc = jax.random.normal(key, (IN, OUT, 5)) * 0.05
    f_pal = lambda x, c: FB.chebykan(x, c)
    f_ref = lambda x, c: K.chebykan_forward(x, c)
    assert np.abs(np.asarray(f_pal(x, cc) - f_ref(x, cc))).max() < 1e-5
    _check_grads(f_pal, f_ref, (x, cc))


@pytest.mark.slow  # mask-path grads in interpret mode (~11s CPU); small-path test also covers masks
def test_flash_attention_kernel_masked():
    from kanvit.kernels.flash_attention import flash_attention

    key = jax.random.PRNGKey(8)
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (2, 2, 20, 8))
    k = jax.random.normal(kk, (2, 2, 24, 8))
    v = jax.random.normal(kv, (2, 2, 24, 8))
    mask = jax.random.uniform(km, (2, 24)) > 0.3
    o = flash_attention(q, k, v, False, 16, 16, mask=mask)
    ref, _ = flash_attention_reference(q, k, v, False, 16, 16, mask=mask)
    assert np.abs(np.asarray(o - ref)).max() < 1e-5
    # grads through the mask path
    f_pal = lambda q, k, v: (flash_attention(q, k, v, False, 16, 16, mask=mask) ** 2).sum()
    f_ref = lambda q, k, v: (
        flash_attention_reference(q, k, v, False, 16, 16, mask=mask)[0] ** 2
    ).sum()
    gp = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        assert np.abs(np.asarray(a - b)).max() < 1e-4


def test_flash_attention_kernel_bf16_inputs():
    """bf16 q/k/v: f32 softmax math, bf16 MXU operands, returns bf16."""
    from kanvit.kernels.flash_attention import flash_attention

    key = jax.random.PRNGKey(9)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 20, 8), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 2, 20, 8), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 2, 20, 8), jnp.bfloat16)
    o = flash_attention(q, k, v, False, 16, 16)
    assert o.dtype == jnp.bfloat16
    ref, _ = flash_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        False, 16, 16,
    )
    assert np.abs(np.asarray(o, np.float32) - np.asarray(ref)).max() < 2e-2


def test_fused_bspline_bf16_inputs(x):
    from kanvit.kernels import fused_basis as FB

    key = jax.random.PRNGKey(10)
    k1, k2, k3 = jax.random.split(key, 3)
    grid = K.make_bspline_grid(IN, 5, 3)
    bw = (jax.random.normal(k1, (OUT, IN)) * 0.1).astype(jnp.bfloat16)
    sw = (jax.random.normal(k2, (OUT, IN, 8)) * 0.1).astype(jnp.bfloat16)
    sc = (jax.random.normal(k3, (OUT, IN)) * 0.1).astype(jnp.bfloat16)
    xb = x.astype(jnp.bfloat16)
    y = FB.bspline_kan(xb, grid, bw, sw, sc, 3)
    assert y.dtype == jnp.bfloat16
    ref = K.bspline_kan_forward(
        x, grid, bw.astype(jnp.float32), sw.astype(jnp.float32),
        sc.astype(jnp.float32), 3,
    )
    assert np.abs(np.asarray(y, np.float32) - np.asarray(ref)).max() < 2e-2


@pytest.mark.slow  # out-blocked tier at embedder width (~18s CPU)
def test_fused_bspline_wide_embedder_out_blocked():
    """At (in=768, out=384) the full (F, out) weight exceeds the VMEM
    budget: fwd and bwd must route through the out-blocked kernels (grid
    over (out_blocks, row_blocks), partial-dx reduction) — matching ground
    truth. Extreme widths where even one out slab cannot fit still degrade
    to the XLA fallbacks."""
    from kanvit.kernels import fused_basis as FB

    # The ViT-S embedder shape: plain kernel can't fit; fwd goes out-blocked
    # in both dtypes, bwd goes out-blocked under the bf16 dot policy and
    # falls back to XLA in f32 (the f32 weight slab + f32 dw block leave no
    # VMEM for rows).
    assert FB._pick_row_block(768, 384, 8, 2) < 32
    assert FB._pick_out_block(768, 384, 8, n_temps=4, w_bytes=4) is not None
    assert FB._pick_out_block(768, 384, 8, n_temps=4, w_bytes=2) is not None
    assert FB._pick_out_block(
        768, 384, 8, n_temps=5, w_bytes=2, with_dw=True
    ) is not None

    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    IN_W, OUT_W = 768, 384
    x = jax.random.normal(k1, (64, IN_W)) * 0.5
    grid = K.make_bspline_grid(IN_W, 5, 3)
    bw = jax.random.normal(k2, (OUT_W, IN_W)) * 0.02
    sw = jax.random.normal(k3, (OUT_W, IN_W, 8)) * 0.02
    sc = jax.random.normal(k4, (OUT_W, IN_W)) * 0.02
    f_pal = lambda x, bw, sw, sc: FB.bspline_kan(x, grid, bw, sw, sc, 3)
    f_ref = lambda x, bw, sw, sc: K.bspline_kan_forward(x, grid, bw, sw, sc, 3)
    y_pal, y_ref = f_pal(x, bw, sw, sc), f_ref(x, bw, sw, sc)
    assert np.abs(np.asarray(y_pal - y_ref)).max() < 1e-4
    gp = jax.grad(lambda *a: (f_pal(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(x, bw, sw, sc)
    gr = jax.grad(lambda *a: (f_ref(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(x, bw, sw, sc)
    for a, b in zip(gp, gr):
        assert np.abs(np.asarray(a - b)).max() < 1e-3


@pytest.mark.slow  # split-residual tier at embedder width (~16s CPU)
def test_fused_bspline_wide_split_backward():
    """Under the bf16 dot policy the wide-embedder backward routes through
    the SPLIT strategy (forward emits the basis residual to HBM, dx is a
    weight-resident Pallas kernel, dw is one XLA matmul) with the base
    branch folded in — matching ground truth."""
    from kanvit.kernels import fused_basis as FB

    # n >= 1024 + bf16 weight residency is what admits the split tier.
    assert FB._bwd_strategy(1024, 768, 9, 384, 2, 2, 2) == "split"

    key = jax.random.PRNGKey(12)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    IN_W, OUT_W = 768, 384
    dt = jnp.bfloat16
    x = (jax.random.normal(k1, (1024, IN_W)) * 0.5).astype(dt)
    grid = K.make_bspline_grid(IN_W, 5, 3)
    bw = (jax.random.normal(k2, (OUT_W, IN_W)) * 0.02).astype(dt)
    sw = (jax.random.normal(k3, (OUT_W, IN_W, 8)) * 0.02).astype(dt)
    sc = (jax.random.normal(k4, (OUT_W, IN_W)) * 0.02).astype(dt)
    f32 = lambda a: a.astype(jnp.float32)
    f_pal = lambda x, bw, sw, sc: FB.bspline_kan(x, grid, bw, sw, sc, 3)
    f_ref = lambda x, bw, sw, sc: K.bspline_kan_forward(
        f32(x), grid, f32(bw), f32(sw), f32(sc), 3
    )
    y_pal = f32(f_pal(x, bw, sw, sc))
    y_ref = f_ref(x, bw, sw, sc)
    assert np.abs(np.asarray(y_pal - y_ref)).max() < 5e-2  # bf16 dot noise
    gp = jax.grad(
        lambda *a: (f32(f_pal(*a)) ** 2).sum(), argnums=(1, 2, 3)
    )(x, bw, sw, sc)
    gr = jax.grad(
        lambda *a: (f_ref(*a) ** 2).sum(), argnums=(1, 2, 3)
    )(x, bw, sw, sc)
    for a, b in zip(gp, gr):
        denom = max(1.0, float(np.abs(np.asarray(b)).max()))
        assert np.abs(np.asarray(f32(a) - b)).max() / denom < 5e-2
