"""Pure-JAX forward math for the five KAN basis families.

Every KAN variant in the reference follows one pattern: *expand* the input
into a basis tensor, then *contract* it against a weight tensor (see
SURVEY.md §3.4). These functions are the ground truth; the fused Pallas
kernels in ``kanvit.kernels.fused_basis`` compute the same expand+contract in
a single HBM pass and are tested against these.

Math sources (behavioral spec, re-derived — not translated code):

- B-spline (efficient-kan): reference ``models/effkan.py:99-132,174-187``
- Gaussian RBF (fast-kan):   reference ``models/fastkan.py:15-76``
- Sine (SineKAN):            reference ``models/sinekan.py:81-91``
- Fourier (NaiveFourierKAN): reference ``models/nfkan.py:36-52``
- Chebyshev (ChebyKAN):      reference ``models/cheby.py:36-48``

Shape-behavior note: the reference's ChebyKANLayer collapses leading dims
(``cheby.py:47``), which crashes the ``cheby`` ViT variant as shipped
(SURVEY §2.9.1). All forwards here are shape-preserving over leading dims —
a documented, intentional repair.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# B-spline (efficient-kan)
# ---------------------------------------------------------------------------

def make_bspline_grid(
    in_features: int,
    grid_size: int = 5,
    spline_order: int = 3,
    grid_range=(-1.0, 1.0),
) -> jnp.ndarray:
    """Uniform knot grid ``(in, grid_size + 2*spline_order + 1)``.

    Matches reference ``models/effkan.py:44-53``: ``spline_order`` padding
    knots on each side, spacing ``h = (r1 - r0) / grid_size``.
    """
    h = (grid_range[1] - grid_range[0]) / grid_size
    pts = (
        jnp.arange(-spline_order, grid_size + spline_order + 1, dtype=jnp.float32)
        * h
        + grid_range[0]
    )
    return jnp.broadcast_to(pts, (in_features, pts.shape[0]))


def bspline_bases(x: jnp.ndarray, grid: jnp.ndarray, spline_order: int = 3) -> jnp.ndarray:
    """Cox–de Boor B-spline bases.

    ``x``: ``(N, in)``; ``grid``: ``(in, grid_size + 2*order + 1)``.
    Returns ``(N, in, grid_size + order)``.

    Same recursion as reference ``models/effkan.py:115-125``: order-0
    indicator functions refined ``spline_order`` times. The loop is a static
    Python unroll (order is tiny and fixed) so XLA sees straight-line code.
    """
    xe = x[..., None]  # (N, in, 1)
    bases = ((xe >= grid[:, :-1]) & (xe < grid[:, 1:])).astype(x.dtype)
    for k in range(1, spline_order + 1):
        left = (xe - grid[:, : -(k + 1)]) / (grid[:, k:-1] - grid[:, : -(k + 1)])
        right = (grid[:, k + 1 :] - xe) / (grid[:, k + 1 :] - grid[:, 1:-k])
        bases = left * bases[..., :-1] + right * bases[..., 1:]
    return bases


def bspline_kan_forward(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    base_weight: jnp.ndarray,
    spline_weight: jnp.ndarray,
    spline_scaler: jnp.ndarray | None,
    spline_order: int = 3,
) -> jnp.ndarray:
    """efficient-kan ``KANLinear`` forward (reference ``effkan.py:174-187``).

    ``base_weight``: ``(out, in)``; ``spline_weight``: ``(out, in, K)`` with
    ``K = grid_size + spline_order``; optional ``spline_scaler``: ``(out, in)``.
    Output = ``silu(x) @ Wb.T + bases(x).reshape(N, in*K) @ Ws.reshape(out, -1).T``.
    Shape-preserving over leading dims.
    """
    lead = x.shape[:-1]
    in_features = x.shape[-1]
    xf = x.reshape(-1, in_features)
    out_features = base_weight.shape[0]

    base = jax.nn.silu(xf) @ base_weight.T
    if spline_scaler is not None:
        scaled = spline_weight * spline_scaler[..., None]
    else:
        scaled = spline_weight
    bases = bspline_bases(xf, grid, spline_order)  # (N, in, K)
    spline = bases.reshape(xf.shape[0], -1) @ scaled.reshape(out_features, -1).T
    return (base + spline).reshape(*lead, out_features)


def bspline_bases_and_grad(
    x: jnp.ndarray, grid: jnp.ndarray, spline_order: int = 3
):
    """B-spline bases and their x-derivative via the recurrence.

    Differentiating the Cox–de Boor refinement (the same recursion as
    :func:`bspline_bases`): ``B_k = w1 * B_{k-1}[:-1] + w2 * B_{k-1}[1:]``
    gives ``B_k' = w1' * B_{k-1}[:-1] + w1 * B_{k-1}'[:-1] + w2' * B_{k-1}[1:]
    + w2 * B_{k-1}'[1:]`` with ``w1' = 1/(g[k:-1] - g[:-(k+1)])`` and
    ``w2' = -1/(g[k+1:] - g[1:-k])``; the order-0 derivative is 0 a.e.
    Used by the fused Pallas kernel's hand-derived VJP.
    """
    xe = x[..., None]
    bases = ((xe >= grid[:, :-1]) & (xe < grid[:, 1:])).astype(x.dtype)
    dbases = jnp.zeros_like(bases)
    for k in range(1, spline_order + 1):
        inv1 = 1.0 / (grid[:, k:-1] - grid[:, : -(k + 1)])
        inv2 = 1.0 / (grid[:, k + 1 :] - grid[:, 1:-k])
        w1 = (xe - grid[:, : -(k + 1)]) * inv1
        w2 = (grid[:, k + 1 :] - xe) * inv2
        dbases = (
            inv1 * bases[..., :-1]
            + w1 * dbases[..., :-1]
            - inv2 * bases[..., 1:]
            + w2 * dbases[..., 1:]
        )
        bases = w1 * bases[..., :-1] + w2 * bases[..., 1:]
    return bases, dbases


def bspline_curve2coeff(
    x: jnp.ndarray, y: jnp.ndarray, grid: jnp.ndarray, spline_order: int = 3
) -> jnp.ndarray:
    """Least-squares fit of spline coefficients to points.

    ``x``: ``(batch, in)``; ``y``: ``(batch, in, out)``. Returns
    ``(out, in, grid_size + order)``. Per-input-feature lstsq exactly as
    reference ``effkan.py:134-164`` (used for init and grid refits); here the
    per-feature solves are a single vmapped batched lstsq.
    """
    bases = bspline_bases(x, grid, spline_order)  # (batch, in, K)
    a = bases.transpose(1, 0, 2)  # (in, batch, K)
    b = y.transpose(1, 0, 2)  # (in, batch, out)
    sol = jax.vmap(lambda ai, bi: jnp.linalg.lstsq(ai, bi)[0])(a, b)  # (in, K, out)
    return sol.transpose(2, 0, 1)


def bspline_update_grid(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    spline_weight: jnp.ndarray,
    spline_scaler: jnp.ndarray | None,
    grid_size: int,
    spline_order: int = 3,
    grid_eps: float = 0.02,
    margin: float = 0.01,
):
    """Adaptive grid refit — functional equivalent of ``effkan.py:189-242``.

    The reference defines this but never calls it (SURVEY §2.9.8); it is kept
    as a first-class capability. Returns ``(new_grid, new_spline_weight)``;
    callers thread them through their train state explicitly (JAX has no
    in-place buffers).
    """
    batch = x.shape[0]
    scaled = (
        spline_weight * spline_scaler[..., None]
        if spline_scaler is not None
        else spline_weight
    )
    splines = bspline_bases(x, grid, spline_order).transpose(1, 0, 2)  # (in, B, K)
    coeff = scaled.transpose(1, 2, 0)  # (in, K, out)
    unreduced = jnp.einsum("ibk,iko->bio", splines, coeff)  # (B, in, out)

    x_sorted = jnp.sort(x, axis=0)
    idx = jnp.linspace(0, batch - 1, grid_size + 1).astype(jnp.int32)
    grid_adaptive = x_sorted[idx]
    uniform_step = (x_sorted[-1] - x_sorted[0] + 2 * margin) / grid_size
    grid_uniform = (
        jnp.arange(grid_size + 1, dtype=x.dtype)[:, None] * uniform_step
        + x_sorted[0]
        - margin
    )
    new_grid = grid_eps * grid_uniform + (1 - grid_eps) * grid_adaptive
    new_grid = jnp.concatenate(
        [
            new_grid[:1] - uniform_step * jnp.arange(spline_order, 0, -1)[:, None],
            new_grid,
            new_grid[-1:] + uniform_step * jnp.arange(1, spline_order + 1)[:, None],
        ],
        axis=0,
    ).T  # (in, grid_size + 2*order + 1)
    new_weight = bspline_curve2coeff(x, unreduced, new_grid, spline_order)
    return new_grid, new_weight


def bspline_regularization_loss(
    spline_weight: jnp.ndarray,
    regularize_activation: float = 1.0,
    regularize_entropy: float = 1.0,
) -> jnp.ndarray:
    """L1 + entropy regularizer over spline weights (``effkan.py:244-264``)."""
    l1_fake = jnp.mean(jnp.abs(spline_weight), axis=-1)
    reg_act = jnp.sum(l1_fake)
    p = l1_fake / reg_act
    reg_ent = -jnp.sum(p * jnp.log(p))
    return regularize_activation * reg_act + regularize_entropy * reg_ent


# ---------------------------------------------------------------------------
# Gaussian RBF (fast-kan)
# ---------------------------------------------------------------------------

def rbf_bases(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    denominator: float,
) -> jnp.ndarray:
    """``exp(-((x[..., None] - grid) / denominator)**2)``.

    Reference ``models/fastkan.py:29-30``. ``grid``: ``(num_grids,)``.
    """
    return jnp.exp(-(((x[..., None] - grid) / denominator) ** 2))


def layernorm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def ffn_pre_ln(x, gamma, beta, w1, b1, w2, b2):
    """Pre-LN transformer feed-forward (reference ``model.py:14-37``):
    ``x + W2 @ relu(W1 @ LN(x) + b1) + b2``, torch-convention ``(out, in)``
    weights, LN eps 1e-5. Ground truth for ``kernels/fused_ffn``."""
    h = layernorm(x, gamma, beta)
    h = jax.nn.relu(h @ w1.T + b1)
    return x + (h @ w2.T + b2)


def fastkan_forward(
    x: jnp.ndarray,
    ln_gamma: jnp.ndarray,
    ln_beta: jnp.ndarray,
    rbf_grid: jnp.ndarray,
    rbf_denominator: float,
    spline_weight: jnp.ndarray,
    base_weight: jnp.ndarray | None,
    base_bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """fast-kan ``FastKANLayer`` forward (reference ``fastkan.py:66-76``).

    LayerNorm (inside the layer, a fast-kan signature move) → RBF expansion →
    flatten → ``spline_weight (out, in*num_grids)`` matmul; plus base branch
    ``silu(x) @ base_weight.T + base_bias`` when enabled. ``ln_gamma=None``
    skips the layernorm (the reference's ``time_benchmark`` flag,
    ``fastkan.py:66-70``).
    """
    lead = x.shape[:-1]
    in_features = x.shape[-1]
    xf = x.reshape(-1, in_features)
    num_grids = rbf_grid.shape[0]
    out_features = spline_weight.shape[0]

    ln = xf if ln_gamma is None else layernorm(xf, ln_gamma, ln_beta)
    basis = rbf_bases(ln, rbf_grid, rbf_denominator)  # (N, in, G)
    ret = basis.reshape(-1, in_features * num_grids) @ spline_weight.T
    if base_weight is not None:
        ret = ret + jax.nn.silu(xf) @ base_weight.T + base_bias
    return ret.reshape(*lead, out_features)


def rbf_bases_and_grad(x: jnp.ndarray, grid: jnp.ndarray, denominator: float):
    """RBF bases and x-derivative: ``d/dx exp(-u^2) = -2u/denom * exp(-u^2)``."""
    u = (x[..., None] - grid) / denominator
    b = jnp.exp(-(u**2))
    return b, (-2.0 / denominator) * u * b


# ---------------------------------------------------------------------------
# Sine (SineKAN)
# ---------------------------------------------------------------------------

def sine_bases(x: jnp.ndarray, freq: jnp.ndarray, phase: jnp.ndarray) -> jnp.ndarray:
    """``sin(x[..., None] * freq + phase)``.

    Reference ``models/sinekan.py:85-86``. ``freq``: ``(grid,)`` (broadcast
    over inputs), ``phase``: ``(in, grid)``. Returns ``(..., in, grid)``.
    """
    return jnp.sin(x[..., None] * freq + phase)


def sine_bases_and_grad(x: jnp.ndarray, freq: jnp.ndarray, phase: jnp.ndarray):
    """Sine bases plus derivatives w.r.t. x and (per-harmonic) freq.

    ``b = sin(x f + p)``; ``db/dx = f cos(x f + p)``;
    ``db/df = x cos(x f + p)`` (freq is trainable in the reference,
    ``sinekan.py:65-70``).
    """
    arg = x[..., None] * freq + phase
    c = jnp.cos(arg)
    return jnp.sin(arg), freq * c, x[..., None] * c


def sinekan_forward(
    x: jnp.ndarray,
    freq: jnp.ndarray,
    phase: jnp.ndarray,
    amplitudes: jnp.ndarray,
    bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """SineKAN forward (reference ``sinekan.py:81-91``).

    ``amplitudes``: ``(out, in, grid)``. The reference's
    ``einsum('ijkl,jkl->ij')`` (with its size-1 axis broadcast, SURVEY §2.7)
    is exactly a flattened matmul: ``sin_basis.reshape(N, in*grid) @
    amplitudes.reshape(out, in*grid).T``.
    """
    lead = x.shape[:-1]
    in_features = x.shape[-1]
    grid = freq.shape[-1]
    out_features = amplitudes.shape[0]
    xf = x.reshape(-1, in_features)

    s = sine_bases(xf, freq, phase)  # (N, in, grid)
    y = s.reshape(-1, in_features * grid) @ amplitudes.reshape(out_features, -1).T
    if bias is not None:
        y = y + bias
    return y.reshape(*lead, out_features)


def sinekan_phase_init(input_dim: int, grid_size: int) -> jnp.ndarray:
    """Replicates the SineKAN phase-buffer construction.

    Reference ``sinekan.py:59-75``: ``grid_phase + input_phase`` passed through
    ``grid_size - 1`` geometric damping steps ``phase *= A*i**(-K) + C``.
    Returns ``(input_dim, grid_size)`` float32.
    """
    import numpy as np

    A, K, C = 0.9724108095811765, 0.9884401790754128, 0.999449553483052
    grid_phase = np.arange(1, grid_size + 1, dtype=np.float64) / (grid_size + 1)
    input_phase = np.linspace(0, np.pi, input_dim)
    phase = grid_phase[None, :] + input_phase[:, None]
    for i in range(1, grid_size):
        phase = (A * i ** (-K) + C) * phase
    return jnp.asarray(phase, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# Fourier (NaiveFourierKAN)
# ---------------------------------------------------------------------------

def fourier_bases(x: jnp.ndarray, grid_size: int) -> jnp.ndarray:
    """``concat([cos(k x), sin(k x)], axis=-1)`` for ``k = 1..grid_size``.

    Reference ``models/nfkan.py:40-48`` computes the cos and sin expansions
    separately and contracts each against half of a ``(2, out, in, grid)``
    coefficient tensor; concatenating along the basis axis makes the whole
    layer one ``(N, in*2*grid) @ (in*2*grid, out)`` MXU matmul instead of the
    reference's materialized ``(N, out, in, grid)`` broadcast (its memory hot
    spot, SURVEY §3.4). Returns ``(..., in, 2*grid)``.
    """
    k = jnp.arange(1, grid_size + 1, dtype=x.dtype)
    kx = x[..., None] * k
    return jnp.concatenate([jnp.cos(kx), jnp.sin(kx)], axis=-1)


def fourier_bases_and_grad(x: jnp.ndarray, grid_size: int):
    """Fourier bases and x-derivative: ``d cos(kx) = -k sin(kx)``,
    ``d sin(kx) = k cos(kx)`` (concat layout matching :func:`fourier_bases`)."""
    k = jnp.arange(1, grid_size + 1, dtype=x.dtype)
    kx = x[..., None] * k
    c, s = jnp.cos(kx), jnp.sin(kx)
    b = jnp.concatenate([c, s], axis=-1)
    db = jnp.concatenate([-k * s, k * c], axis=-1)
    return b, db


def fourierkan_forward(
    x: jnp.ndarray,
    coeffs: jnp.ndarray,
    bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """NaiveFourierKAN forward (reference ``nfkan.py:36-52``).

    ``coeffs``: ``(2, out, in, grid)`` — ``coeffs[0]`` weights the cos terms,
    ``coeffs[1]`` the sin terms. Shape-preserving over leading dims (the
    reference preserves them too, ``nfkan.py:38,51``).
    """
    lead = x.shape[:-1]
    in_features = x.shape[-1]
    _, out_features, _, grid_size = coeffs.shape
    xf = x.reshape(-1, in_features)

    basis = fourier_bases(xf, grid_size)  # (N, in, 2*grid)
    # (2, out, in, grid) -> (out, in, 2*grid) matching the concat order
    w = jnp.concatenate([coeffs[0], coeffs[1]], axis=-1)
    y = basis.reshape(-1, in_features * 2 * grid_size) @ w.reshape(out_features, -1).T
    if bias is not None:
        y = y + bias
    return y.reshape(*lead, out_features)


# ---------------------------------------------------------------------------
# Chebyshev (ChebyKAN)
# ---------------------------------------------------------------------------

def cheby_bases(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Chebyshev polynomials ``T_0..T_degree`` of ``tanh(x)``.

    Reference ``models/cheby.py:36-43`` uses the trig identity
    ``T_n(t) = cos(n * acos(t))`` on ``t = tanh(x)``. Returns
    ``(..., in, degree+1)``.
    """
    t = jnp.tanh(x)
    n = jnp.arange(degree + 1, dtype=x.dtype)
    return jnp.cos(n * jnp.arccos(t)[..., None])


def cheby_bases_and_grad(x: jnp.ndarray, degree: int):
    """Chebyshev bases of ``t = tanh(x)`` and x-derivative.

    ``d/dx cos(n acos(t)) = n sin(n acos(t)) / sqrt(1 - t^2) * (1 - t^2)
    = n sin(n acos(t)) * sqrt(1 - t^2)`` — closed form, finite at |t| -> 1
    (unlike autodiff through acos).
    """
    t = jnp.tanh(x)
    n = jnp.arange(degree + 1, dtype=x.dtype)
    theta = jnp.arccos(t)[..., None]
    b = jnp.cos(n * theta)
    db = n * jnp.sin(n * theta) * jnp.sqrt(jnp.clip(1.0 - t * t, 0.0, None))[..., None]
    return b, db


def chebykan_forward(x: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """ChebyKAN forward (reference ``cheby.py:36-48``).

    ``coeffs``: ``(in, out, degree+1)``. The reference collapses leading dims
    on output (``cheby.py:47``) which crashes the ViT variant (SURVEY §2.9.1);
    here the output is shape-preserving — intentional repair, same math.
    """
    lead = x.shape[:-1]
    in_features, out_features, deg1 = coeffs.shape
    xf = x.reshape(-1, in_features)

    basis = cheby_bases(xf, deg1 - 1)  # (N, in, deg+1)
    # einsum('bid,iod->bo') == flattened matmul over (in, deg+1)
    w = coeffs.transpose(1, 0, 2).reshape(out_features, -1)  # (out, in*(deg+1))
    y = basis.reshape(-1, in_features * deg1) @ w.T
    return y.reshape(*lead, out_features)
