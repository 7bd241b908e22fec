"""flax.linen KAN layers — five basis families + a torch-convention Linear.

Each layer is a thin parameter container over the pure functions in
``kanvit.ops.kan_bases`` (or the fused Pallas kernels in
``kanvit.kernels.fused_basis`` when dispatch selects them). Parameter shapes
and init distributions match the PyTorch reference 1:1 so reference
checkpoints load directly (``kanvit.utils.torch_compat``).

All layers map ``(..., in_features) -> (..., out_features)`` preserving
leading dims (the reference's ChebyKANLayer does not — documented repair of
SURVEY §2.9.1).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from kanvit.ops import kan_bases as K
from kanvit.utils import torch_init as tinit


class TorchLinear(nn.Module):
    """Dense layer with torch conventions: weight ``(out, in)``,
    kaiming-uniform(a=sqrt(5)) weight init, U(+-1/sqrt(fan_in)) bias init.
    Equivalent of the reference's ``nn.Linear`` usages."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            tinit.linear_default_weight(),
            (self.out_features, self.in_features),
        )
        b = (
            self.param(
                "bias",
                tinit.linear_default_bias(self.in_features),
                (self.out_features,),
            )
            if self.use_bias
            else None
        )
        # int8 serving mode (kanvit.ops.quant): forward-only programs traced
        # under int8_serving() run this dot W8A8 on the int8 MXU path —
        # the XLA qdot with a calibrated STATIC activation scale when one
        # exists for this layer (quant.calibrating() captures amax during
        # eager float passes), else a dynamic per-call scale. The fused
        # Pallas kernel (kanvit.kernels.int8_matmul: per-row quantization
        # in-register, bias in the epilogue) measured NEGATIVE — Mosaic's
        # int8 dot rate trails XLA's — and is opt-in (KANVIT_INT8_KERNEL=1
        # or forced-pallas dispatch).
        from kanvit.ops import quant

        if quant.int8_enabled() and not self.is_initializing():
            from kanvit.kernels.int8_matmul import int8_linear

            y = int8_linear(x, w, bias=b)
            if y is not None:
                return y
            path = "/".join(str(p) for p in self.scope.path)
            y = quant.qdot(x, w, static_scale=quant.static_scale_for(path))
        else:
            if quant.calibrate_enabled() and not self.is_initializing():
                # jit-compatible amax capture into a mutable collection;
                # reduced host-side by quant.amax_from_mutable.
                self.sow("quant_amax", "amax",
                         jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = x @ w.T
        if b is not None:
            y = y + b
        return y


class KANLinear(nn.Module):
    """efficient-kan B-spline KAN layer (reference ``models/effkan.py:8-97``).

    Params: ``base_weight (out, in)``, ``spline_weight (out, in, G+k)``,
    ``spline_scaler (out, in)`` (when standalone scaling is enabled).
    The knot grid is a deterministic constant (the reference's ``update_grid``
    is never called; the functional equivalent lives at
    ``kanvit.ops.kan_bases.bspline_update_grid`` for callers who thread grids
    through their own state).
    """

    in_features: int
    out_features: int
    grid_size: int = 5
    spline_order: int = 3
    scale_noise: float = 0.1
    scale_base: float = 1.0
    scale_spline: float = 1.0
    enable_standalone_scale_spline: bool = True
    grid_range: tuple = (-1.0, 1.0)
    # Adaptive grids (reference ``update_grid``, effkan.py:189-242): when
    # True the knot grid lives in the param tree (excluded from optimizer
    # updates by ``create_train_state``'s mask) so the trainer's periodic
    # ``make_update_grid_step`` can refit it from live activations.
    stateful_grid: bool = False

    def setup(self):
        if self.stateful_grid:
            self.grid = self.param(
                "grid",
                lambda key, shape, dtype=jnp.float32: K.make_bspline_grid(
                    self.in_features, self.grid_size, self.spline_order,
                    self.grid_range,
                ).astype(dtype),
                (self.in_features,
                 self.grid_size + 2 * self.spline_order + 1),
            )
        else:
            self.grid = K.make_bspline_grid(
                self.in_features, self.grid_size, self.spline_order, self.grid_range
            )
        self.base_weight = self.param(
            "base_weight",
            tinit.kaiming_uniform(math.sqrt(5.0) * self.scale_base),
            (self.out_features, self.in_features),
        )

        def spline_init(key, shape, dtype=jnp.float32):
            # Fit spline coeffs to noise by lstsq (reference effkan.py:77-93).
            noise = (
                (
                    jax.random.uniform(
                        key,
                        (self.grid_size + 1, self.in_features, self.out_features),
                        dtype,
                    )
                    - 0.5
                )
                * self.scale_noise
                / self.grid_size
            )
            pts = self.grid.T[self.spline_order : -self.spline_order]
            coeff = K.bspline_curve2coeff(pts, noise, self.grid, self.spline_order)
            scale = 1.0 if self.enable_standalone_scale_spline else self.scale_spline
            return scale * coeff

        self.spline_weight = self.param(
            "spline_weight",
            spline_init,
            (self.out_features, self.in_features, self.grid_size + self.spline_order),
        )
        if self.enable_standalone_scale_spline:
            self.spline_scaler = self.param(
                "spline_scaler",
                tinit.kaiming_uniform(math.sqrt(5.0) * self.scale_spline),
                (self.out_features, self.in_features),
            )
        else:
            self.spline_scaler = None

    def __call__(self, x):
        if self.is_mutable_collection("kan_inputs"):
            # Grid-update pass: expose this layer's flattened input batch so
            # the trainer can refit the knots (reference effkan.py:189-242
            # reads self.x inside the module; functional JAX sows it out).
            self.sow("kan_inputs", "x", x.reshape(-1, x.shape[-1]))
        from kanvit.kernels import fused_basis
        from kanvit.parallel import runtime

        return runtime.kan_op(
            fused_basis.bspline_kan,
            K.bspline_kan_forward,
            x,
            self.grid,
            self.base_weight,
            self.spline_weight,
            self.spline_scaler,
            self.spline_order,
        )

    def regularization_loss(self, regularize_activation=1.0, regularize_entropy=1.0):
        return K.bspline_regularization_loss(
            self.spline_weight, regularize_activation, regularize_entropy
        )


class FastKANLayer(nn.Module):
    """fast-kan RBF KAN layer (reference ``models/fastkan.py:33-76``).

    LayerNorm lives *inside* the layer (fast-kan signature). Params:
    ``ln_weight/ln_bias (in,)``, ``spline_weight (out, in*num_grids)``
    trunc-normal(0.1), optional base branch ``base_weight/base_bias``.

    Param-count note: the reference registers its fixed RBF grid as a
    ``requires_grad=False`` ``nn.Parameter`` (``fastkan.py:25``), so torch's
    ``.parameters()`` counts ``num_grids`` extra entries per layer that are
    never trained. kanvit keeps the grid a constant; trainable-parameter
    counts are identical.
    """

    input_dim: int
    output_dim: int
    grid_min: float = -2.0
    grid_max: float = 2.0
    num_grids: int = 8
    use_base_update: bool = True
    spline_weight_init_scale: float = 0.1

    def setup(self):
        self.rbf_grid = jnp.linspace(self.grid_min, self.grid_max, self.num_grids)
        self.denominator = (self.grid_max - self.grid_min) / (self.num_grids - 1)
        self.ln_weight = self.param("ln_weight", nn.initializers.ones, (self.input_dim,))
        self.ln_bias = self.param("ln_bias", nn.initializers.zeros, (self.input_dim,))
        self.spline_weight = self.param(
            "spline_weight",
            tinit.trunc_normal(self.spline_weight_init_scale),
            (self.output_dim, self.input_dim * self.num_grids),
        )
        if self.use_base_update:
            self.base_weight = self.param(
                "base_weight",
                tinit.linear_default_weight(),
                (self.output_dim, self.input_dim),
            )
            self.base_bias = self.param(
                "base_bias", tinit.linear_default_bias(self.input_dim), (self.output_dim,)
            )
        else:
            self.base_weight = None
            self.base_bias = None

    def __call__(self, x, time_benchmark: bool = False):
        # time_benchmark skips the layernorm (reference fastkan.py:66-70)
        ln_w = None if time_benchmark else self.ln_weight
        ln_b = None if time_benchmark else self.ln_bias
        from kanvit.kernels import fused_basis
        from kanvit.parallel import runtime

        return runtime.kan_op(
            fused_basis.fastkan,
            K.fastkan_forward,
            x, ln_w, ln_b, self.rbf_grid, self.denominator,
            self.spline_weight, self.base_weight, self.base_bias,
        )


class SineKANLayer(nn.Module):
    """SineKAN layer (reference ``models/sinekan.py:26-91``).

    Params: ``amplitudes (out, in, grid)`` (init divided by out_dim and the
    per-harmonic grid-norm factor, broadcast exactly as the reference —
    SURVEY §2.7), trainable ``freq (grid,)``, bias ``(out,)`` init
    ``1/out_dim``. The damped ``phase (in, grid)`` table is a deterministic
    constant (reference registers it as a buffer, ``sinekan.py:75``).
    """

    input_dim: int
    output_dim: int
    grid_size: int = 5
    is_first: bool = False
    add_bias: bool = True
    norm_freq: bool = True

    def setup(self):
        self.phase = K.sinekan_phase_init(self.input_dim, self.grid_size)
        grid_norm = jnp.arange(1, self.grid_size + 1, dtype=jnp.float32)

        def amp_init(key, shape, dtype=jnp.float32):
            # The reference draws (out, in, 1) and broadcasts the SAME
            # sample across the grid axis via the grid-norm division
            # (sinekan.py:49-57) — the cross-harmonic correlation matters,
            # not just the per-element marginals.
            base_shape = (*shape[:-1], 1)
            if self.is_first:
                base = jax.random.normal(key, base_shape, dtype) * 0.4
            else:
                base = jax.random.uniform(key, base_shape, dtype, -1.0, 1.0)
            return jnp.broadcast_to(base / self.output_dim / grid_norm, shape)

        self.amplitudes = self.param(
            "amplitudes", amp_init, (self.output_dim, self.input_dim, self.grid_size)
        )

        def freq_init(key, shape, dtype=jnp.float32):
            f = jnp.arange(1, self.grid_size + 1, dtype=dtype)
            if self.norm_freq:
                f = f / (self.grid_size + 1) ** (1 - int(self.is_first))
            return f

        self.freq = self.param("freq", freq_init, (self.grid_size,))
        if self.add_bias:
            self.bias = self.param(
                "bias",
                lambda key, shape, dtype=jnp.float32: jnp.ones(shape, dtype)
                / self.output_dim,
                (self.output_dim,),
            )
        else:
            self.bias = None

    def __call__(self, x):
        from kanvit.kernels import fused_basis
        from kanvit.parallel import runtime

        return runtime.kan_op(
            fused_basis.sinekan,
            K.sinekan_forward,
            x, self.freq, self.phase, self.amplitudes, self.bias,
        )


class FourierKANLayer(nn.Module):
    """NaiveFourierKAN layer (reference ``models/nfkan.py:5-52``).

    Params: ``fouriercoeffs (2, out, in, grid)`` init
    ``randn / (sqrt(in) * norm)`` with ``norm = sqrt(grid)`` (or the
    per-harmonic ``(arange+1)**2`` under smooth init), bias ``(out,)`` zeros.

    The reference ViT passes ``grid_size=`` while the layer spells it
    ``gridsize`` and crashes (SURVEY §2.9.2); kanvit uses ``grid_size``
    everywhere so the ``fourier`` variant actually constructs.
    """

    input_dim: int
    output_dim: int
    grid_size: int
    add_bias: bool = True
    smooth_initialization: bool = False

    def setup(self):
        def coeff_init(key, shape, dtype=jnp.float32):
            if self.smooth_initialization:
                norm = (jnp.arange(self.grid_size, dtype=dtype) + 1) ** 2
            else:
                norm = math.sqrt(self.grid_size)
            return jax.random.normal(key, shape, dtype) / (
                math.sqrt(self.input_dim) * norm
            )

        self.fouriercoeffs = self.param(
            "fouriercoeffs",
            coeff_init,
            (2, self.output_dim, self.input_dim, self.grid_size),
        )
        self.bias = (
            self.param("bias", nn.initializers.zeros, (self.output_dim,))
            if self.add_bias
            else None
        )

    def __call__(self, x):
        from kanvit.kernels import fused_basis
        from kanvit.parallel import runtime

        return runtime.kan_op(
            fused_basis.fourierkan,
            K.fourierkan_forward,
            x, self.fouriercoeffs, self.bias,
        )


class ChebyKANLayer(nn.Module):
    """ChebyKAN layer (reference ``models/cheby.py:10-48``).

    Params: ``cheby_coeffs (in, out, degree+1)``, normal
    std ``1/(in*(degree+1))``. Output preserves leading dims (repair of
    SURVEY §2.9.1 — the reference collapses them and crashes the ViT).
    """

    input_dim: int
    output_dim: int
    degree: int

    def setup(self):
        std = 1.0 / (self.input_dim * (self.degree + 1))
        self.cheby_coeffs = self.param(
            "cheby_coeffs",
            lambda key, shape, dtype=jnp.float32: jax.random.normal(key, shape, dtype)
            * std,
            (self.input_dim, self.output_dim, self.degree + 1),
        )

    def __call__(self, x):
        from kanvit.kernels import fused_basis
        from kanvit.parallel import runtime

        return runtime.kan_op(
            fused_basis.chebykan, K.chebykan_forward, x, self.cheby_coeffs
        )


def make_kan_layer(
    kind: str,
    in_features: int,
    out_features: int,
    *,
    sine_grid_size: int = 5,
    fourier_grid_size: int = 5,
    cheby_degree: int = 4,
    stateful_grid: bool = False,
    name: Optional[str] = None,
) -> nn.Module:
    """Variant-keyed layer factory used by both the patch embedder and MSA.

    Mirrors the reference dispatch tables (``model.py:67-80`` and
    ``attention.py:135-173``); grid sizes / degree are call-site constants
    there, parameters here.
    """
    if kind in ("vanilla", "flash-attn", "linear"):
        return TorchLinear(in_features, out_features, name=name)
    if kind == "efficientkan":
        return KANLinear(
            in_features, out_features, stateful_grid=stateful_grid, name=name
        )
    if kind == "fast":
        return FastKANLayer(in_features, out_features, name=name)
    if kind == "sine":
        return SineKANLayer(in_features, out_features, grid_size=sine_grid_size, name=name)
    if kind == "fourier":
        return FourierKANLayer(
            in_features, out_features, grid_size=fourier_grid_size, name=name
        )
    if kind == "cheby":
        return ChebyKANLayer(in_features, out_features, cheby_degree, name=name)
    raise ValueError(f"Unknown KAN layer kind: {kind!r}")
