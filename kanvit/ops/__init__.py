"""Pure-JAX ops: the mathematical ground truth for every kanvit kernel.

Each op here is a plain function over arrays (no parameters hidden in
modules), runnable on CPU, and is the reference against which the Pallas
kernels in ``kanvit.kernels`` are tested (value parity and VJP parity).
"""

from kanvit.ops.patchify import patchify, unpatchify
from kanvit.ops.posemb import sinusoidal_positional_embeddings
from kanvit.ops.kan_bases import (
    bspline_bases,
    bspline_bases_and_grad,
    bspline_curve2coeff,
    bspline_kan_forward,
    bspline_regularization_loss,
    bspline_update_grid,
    make_bspline_grid,
    rbf_bases,
    fastkan_forward,
    sine_bases,
    sinekan_forward,
    sinekan_phase_init,
    fourier_bases,
    fourierkan_forward,
    cheby_bases,
    chebykan_forward,
)
from kanvit.ops.attention import (
    multi_head_attention,
    flash_attention_reference,
)

__all__ = [
    "patchify",
    "unpatchify",
    "sinusoidal_positional_embeddings",
    "bspline_bases",
    "bspline_bases_and_grad",
    "bspline_curve2coeff",
    "bspline_regularization_loss",
    "bspline_update_grid",
    "make_bspline_grid",
    "sinekan_phase_init",
    "bspline_kan_forward",
    "rbf_bases",
    "fastkan_forward",
    "sine_bases",
    "sinekan_forward",
    "fourier_bases",
    "fourierkan_forward",
    "cheby_bases",
    "chebykan_forward",
    "multi_head_attention",
    "flash_attention_reference",
]
