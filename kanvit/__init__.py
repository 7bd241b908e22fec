"""kanvit — a TPU-native (JAX/XLA/Pallas/pjit) framework for KAN Vision Transformers.

Re-implements, TPU-first, the full capability surface of the ViKANformer
reference (akshathmangudi/KAN-ViT): Vision Transformers whose linear sublayers
are replaced by Kolmogorov–Arnold Network layers in five basis families
(B-spline, Gaussian RBF, sine, Fourier, Chebyshev), plus a vanilla baseline
and a flash-attention variant, all selectable by the reference's ``type``
strings (reference ``model.py:67-80``).

Architecture (not a port — see ``SURVEY.md`` §7):

- ``kanvit.ops``      pure-JAX math (ground truth, CPU-runnable)
- ``kanvit.kernels``  Pallas TPU kernels (flash attention; fused KAN basis
                      expansion + contraction) with hand-derived custom VJPs
- ``kanvit.layers``   flax.linen layers (KAN layers, MSA, blocks)
- ``kanvit.models``   VisionTransformer assembly + variant registry
- ``kanvit.data``     MNIST/CIFAR-100 pipelines as vectorized host transforms
- ``kanvit.train``    jit/pjit train loop, metrics, logging, checkpointing
- ``kanvit.parallel`` device mesh + sharding rules (DP/TP over ICI)
"""

__version__ = "0.1.0"

VARIANTS = (
    "vanilla",
    "efficientkan",
    "fast",
    "sine",
    "fourier",
    "cheby",
    "flash-attn",
)
