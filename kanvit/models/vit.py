"""Vision Transformer assembly + variant registry.

Reproduces the reference ``VisionTransformer`` (``model.py:40-169``):
patchify -> variant patch embedding -> [class] token -> sinusoidal position
table (quirk-parity, see ``kanvit.ops.posemb``) -> N encoder blocks -> LN +
Linear head on the class token. The seven variant keys are the reference's
(``model.py:67-80``):

- ``vanilla`` / ``flash-attn``: Linear patch embedding
- ``efficientkan`` / ``fast`` / ``sine`` / ``fourier`` / ``cheby``: the
  matching KAN layer (sine/fourier use mapper grid_size=28, cheby degree 4 —
  the reference's call-site constants)

``flash-attn`` stacks **raw** flash-attention blocks with no LayerNorm, FF,
or residual (reference ``model.py:93-95,156-159``); all other variants use
pre-LN TransformerBlocks with ``feedforward_dim = 4 * d_hidden``.

Repairs vs the reference, intentional and behavior-defining (SURVEY §2.9):
the ``cheby`` variant runs (shape-preserving ChebyKANLayer) and the
``fourier`` variant constructs (grid_size kwarg accepted).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kanvit import VARIANTS
from kanvit.layers.attention import FlashAttentionBlock
from kanvit.layers.kan import make_kan_layer
from kanvit.layers.transformer import TransformerBlock
from kanvit.ops.patchify import patchify
from kanvit.ops.posemb import sinusoidal_positional_embeddings


class VisionTransformer(nn.Module):
    chw: tuple  # (C, H, W)
    n_patches: int = 7
    n_blocks: int = 4
    d_hidden: int = 64
    n_heads: int = 2
    out_d: int = 10
    type: str = "vanilla"
    # Per-variant mapper constants (reference call-site values, model.py:72-76)
    mapper_sine_grid: int = 28
    mapper_fourier_grid: int = 28
    mapper_cheby_degree: int = 4
    # Gradient rematerialization: recompute block activations in the backward
    # pass instead of storing them — trades FLOPs for HBM, the standard
    # scaling lever for deep/large configs (no reference equivalent).
    remat: bool = False
    # Adaptive B-spline grids (reference update_grid, effkan.py:189-242):
    # grids become non-trained params the trainer can refit periodically.
    stateful_grid: bool = False

    def setup(self):
        if self.type not in VARIANTS:
            raise ValueError(f"Unknown transformer type: {self.type}")
        c, h, w = self.chw
        if h % self.n_patches or w % self.n_patches:
            raise ValueError(
                f"image {h}x{w} not divisible by n_patches={self.n_patches}"
            )
        self.patch_size = (h // self.n_patches, w // self.n_patches)
        self.input_d = c * self.patch_size[0] * self.patch_size[1]

        self.linear_mapper = make_kan_layer(
            self.type,
            self.input_d,
            self.d_hidden,
            sine_grid_size=self.mapper_sine_grid,
            fourier_grid_size=self.mapper_fourier_grid,
            cheby_degree=self.mapper_cheby_degree,
            stateful_grid=self.stateful_grid,
            name="linear_mapper",
        )

        # Classification token (reference model.py:83: torch.randn)
        self.v_class = self.param(
            "v_class", nn.initializers.normal(stddev=1.0), (1, self.d_hidden)
        )

        # Constant sinusoidal table (reference registers a non-persistent
        # buffer, model.py:86-90)
        self.pos_embeddings = jnp.asarray(
            sinusoidal_positional_embeddings(
                self.n_patches**2 + 1, self.d_hidden
            )
        )

        if self.type == "flash-attn":
            block_cls = (
                nn.remat(FlashAttentionBlock) if self.remat else FlashAttentionBlock
            )
            self.blocks = [
                block_cls(dim=self.d_hidden, heads=self.n_heads, name=f"blocks_{i}")
                for i in range(self.n_blocks)
            ]
        else:
            block_cls = (
                nn.remat(TransformerBlock) if self.remat else TransformerBlock
            )
            self.blocks = [
                block_cls(
                    d_model=self.d_hidden,
                    n_heads=self.n_heads,
                    feedforward_dim=4 * self.d_hidden,
                    attn_type=self.type,
                    stateful_grid=self.stateful_grid,
                    name=f"blocks_{i}",
                )
                for i in range(self.n_blocks)
            ]

        self.head_norm = nn.LayerNorm(epsilon=1e-5, name="head_norm")
        from kanvit.layers.kan import TorchLinear

        self.head_linear = TorchLinear(self.d_hidden, self.out_d, name="head_linear")

    def embed(self, images: jnp.ndarray) -> jnp.ndarray:
        """``[B, C, H, W] -> [B, T, d_hidden]`` tokens (patchify -> variant
        mapper -> [class] token -> sinusoidal positions). Exposed as a
        standalone method so the pipeline-parallel step can run it outside
        the block pipeline (``kanvit.parallel.pipeline``)."""
        b = images.shape[0]
        patches = patchify(images, self.n_patches)  # (B, P^2, input_d)
        tokens = self.linear_mapper(patches)  # (B, P^2, d_hidden)
        cls = jnp.broadcast_to(self.v_class[None], (b, 1, self.d_hidden))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        return tokens + self.pos_embeddings[: tokens.shape[1]].astype(
            tokens.dtype
        )

    def head(self, out: jnp.ndarray) -> jnp.ndarray:
        """``[B, T, d_hidden] -> [B, out_d]``: LN + Linear on the class
        token (reference ``model.py:106-109,164-168``)."""
        return self.head_linear(self.head_norm(out[:, 0]))

    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """``[B, C, H, W] -> [B, out_d]`` logits."""
        out = self.embed(images)
        for blk in self.blocks:
            out = blk(out)
        return self.head(out)


def create_model(
    model_type: str = "vanilla",
    *,
    chw: tuple = (3, 32, 32),
    n_patches: int = 4,
    n_blocks: int = 8,
    d_hidden: int = 64,
    n_heads: int = 8,
    out_d: int = 100,
    **kwargs,
) -> VisionTransformer:
    """Registry entry point. Defaults mirror the reference trainer's CIFAR-100
    construction (reference ``train.py:18-20,93-95``); pass
    ``chw=(1, 28, 28), n_patches=7, n_blocks=4, n_heads=2, out_d=10`` for the
    reference ctor's MNIST shape (``model.py:49``)."""
    return VisionTransformer(
        chw=chw,
        n_patches=n_patches,
        n_blocks=n_blocks,
        d_hidden=d_hidden,
        n_heads=n_heads,
        out_d=out_d,
        type=model_type,
        **kwargs,
    )
