"""Causal decoder: a stack of causal FlashAttentionBlocks with an LM head.

The reference ships a causal path inside its flash-attention kernel that no
caller ever exercises (reference ``utils.py:192-195``: the qk_len_diff
masking; its only model is a ViT classifier). kanvit promotes that latent
capability to a real model family: token embedding -> N residual causal
``FlashAttentionBlock``s -> LayerNorm -> vocab projection, trained with
next-token CE (``benchmarks/causal_decoder.py``).

``seq_axis`` is the sequence-parallel knob: name a mesh axis and every
block routes attention through ring attention
(``kanvit.parallel.ring_attention``) with the sequence sharded over that
axis — k/v chunks rotate via ``lax.ppermute``, online-softmax accumulation
per device. That is the long-context scaling path (sequences that exceed
one chip's HBM); single-device flash is unchanged when ``seq_axis`` is
None or the mesh axis has size 1.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from kanvit.layers.attention import FlashAttentionBlock
from kanvit.layers.kan import TorchLinear


class CausalDecoder(nn.Module):
    """(B, T) int32 tokens -> (B, T, vocab) logits."""

    vocab: int
    dim: int = 256
    heads: int = 4
    n_blocks: int = 4
    seq_axis: Optional[str] = None  # mesh axis for ring attention (SP)
    remat: bool = False

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        x = nn.Embed(self.vocab, self.dim, name="embed")(tokens)
        block_cls = (
            nn.remat(FlashAttentionBlock) if self.remat else FlashAttentionBlock
        )
        for i in range(self.n_blocks):
            x = x + block_cls(
                dim=self.dim, heads=self.heads, dim_head=self.dim // self.heads,
                causal=True, seq_axis=self.seq_axis, name=f"blocks_{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return TorchLinear(self.dim, self.vocab, name="lm_head")(x)
