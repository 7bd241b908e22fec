"""Pre-LN Transformer encoder block (reference ``model.py:14-37``).

``x + MSA(LN(x))`` then ``x + FF(LN(x))`` with
``FF = Linear(d, ff) -> ReLU -> Linear(ff, d)``. LayerNorm eps is 1e-5
(torch default) for numerical parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from kanvit.layers.attention import MSA
from kanvit.layers.kan import TorchLinear


class TransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    feedforward_dim: int = 128
    attn_type: str = "vanilla"
    stateful_grid: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + MSA(self.d_model, self.n_heads, type=self.attn_type,
                    stateful_grid=self.stateful_grid, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = TorchLinear(self.d_model, self.feedforward_dim, name="ff_0")(h)
        h = jax.nn.relu(h)
        h = TorchLinear(self.feedforward_dim, self.d_model, name="ff_2")(h)
        return x + h
