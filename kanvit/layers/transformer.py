"""Pre-LN Transformer encoder block (reference ``model.py:14-37``).

``x + MSA(LN(x))`` then ``x + FF(LN(x))`` with
``FF = Linear(d, ff) -> ReLU -> Linear(ff, d)``. LayerNorm eps is 1e-5
(torch default) for numerical parity.
"""

from __future__ import annotations

import os

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
        # Fused FF (opt-in, KANVIT_FF=1): LN2 + both Linears + ReLU +
        # residual in one kernel with the (N, feedforward_dim) intermediate
        # VMEM-resident. Isolated it ties-or-wins, but end-to-end it LOSES
        # at ViT-S (vanilla 3,119 vs 3,230 img/s) — the custom call blocks
        # XLA from fusing the FF backward with the optimizer program — so
        # the XLA chain below is the default (see kernels/fused_ffn.py).
        if (os.environ.get("KANVIT_FF") == "1"
                and not self.is_initializing()):
            from kanvit.kernels import fused_ffn as FFN

            pn = self.scope.get_variable("params", "norm2")
            p0 = self.scope.get_variable("params", "ff_0")
            p2 = self.scope.get_variable("params", "ff_2")
            y = FFN.ffn_pre_ln(x, pn["scale"], pn["bias"], p0["weight"],
                               p0["bias"], p2["weight"], p2["bias"])
            if y is not None:
                return y
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = TorchLinear(self.d_model, self.feedforward_dim, name="ff_0")(h)
        h = jax.nn.relu(h)
        h = TorchLinear(self.feedforward_dim, self.d_model, name="ff_2")(h)
        return x + h
