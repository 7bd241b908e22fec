"""A/B: efficientkan qkv backward — in-kernel basis recompute (plain) vs
basis-residual reuse (split), at the ViT-S shared-basis qkv shape.

The split strategy emits the packed (N, F) basis to HBM in the forward and
reuses it for dW (one XLA matmul); dx still recomputes the grad levels
(they need the order-(k-1) bases either way). Run measures which side of
that trade wins at (B=256, T=197, H=6, dh=64) bf16.

Usage: KANVIT_BWD=split python tools/tpu_probe_qkv_split.py   (or plain)
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.kernels import fused_basis as FB
from kanvit.ops import kan_bases as K

B, T, D, H = 256, 197, 384, 6
DH = D // H
OUT = 3 * DH
NG = 8
DT = jnp.bfloat16
N = B * T


def timeit(fn, *fargs, steps=30, warmup=3):
    for _ in range(warmup):
        out = fn(*fargs)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*fargs) for _ in range(steps)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    mode = os.environ.get("KANVIT_BWD", "(auto)")
    print(f"devices: {jax.devices()}  KANVIT_BWD={mode}", flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    xh = (jax.random.normal(ks[0], (H, N, DH)) * 0.5).astype(DT)
    grid = K.make_bspline_grid(DH, 5, 3)
    bw = (jax.random.normal(ks[2], (H, OUT, DH)) * 0.02).astype(DT)
    sw = (jax.random.normal(ks[3], (H, OUT, DH, NG)) * 0.02).astype(DT)
    sc = (jax.random.normal(ks[4], (H, OUT, DH)) * 0.02).astype(DT)

    @jax.jit
    def qkv(xh, bw, sw, sc):
        def loss(ops):
            bw, sw, sc = ops
            y = jax.vmap(
                lambda x_h, bw_h, sw_h, sc_h: FB.bspline_kan(
                    x_h, grid, bw_h, sw_h, sc_h, 3
                )
            )(xh, bw, sw, sc)
            return (y.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((bw, sw, sc))

    print(f"qkv fwd+bwd ({mode}): {timeit(qkv, xh, bw, sw, sc):7.2f} ms",
          flush=True)


main()
