"""A/B the T=197 attention core on TPU: XLA fused einsum path vs the
optimized single-tile Pallas kernel (additive-bias masking, scale folded
into q, reciprocal-mul normalization).

Shapes: ViT-S MSA (B=256, H=6, T=197, d=64) bf16, fwd+bwd.
Usage: python tools/tpu_probe_attn_small.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from kanvit.ops.attention import multi_head_attention
from kanvit.kernels import flash_attention as FA

B, H, T, D = 256, 6, 197, 64
DT = jnp.bfloat16


def timeit(fn, *args, steps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    leaf = jax.tree.leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = (jax.random.normal(ks[0], (B, H, T, D)) * 0.5).astype(DT)
    k = (jax.random.normal(ks[1], (B, H, T, D)) * 0.5).astype(DT)
    v = (jax.random.normal(ks[2], (B, H, T, D)) * 0.5).astype(DT)

    @jax.jit
    def xla_fb(q, k, v):
        def loss(ops):
            o = multi_head_attention(*ops)
            return (o.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((q, k, v))

    @jax.jit
    def pal_fb(q, k, v):
        def loss(ops):
            o = FA.flash_attention(*ops, False, 512, 1024)
            return (o.astype(jnp.float32) ** 2).mean()
        return jax.value_and_grad(loss)((q, k, v))

    @jax.jit
    def xla_fwd(q, k, v):
        return (multi_head_attention(q, k, v).astype(jnp.float32) ** 2).mean()

    @jax.jit
    def pal_fwd(q, k, v):
        return (FA.flash_attention(q, k, v, False, 512, 1024)
                .astype(jnp.float32) ** 2).mean()

    # value check first
    o_p = FA.flash_attention(q, k, v, False, 512, 1024)
    o_x = multi_head_attention(q, k, v)
    print(f"value maxdiff: {np.abs(np.asarray(o_p - o_x, dtype=np.float32)).max():.3e}",
          flush=True)

    print(f"xla    fwd: {timeit(xla_fwd, q, k, v):7.2f} ms", flush=True)
    print(f"pallas fwd: {timeit(pal_fwd, q, k, v):7.2f} ms", flush=True)
    print(f"xla    fwd+bwd: {timeit(xla_fb, q, k, v):7.2f} ms", flush=True)
    print(f"pallas fwd+bwd: {timeit(pal_fb, q, k, v):7.2f} ms", flush=True)


main()
